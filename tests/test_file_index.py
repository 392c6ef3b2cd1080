"""Bloom-indexed file pruning: pruned scan must be row-identical to the
full-scan filter (zero false negatives at file granularity), skip files
that provably hold no probe key, and refresh incrementally."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.file_index import (build_file_bloom_index,
                                                    prune_files, pruned_read)


@pytest.fixture(scope="module")
def keyed_table(spark, tmp_path_factory):
    """8-file parquet table with disjoint key ranges per file (repartition
    by range) so pruning has something to skip."""
    path = str(tmp_path_factory.mktemp("fidx") / "events")
    df = spark.range(80_000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 97).alias("bucket"),
        F.concat(F.lit("payload"), F.col("id")).alias("payload"))
    df.repartitionByRange(8, "user_id").write.mode("overwrite").parquet(path)
    return path


def test_index_shape_and_counts(spark, keyed_table):
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    rows = idx.collect()
    assert len(rows) == 8
    assert sum(r["n_rows"] for r in rows) == 80_000
    assert all(len(bytes(r["sketch"])) > 0 for r in rows)


def test_pruned_read_row_identical(spark, keyed_table):
    """The contract: pruned scan + exact filter == full scan + exact
    filter, for keys that exist, don't exist, and mix."""
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    probe = spark.createDataFrame(
        [(5,), (79_999,), (40_000,), (123_456_789,)], "user_id long")
    got = (pruned_read(spark, keyed_table, idx, ["user_id"], probe)
           .join(probe, "user_id").select("user_id", "payload"))
    want = (spark.read.parquet(keyed_table)
            .join(probe, "user_id").select("user_id", "payload"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_pruning_actually_skips(spark, keyed_table):
    """Range-partitioned files + point keys from one range: candidate set
    must be far below all 8 files (fpr=0.001 across 8 files -> expected
    false-positive files ~0.01)."""
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    probe = spark.createDataFrame([(3,), (7,), (11,)], "user_id long")
    files = prune_files(idx, ["user_id"], probe)
    assert 1 <= len(files) <= 2  # one real file + at most one fp file


def test_no_candidates_yields_empty_with_schema(spark, keyed_table):
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    probe = spark.createDataFrame([(10_000_000,)], "user_id long")
    out = pruned_read(spark, keyed_table, idx, ["user_id"], probe)
    assert out.count() == 0
    assert out.columns == spark.read.parquet(keyed_table).columns


def test_composite_key_and_null_probe(spark, keyed_table):
    idx = build_file_bloom_index(spark, keyed_table, ["user_id", "bucket"],
                                 fpr=0.001)
    probe = spark.createDataFrame(
        [(5, 5 % 97), (None, 3)], "user_id long, bucket long")
    got = (pruned_read(spark, keyed_table, idx, ["user_id", "bucket"], probe)
           .join(probe.dropna(), ["user_id", "bucket"]).count())
    assert got == 1


def test_incremental_refresh_union(spark, keyed_table, tmp_path):
    """New files index independently; unioning index tables == indexing
    the union (per-file build never rescans old files)."""
    extra = str(tmp_path / "extra")
    spark.range(100_000, 100_500).select(
        F.col("id").alias("user_id"), (F.col("id") % 97).alias("bucket"),
        F.concat(F.lit("payload"), F.col("id")).alias("payload")) \
        .coalesce(1).write.mode("overwrite").parquet(extra)
    idx_old = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    idx_new = build_file_bloom_index(spark, extra, ["user_id"], fpr=0.001)
    # geometry may differ (sized per corpus) — pruning handles both rows
    both = idx_old.unionByName(idx_new)
    probe = spark.createDataFrame([(100_123,), (42,)], "user_id long")
    files = prune_files(both, ["user_id"], probe)
    assert any("extra" in f for f in files)
    assert any("events" in f for f in files)


def test_pruned_read_casts_probe_types(spark, keyed_table):
    """xxhash64 is type-sensitive: an int-typed probe against a long
    column must be cast, not silently miss every filter."""
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    probe_int = spark.createDataFrame([(5,), (40_000,)], "user_id int")
    got = (pruned_read(spark, keyed_table, idx, ["user_id"], probe_int)
           .join(probe_int.withColumn("user_id",
                                      F.col("user_id").cast("long")),
                 "user_id").count())
    assert got == 2


def test_prune_files_dedupes_double_indexed_file(spark, keyed_table):
    """A file present twice in the index (crash-replay of an incremental
    append) must be returned once — else pruned_read scans it twice."""
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    doubled = idx.unionByName(idx)
    probe = spark.createDataFrame([(5,)], "user_id long")
    files = prune_files(doubled, ["user_id"], probe)
    assert len(files) == len(set(files))
    n = (pruned_read(spark, keyed_table, doubled, ["user_id"], probe)
         .join(probe, "user_id").count())
    assert n == 1


def test_prune_files_casts_probe_via_index_key_types(spark, keyed_table):
    """The index records its key column types; prune_files itself (not
    just pruned_read) must cast an int-typed probe to the long-keyed
    index before hashing — a direct caller skipping pruned_read gets the
    same zero-false-negative guarantee."""
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    probe_int = spark.createDataFrame([(5,), (40_000,)], "user_id int")
    probe_long = spark.createDataFrame([(5,), (40_000,)], "user_id long")
    assert (prune_files(idx, ["user_id"], probe_int)
            == prune_files(idx, ["user_id"], probe_long))
    assert len(prune_files(idx, ["user_id"], probe_int)) >= 1


def test_prune_files_wrong_key_arity_raises(spark, keyed_table):
    idx = build_file_bloom_index(spark, keyed_table, ["user_id", "bucket"],
                                 fpr=0.001)
    probe = spark.createDataFrame([(5,)], "user_id long")
    with pytest.raises(ValueError, match="key column"):
        prune_files(idx, ["user_id"], probe)


def test_prune_files_distributed_over_many_files(spark):
    """Probe an index of 10^4 synthetic file rows: membership is
    evaluated executor-side (the driver never materializes the sketch
    column), and exactly the files holding probe keys come back."""
    from bloomfilter_spark.agg import hash_col
    from bloomfilter_spark.sketches import BloomFilter

    import numpy as np

    n_files = 10_000
    probe_keys = [123, 7777]
    # one job hashes every key the engine's way; filters build locally
    all_h = np.array(
        [r["h"] for r in spark.range(n_files * 10)
         .select(hash_col([F.col("id").cast("long")]).alias("h"))
         .orderBy("id").collect()],
        dtype=np.int64).view(np.uint64)
    rows = []
    for i in range(n_files):
        bf = BloomFilter(1 << 10, 3)
        bf.update(all_h[i * 10:(i + 1) * 10])
        rows.append((f"file_{i:05d}", 10, "bigint", bf.to_bytes()))
    idx = spark.createDataFrame(
        rows, "file string, n_rows long, key_types string, sketch binary") \
        .repartition(16)
    probe = spark.createDataFrame([(k,) for k in probe_keys], "id long")
    files = prune_files(idx, ["id"], probe)
    # zero FN: the true owner files are present; FPs bounded by geometry
    assert "file_00012" in files and "file_00777" in files
    assert len(files) < 50


# --- min/max (zone-map) range index --------------------------------------

@pytest.fixture(scope="module")
def ranged_table(spark, tmp_path_factory):
    """8 range-clustered files over v in [0, 8000): file i holds
    [i*1000, (i+1)*1000). A 'tag' column exercises string ranges; one
    extra file is all-NULL in v."""
    path = str(tmp_path_factory.mktemp("minmax") / "t")
    df = spark.range(8000).select(
        F.col("id").alias("v"),
        F.concat(F.lit("k"), F.lpad((F.col("id") / 1000).cast("int")
                                    .cast("string"), 2, "0")).alias("tag"))
    df.repartitionByRange(8, "v").write.parquet(path)
    nulls = spark.range(5).select(
        F.lit(None).cast("long").alias("v"), F.lit("zz").alias("tag"))
    nulls.coalesce(1).write.mode("append").parquet(path)
    return path


def test_minmax_index_stats_exact(spark, ranged_table):
    from bloomfilter_spark.operators.file_index import build_file_minmax_index
    idx = build_file_minmax_index(spark, ranged_table, ["v", "tag"])
    rows = idx.collect()
    assert len(rows) == 9
    data_rows = sorted((r for r in rows if r["n_nonnull_v"] > 0),
                       key=lambda r: r["min_v"])
    assert len(data_rows) == 8
    # range clustering => contiguous, non-overlapping, exhaustive files
    # (boundaries are sampled by repartitionByRange, not exact multiples)
    for r in data_rows:
        assert r["n_rows"] == r["max_v"] - r["min_v"] + 1
    for a, b in zip(data_rows, data_rows[1:]):
        assert b["min_v"] == a["max_v"] + 1
    assert data_rows[0]["min_v"] == 0 and data_rows[-1]["max_v"] == 7999
    null_row = [r for r in rows if r["n_nonnull_v"] == 0][0]
    assert null_row["min_v"] is None and null_row["n_rows"] == 5
    assert null_row["min_tag"] == "zz"  # stats per column, independent


def test_range_prune_zero_fn_and_skips(spark, ranged_table):
    from bloomfilter_spark.operators.file_index import (
        build_file_minmax_index, prune_files_range, pruned_read_range)
    idx = build_file_minmax_index(spark, ranged_table, ["v", "tag"])
    files = prune_files_range(idx, "v", 2500, 4500)
    # ~2000-wide range over ~1000-wide files: 3 +/- 1 depending on the
    # sampled boundaries — and strictly fewer than all 8
    assert 2 <= len(files) <= 4
    got = (pruned_read_range(spark, ranged_table, idx, "v", 2500, 4500)
           .where(F.col("v").between(2500, 4500)).count())
    want = (spark.read.parquet(ranged_table)
            .where(F.col("v").between(2500, 4500)).count())
    assert got == want == 2001
    # all-NULL v file is provably skippable for any range
    assert not any("zz" in f for f in files)


def test_range_prune_half_open_and_string(spark, ranged_table):
    from bloomfilter_spark.operators.file_index import (
        build_file_minmax_index, prune_files_range)
    idx = build_file_minmax_index(spark, ranged_table, ["v", "tag"])
    assert 2 <= len(prune_files_range(idx, "v", lo=6000)) <= 3
    assert 1 <= len(prune_files_range(idx, "v", hi=999)) <= 2
    assert len(prune_files_range(idx, "v")) == 8      # no bounds: all data files
    # string ranges compare lexicographically; zero FN vs the exact scan
    fs = prune_files_range(idx, "tag", "k03", "k04")
    assert 0 < len(fs) < 8
    got = (spark.read.parquet(*fs)
           .where(F.col("tag").between("k03", "k04")).count())
    want = (spark.read.parquet(ranged_table)
            .where(F.col("tag").between("k03", "k04")).count())
    assert got == want == 2000
    with pytest.raises(ValueError, match="no min/max"):
        prune_files_range(idx, "missing")


def test_range_prune_empty_result_schema(spark, ranged_table):
    from bloomfilter_spark.operators.file_index import (
        build_file_minmax_index, pruned_read_range)
    idx = build_file_minmax_index(spark, ranged_table, ["v"])
    out = pruned_read_range(spark, ranged_table, idx, "v", 10**9, 2 * 10**9)
    assert out.count() == 0
    assert set(out.columns) == {"v", "tag"}


def test_index_health_via_sql_error_bound(spark, keyed_table):
    """Operational health check is one SQL line: sketch_error_bound over
    the index table reports each file's CURRENT false-positive rate at
    its observed fill — every file of a correctly sized index sits at or
    under the configured fpr, and an artificially saturated filter is
    flagged by a degraded rate (the signal a stale configured bound
    cannot give)."""
    import numpy as np

    from bloomfilter_spark.sketches import BloomFilter
    from bloomfilter_spark.sql import register_sketch_sql

    register_sketch_sql(spark)
    idx = build_file_bloom_index(spark, keyed_table, ["user_id"], fpr=0.001)
    idx.createOrReplaceTempView("fidx_health_t")
    rows = spark.sql("SELECT file, n_rows, "
                     "sketch_error_bound(sketch) AS current_fpp "
                     "FROM fidx_health_t").collect()
    assert len(rows) == 8
    assert all(0.0 <= r["current_fpp"] <= 0.001 for r in rows)
    # overload one filter far past its sized capacity -> degraded rate
    blob = bytes(idx.first()["sketch"])
    bf = BloomFilter.from_bytes(blob)
    rng = np.random.default_rng(5)
    bf.update(rng.integers(0, 2**63, 40 * 80_000, dtype=np.int64)
              .view(np.uint64))
    spark.createDataFrame([(bf.to_bytes(),)], "sketch binary") \
         .createOrReplaceTempView("fidx_overload_t")
    degraded = spark.sql("SELECT sketch_error_bound(sketch) AS e "
                         "FROM fidx_overload_t").first()["e"]
    assert degraded > 0.01  # well past the configured 0.001
