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
