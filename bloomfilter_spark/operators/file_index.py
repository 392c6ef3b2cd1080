"""Bloom-indexed file pruning (data skipping) over parquet tables.

The reference library's core use is "is this key possibly present?"
(`elem`, Data/BloomFilter.hs:192-194). At warehouse scale the highest-
leverage place to ask that question is BEFORE the scan: a point/IN-list
lookup over a 100 TB table should open only the files that can contain
the keys. Engines bake this in as file-level bloom/dictionary skipping
(parquet column indexes, Iceberg bloom filter metadata); this module
provides it as a first-class, engine-controlled index table:

    idx = build_file_bloom_index(spark, "/data/events", ["user_id"],
                                 fpr=0.001)
    df  = pruned_read(spark, "/data/events", idx, ["user_id"], key_df)

* The index is one Bloom filter PER FILE, built in a single distributed
  scan: `input_file_name()` is the grouping key, so the build is the
  salted grouped-sketch topology (`agg.grouped_sketch_table`) and each
  file's filter is sized for that file's own row count.
* Probing is distributed: the distinct probe-key hashes are broadcast
  and every file's filter is tested executor-side; only matching file
  names reach the driver. Zero false negatives means a file is skipped
  ONLY if it provably contains none of the probe keys — the pruned scan
  is row-identical to the full-scan filter. False positives cost one
  extra file read, bounded by the configured fpr.
* The index is a plain (file, n_rows, sketch) DataFrame: persist it with
  `warehouse.save_sketch_table` and refresh incrementally — newly landed
  files only (the build is per-file, so old rows never rescan).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..agg import hash_col
from ..config import DEFAULT_SEED
from ..sketches import BloomFilter
from ..sizing import suggest_sizing

__all__ = ["build_file_bloom_index", "build_file_minmax_index",
           "prune_files", "prune_files_range", "pruned_read",
           "pruned_read_range"]


def build_file_bloom_index(spark: SparkSession, path: str,
                           cols: Sequence[str], fpr: float = 0.001,
                           seed: int = DEFAULT_SEED,
                           salt: int = 4,
                           files: Sequence[str] | None = None) -> DataFrame:
    """One Bloom filter per parquet file of ``path``, keyed by ``cols``.

    Returns (file string, n_rows long, sketch binary). One data scan (the
    build) plus one column-less row-count pass for sizing. NULL keys are
    skipped, matching the build-side convention everywhere else — a probe
    for NULL is not answerable by the index.

    ``files``: restrict the build to these files (incremental refresh —
    index only newly-landed files and union with the existing table).

    Health check from SQL: ``SELECT file, sketch_error_bound(sketch)
    FROM index`` reports each file's CURRENT false-positive rate at its
    observed fill (sql.register_sketch_sql) — a filter fed past its
    sized capacity shows a degraded rate instead of the configured fpr.
    """
    from ..agg import grouped_sketch_table

    src = spark.read.parquet(*files) if files else spark.read.parquet(path)
    # group on an 8-byte hash of the file name, not the name itself: the
    # grouping column rides EVERY row through the build's Arrow pipe and
    # pandas groupby, and a ~100-byte path string per row was the
    # dominant transfer cost of the whole build (measured r6: ~85% of the
    # per-row bytes). The (fkey -> file) mapping is recovered from the
    # row-count aggregate, which scans file names once per FILE, not per
    # row. A 64-bit collision would only MERGE two files' filters — false
    # positives for each name, never a false negative — and at any real
    # file count the probability is ~|files|^2 / 2^64.
    df = src.withColumn("__fkey", F.xxhash64(F.input_file_name()))
    counts = (src.withColumn("__file", F.input_file_name())
                 .groupBy("__file").agg(F.count("*").alias("n_rows"))
                 .withColumn("__fkey", F.xxhash64(F.col("__file"))))
    # the counts aggregate is consumed twice (sizing max below + the
    # final join): persist its O(files) rows so the second consumer does
    # not re-scan the table (one full scan saved per build; the caller
    # releases it by unpersisting the returned index or letting the
    # executor cache age it out — it is |files| rows of (path, long))
    counts = counts.persist()
    max_n = counts.agg(F.max("n_rows")).first()[0]
    if max_n is None:
        raise ValueError(f"no rows under {path}: nothing to index")

    # all per-file filters share one geometry, sized for the LARGEST file
    # — the over-sizing for smaller files is bounded by the file-size
    # spread (sparse serialization absorbs most of it on disk anyway)
    m, k = suggest_sizing(max_n, fpr)
    # rows of one file are contiguous in scan partitions, so the build
    # skips the phase-1 shuffle entirely (pre_partitioned): partials fold
    # per scan task, the only exchange carries per-(task, file) partials
    tbl = grouped_sketch_table(df, ["__fkey"], list(cols),
                               lambda: BloomFilter(m, k), seed=seed,
                               salt=salt, pre_partitioned=True)
    # the index is self-describing: key_types records the indexed columns'
    # Spark types so prune_files can cast probes before hashing (xxhash64
    # is type-sensitive — an int probe against a long-keyed index would
    # silently prune every file, violating zero-false-negatives)
    key_types = ",".join(src.schema[c].dataType.simpleString() for c in cols)
    return (tbl.join(counts, "__fkey")
               .withColumnRenamed("__file", "file")
               .withColumn("key_types", F.lit(key_types))
               .select("file", "n_rows", "key_types", "sketch"))


def prune_files(index_df: DataFrame, cols: Sequence[str], keys_df: DataFrame,
                seed: int = DEFAULT_SEED) -> list[str]:
    """Files of the indexed table that MAY contain any of ``keys_df``'s
    key tuples (columns must match ``cols`` of the build). Zero false
    negatives: every file actually holding a key is returned.

    Fully distributed probe: the DISTINCT key hashes (8 bytes per key
    tuple, deduplicated JVM-side) are broadcast, and each index row's
    filter is tested vectorized WHERE IT LIVES — only matching file names
    come back to the driver (≤ |files| strings). At 10^5-10^6 files the
    driver never materializes a single sketch blob; the executor-side cost
    is one filter parse + one vectorized k-probe pass per file row.

    Probe columns are cast to the index's recorded ``key_types`` before
    hashing (xxhash64 is type-sensitive; an int probe against a long-keyed
    index would otherwise hash differently and silently prune every file).
    Indexes persisted before key_types existed probe as-is — then callers
    must match types, as `pruned_read` does.
    """
    probe = keys_df
    if "key_types" in index_df.columns:
        first = index_df.select("key_types").first()
        if first is not None and first[0]:
            types = first[0].split(",")
            if len(types) != len(cols):
                raise ValueError(
                    f"index was built over {len(types)} key column(s) "
                    f"({first[0]}), probe has {len(cols)}: {list(cols)}")
            probe = probe.select(*[
                F.col(c).cast(t).alias(c) for c, t in zip(cols, types)],
                *[c for c in probe.columns if c not in cols])
    for c in cols:  # NULL components are unanswerable (xxhash64 would
        probe = probe.where(F.col(c).isNotNull())  # hash them as phantoms)
    hashes = np.array(
        [r["__h"] for r in
         probe.select(hash_col([F.col(c) for c in cols], seed)
                      .alias("__h")).distinct().collect()],
        dtype=np.int64).view(np.uint64)
    if not hashes.size:
        return []
    bc = index_df.sparkSession.sparkContext.broadcast(hashes)

    def fn(it):
        hs = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            may = [bool(BloomFilter.from_bytes(bytes(b)).contains(hs).any())
                   for b in pdf["sketch"]]
            out = pdf.loc[may, ["file"]]
            if len(out):
                yield out

    matched = (index_df.select("file", "sketch")
                       .mapInPandas(fn, schema="file string").collect())
    # sorted de-dupe: an incrementally maintained index may hold a file
    # twice after a crash-replay (pruned_read must not scan it twice), and
    # executor arrival order is nondeterministic
    return sorted({row["file"] for row in matched})


def pruned_read(spark: SparkSession, path: str, index_df: DataFrame,
                cols: Sequence[str], keys_df: DataFrame,
                seed: int = DEFAULT_SEED,
                files: Sequence[str] | None = None) -> DataFrame:
    """Read only the files that may contain the probe keys.

    Row-identical to ``spark.read.parquet(path)`` followed by a semi-join
    on ``cols`` (zero false negatives), but the scan opens
    |candidate files| instead of |all files|. The returned frame still
    needs the exact key filter for final row selection — false-positive
    files contribute rows the bloom could not exclude — so callers join
    or filter as they would on the full table; what the index saves is
    I/O, not the final predicate.

    Probe columns are cast to the table's own key types before hashing:
    xxhash64 is type-sensitive (an int probe against a long column would
    hash differently and silently miss every filter). ``files``: pass a
    list already obtained from ``prune_files`` to skip re-probing.
    """
    table = spark.read.parquet(path)
    if files is None:
        probe = keys_df.select(*[
            F.col(c).cast(table.schema[c].dataType).alias(c) for c in cols])
        files = prune_files(index_df, cols, probe, seed=seed)
    if not files:
        # no file can contain any key: preserve schema, read nothing
        return table.where(F.lit(False))
    return spark.read.parquet(*files)


def build_file_minmax_index(spark: SparkSession, path: str,
                            cols: Sequence[str],
                            files: Sequence[str] | None = None) -> DataFrame:
    """Min/max statistics per parquet file — the RANGE-predicate
    complement to the Bloom (equality) index, i.e. Delta/Iceberg-style
    zone maps as an engine-controlled table:

        (file, n_rows, n_nonnull_<c>, min_<c>, max_<c>, ...)

    One distributed scan: `input_file_name()` groups, min/max/count run
    in codegen with map-side partials, so the shuffle carries one partial
    row per (task, file). Worth building after a clustering write
    (`zorder_write`, `repartitionByRange`) — clustering is what makes the
    per-file ranges tight enough to skip.

    ``files`` restricts the build for incremental refresh, like
    `build_file_bloom_index`.
    """
    src = spark.read.parquet(*files) if files else spark.read.parquet(path)
    df = src.withColumn("__file", F.input_file_name())
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.count(c).alias(f"n_nonnull_{c}"),
                 F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    if src.limit(1).count() == 0:
        raise ValueError(f"no rows under {path}: nothing to index")
    return df.groupBy("__file").agg(*aggs).withColumnRenamed("__file", "file")


def prune_files_range(index_df: DataFrame, col: str, lo=None, hi=None,
                      ) -> list[str]:
    """Files that MAY contain a row with ``lo <= col <= hi`` (either
    bound may be None for a half-open range). Zero false negatives:

    * a file is skipped when its [min, max] envelope provably misses the
      range, or when it has NO non-null values of ``col`` (NULL never
      satisfies a range predicate);
    * comparisons happen in the column's own type (strings compare
      lexicographically, matching the predicate they stand in for).

    The probe is a filter over the (small) index table; only file names
    reach the driver.
    """
    if f"min_{col}" not in index_df.columns:
        raise ValueError(f"index has no min/max stats for column {col!r}; "
                         f"built over: "
                         f"{[c[4:] for c in index_df.columns if c.startswith('min_')]}")
    cond = F.col(f"n_nonnull_{col}") > 0
    if lo is not None:
        cond = cond & (F.col(f"max_{col}") >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(f"min_{col}") <= F.lit(hi))
    rows = index_df.where(cond).select("file").collect()
    return sorted({r["file"] for r in rows})


def pruned_read_range(spark: SparkSession, path: str, index_df: DataFrame,
                      col: str, lo=None, hi=None,
                      files: Sequence[str] | None = None) -> DataFrame:
    """Read only the files whose min/max envelope overlaps [lo, hi].
    Row-identical to the full scan + range filter once the caller applies
    the exact predicate (envelope overlap admits false-positive files,
    never false negatives)."""
    if files is None:
        files = prune_files_range(index_df, col, lo, hi)
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    return spark.read.parquet(*files)
