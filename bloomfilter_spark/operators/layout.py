"""Data-layout operators: multi-dimensional clustering for file skipping
and sketch-driven balanced writes.

At 100 TB the cheapest file is the one never opened. File-level skipping
(`operators/file_index.py` Bloom indexes, parquet min/max, Iceberg
metadata) only bites when rows with equal or nearby keys are CLUSTERED
into few files — and the writer controls that. The reference library
answers "is this key possibly here?" (`elem`,
Data/BloomFilter.hs:192-194); this module arranges the data so the answer
is "no" for most files:

* ``zorder_key`` — a Morton / Z-order interleave of per-column bucket
  ids, built entirely from Catalyst bit arithmetic (whole-stage codegen,
  no UDF).  Sorting or range-partitioning by it clusters rows that are
  close in ANY of the interleaved dimensions, so single-column predicates
  prune files on every dimension at once (Morton 1966; the technique
  behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).
* ``hash_bucket`` — order-destroying uniform bucketing for equality-only
  dimensions (ids, hashes): top ``bits`` of xxhash64.
* ``equidepth_bucket`` / ``sketch_range_bucket`` — order-PRESERVING
  equi-depth bucket ids with cut points from a KLL sketch's quantiles.
  Skew-proof where uniform-width bucketing is not: a Zipf-ish column
  (token counts, prices) puts most rows in one uniform bucket and
  starves the interleave; equi-depth buckets stay balanced by
  construction.
* ``write_range_partitioned`` — range-clustered writes whose cut points
  come from an existing KLL sketch (e.g. the warehouse sketch table)
  instead of Spark's range-partitioner sampling job: one fewer pass over
  the input, deterministic across runs, and directory-partitioned so
  min/max pruning is exact per bucket.

Scale notes: the interleave is O(bits_per_col × n_cols) long-typed
shift/and/or terms per row — pure codegen, no shuffle of its own; the
clustering write is the one unavoidable range shuffle. Equi-depth lookup
is O(n_buckets) comparisons per row via a higher-order array fold, so
keep ``bits`` ≤ 8 for fold-bucketed dimensions (256 cut points); hash
and uniform dimensions are O(1).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..config import DEFAULT_SEED
from ..sketches.kll import KLL

__all__ = [
    "zorder_key", "hash_bucket", "equidepth_bucket", "kll_cut_points",
    "sketch_range_bucket", "zorder_write", "write_range_partitioned",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def zorder_key(bucket_cols: Sequence, bits: int = 12) -> Column:
    """Morton interleave of ``len(bucket_cols)`` bucket-id columns, each
    an integer in ``[0, 2**bits)`` (see ``hash_bucket`` /
    ``equidepth_bucket`` for producing them).

    Bit ``i`` of column ``j`` lands at output bit ``i*d + j`` — the
    classic Z-curve, so a sort by the result is a multi-dimensional
    clustering. Built as a flat OR of ``bits × d`` shift/mask terms:
    Catalyst folds it into one codegen expression, no UDF, no shuffle.

    ``bits × d`` must fit in a signed long (≤ 62).
    """
    cols = [_col(c) for c in bucket_cols]
    d = len(cols)
    if d < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * d > 62:
        raise ValueError(f"bits*cols = {bits * d} exceeds 62 (long range)")
    terms = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            # ((v >> i) & 1) << (i*d + j)
            terms.append(
                F.shiftleft(F.shiftrightunsigned(v, i).bitwiseAND(F.lit(1)),
                            i * d + j))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def hash_bucket(col, bits: int = 12, seed: int = DEFAULT_SEED) -> Column:
    """Uniform bucket id in ``[0, 2**bits)``: top bits of xxhash64.
    Order-destroying — use for equality-pruned dimensions (ids, join
    keys) where the Bloom file index, not min/max, does the skipping."""
    return F.shiftrightunsigned(F.xxhash64(F.lit(seed).cast("long"), _col(col)),
                                64 - bits).cast("long")


def kll_cut_points(sketch: KLL, n_buckets: int) -> np.ndarray:
    """``n_buckets - 1`` interior equi-depth cut points from a KLL
    sketch (the ``i/n`` quantiles, i = 1..n-1). Monotone non-decreasing;
    duplicate cuts (heavy single values) simply leave buckets empty."""
    if n_buckets < 2:
        raise ValueError("need at least 2 buckets")
    qs = np.arange(1, n_buckets) / n_buckets
    return np.asarray(sketch.quantile(qs), dtype=np.float64)


def equidepth_bucket(col, cut_points: Sequence[float]) -> Column:
    """Order-preserving bucket id = number of cut points ≤ value,
    evaluated as a JVM higher-order array fold over the (small, literal)
    cut-point array — O(n_cuts) comparisons per row, whole-stage codegen,
    no Python. NULL values get NULL buckets (cluster them explicitly if
    the column is nullable)."""
    cuts = [float(x) for x in cut_points]
    arr = F.array(*[F.lit(x) for x in cuts])
    v = _col(col).cast("double")
    fold = F.aggregate(
        arr, F.lit(0).cast("long"),
        lambda acc, cut: acc + F.when(v >= cut, 1).otherwise(0).cast("long"))
    # v >= cut is NULL for NULL v, and when(NULL).otherwise(0) is 0 — the
    # bare fold would silently drop every NULL row into bucket 0
    return F.when(v.isNotNull(), fold)


def sketch_range_bucket(col, sketch: KLL, n_buckets: int) -> Column:
    """Equi-depth bucket id for ``col`` with cut points from ``sketch``
    (built by `agg.build_sketch` / loaded from the warehouse) — the
    balanced-write bucketing that costs zero extra input passes."""
    return equidepth_bucket(col, kll_cut_points(sketch, n_buckets))


def zorder_write(df: DataFrame, path: str, bucket_exprs: Sequence[Column],
                 n_files: int, bits: int = 12) -> None:
    """Cluster ``df`` along the Z-curve of ``bucket_exprs`` and write
    ``n_files`` parquet files. One range shuffle (the clustering itself);
    `repartitionByRange`'s boundary sampling runs over the already-tiny
    interleaved key. Downstream, per-file min/max or Bloom indexes prune
    on ANY of the interleaved dimensions."""
    zkey = zorder_key(list(bucket_exprs), bits=bits)
    (df.withColumn("__zkey", zkey)
       .repartitionByRange(n_files, "__zkey")
       .sortWithinPartitions("__zkey")
       .drop("__zkey")
       .write.mode("overwrite").parquet(path))


def write_bucketed(df: DataFrame, table_name: str, keys, n_buckets: int,
                   path: str | None = None, sort: bool = True) -> None:
    """Spark-native bucketed table write (`bucketBy` + `sortBy` +
    `saveAsTable`): rows are hash-clustered into ``n_buckets`` files per
    write-partition by ``keys``, and the layout is recorded in the
    catalog so EVERY subsequent join or aggregation on those keys skips
    its shuffle (and, with ``sort``, its sort).

    This is the amortize-the-shuffle primitive for 100 TB fact tables:
    pay the key shuffle ONCE at ingest, then every one of the daily
    join/groupBy runs against the table reads co-located buckets with no
    Exchange in the plan (assert with `has_exchange`). Both join sides
    must be bucketed by the join keys with the same ``n_buckets``.
    Parallelism of downstream stages equals ``n_buckets`` — size it like
    shuffle partitions (`plans.shuffle_partitions_for`), not small.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def has_exchange(df: DataFrame) -> bool:
    """True if the DataFrame's physical plan contains a shuffle
    (Exchange). The bucketed-join assertion: a join of two same-bucketed
    tables on the bucket keys must plan with NO Exchange."""
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()


def bucketed_join(spark, left_table: str, right_table: str, keys,
                  how: str = "inner") -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. With both
    sides written by `write_bucketed` (same keys, same n_buckets) the
    plan is a zero-shuffle sort-merge join reading co-located buckets.

    The `merge` hint forces sort-merge: without it Catalyst may pick a
    broadcast-hash join (which carries a BroadcastExchange and ignores
    the bucketing) when one side is small. At 100 TB neither fact side
    is broadcastable, and SMJ over co-located, pre-sorted buckets is
    the plan this layout exists for — so ask for it explicitly."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table).hint("merge"), keys, how))


def write_range_partitioned(df: DataFrame, path: str, col: str,
                            sketch: KLL, n_buckets: int) -> None:
    """Range-clustered directory-partitioned write with sketch-derived
    equi-depth cut points: ``path/__bucket=<id>/part-*.parquet``.

    Versus ``repartitionByRange``: no sampling job over the input (the
    cut points come from the sketch), buckets are near-equal in rows by
    construction (skew-proof), and the bucket id is materialized in the
    directory layout so readers prune whole directories from the path
    alone. The in-bucket shuffle is a plain hash repartition on the
    bucket id.
    """
    bucket = sketch_range_bucket(col, sketch, n_buckets)
    (df.withColumn("__bucket", bucket)
       .repartition(n_buckets, "__bucket")
       .write.mode("overwrite").partitionBy("__bucket").parquet(path))
