"""Interval (point-in-range) join and gap sessionization.

Spark plans a bare non-equi join (``p.x BETWEEN i.lo AND i.hi``) as a
BroadcastNestedLoop or Cartesian product — O(|points| x |intervals|)
comparisons, a scale-killer the moment the interval side stops fitting in
one broadcast. `interval_join` restores an equi-join shape with the
classic binning trick:

* pick a bucket width ``w`` (``suggest_bucket_width`` uses the KLL
  median interval length — a one-scan sketch build, no sampling pass);
* each point owns exactly ONE bucket ``floor(x / w)``;
* each interval is exploded to one row per bucket it overlaps
  (``sequence(floor(lo/w), floor(hi/w))`` — pure codegen, no Python);
* join on bucket equality (+ any extra equi keys), then apply the exact
  range predicate.

Candidate pairs are only same-bucket pairs, so total work is
``sum_b |points_b| x |intervals_b|`` instead of the full cross product;
with ``w`` near the median interval length each interval lands in O(1)
buckets, so the exploded build side stays ~|intervals| rows and Catalyst
(AQE) is free to broadcast it when small. Each (point, interval) pair
meets in exactly one bucket — the point's — so no dedup pass is needed.

`sessionize` is the standard gap-based session assignment (one shuffle by
entity, per-entity window scan): new-session flags via ``lag``, session
index via a running sum, both whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..sketches.kll import KLL


def suggest_bucket_width(intervals: DataFrame, lo_col: str, hi_col: str,
                         k: int = 200) -> float:
    """Median interval length from a one-scan KLL build — the bucket
    width at which a typical interval overlaps ~1-2 buckets. Returns 1.0
    for an empty/degenerate input rather than 0 (a 0 width is invalid)."""
    from ..jvm_build import quantile_build_preagg
    lengths = intervals.select(
        (F.col(hi_col) - F.col(lo_col)).cast("double").alias("len"))
    try:
        sk = quantile_build_preagg(lengths, "len", lambda: KLL(k=k))
        if sk.n == 0:
            return 1.0
        med = float(sk.quantile(0.5))
    except ValueError:  # > max_cardinality distinct lengths: GK fallback
        q = lengths.approxQuantile("len", [0.5], 0.01)
        if not q:
            return 1.0
        med = float(q[0])
    return med if med > 0 else 1.0


def interval_join(points: DataFrame, intervals: DataFrame, point_col,
                  lo_col: str, hi_col: str, bucket_width: float,
                  equi_keys=None,
                  max_buckets_per_interval: int = 10_000,
                  closed: str = "both") -> DataFrame:
    """Inner-join every point row to every interval row with
    ``lo <= point <= hi`` (and optional extra equi keys), via bucket
    binning. Output columns = points' columns ++ intervals' columns
    (equi keys appear once). NULL points/bounds and empty (hi < lo)
    intervals match nothing, like the SQL BETWEEN they replace.

    ``closed`` picks which bounds are inclusive: "both" (default, SQL
    BETWEEN), "left" (lo <= p < hi — half-open price/histogram bands,
    where a shared band edge must match exactly one band), "right"
    (lo < p <= hi), "neither". Bucket binning is unaffected (buckets
    over-approximate; the residual predicate decides).

    ``max_buckets_per_interval`` guards the explode: one open-ended
    interval would otherwise fan out into millions of rows. The check is
    a cheap aggregate on the interval side (the smaller input by
    construction) and raises before any explosion happens.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"closed={closed!r}: expected both/left/right/neither")
    equi_keys = list(equi_keys) if equi_keys else []
    p = F.col(point_col) if isinstance(point_col, str) else point_col
    w = F.lit(float(bucket_width))
    lo_b = F.floor(F.col(lo_col) / w).cast("long")
    hi_b = F.floor(F.col(hi_col) / w).cast("long")

    span = intervals.where(
        F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull()
        & (F.col(hi_col) >= F.col(lo_col)))
    worst = span.agg(F.max(hi_b - lo_b + 1).alias("m")).first()["m"]
    if worst is not None and worst > max_buckets_per_interval:
        raise ValueError(
            f"an interval spans {worst} buckets at width {bucket_width} "
            f"(> max_buckets_per_interval={max_buckets_per_interval}); "
            "widen bucket_width (see suggest_bucket_width) or split the "
            "interval side")

    exploded = span.withColumn(
        "__ij_bucket", F.explode(F.sequence(lo_b, hi_b)))
    binned = points.withColumn("__ij_bucket",
                               F.floor(p / w).cast("long"))
    on = ["__ij_bucket", *equi_keys]
    lo_cmp = (F.col(lo_col) <= p) if closed in ("both", "left") \
        else (F.col(lo_col) < p)
    hi_cmp = (p <= F.col(hi_col)) if closed in ("both", "right") \
        else (p < F.col(hi_col))
    return binned.join(exploded, on, "inner").where(lo_cmp & hi_cmp) \
                 .drop("__ij_bucket")


def sessionize(df: DataFrame, entity_col: str, ts_col, gap,
               session_col: str = "session_id") -> DataFrame:
    """Assign gap-based sessions per entity: a new session starts when
    the time since the previous event of the same entity exceeds ``gap``
    (same units as ``ts_col``; pass numeric epoch values for timestamps).
    Adds ``session_col`` = dense per-entity session index (0-based) —
    combine with the entity column for a globally unique key.

    One shuffle (by entity), then two codegen window passes; per-entity
    state is O(1). Rows with NULL entity or ts are dropped (no defined
    session)."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    w = Window.partitionBy(entity_col).orderBy(ts)
    prev = F.lag(ts).over(w)
    is_new = F.when(prev.isNull() | ((ts - prev) > F.lit(gap)), 1) \
              .otherwise(0)
    run = Window.partitionBy(entity_col).orderBy(ts) \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (df.where(F.col(entity_col).isNotNull() & ts.isNotNull())
              .withColumn("__sz_new", is_new)
              .withColumn(session_col,
                          (F.sum("__sz_new").over(run) - 1).cast("long"))
              .drop("__sz_new"))


def session_window_agg(df: DataFrame, entity_col: str, ts_col: str,
                       gap: str, *aggs: Column) -> DataFrame:
    """Spark-native session windows (``F.session_window``): groups rows
    of one entity into sessions spanning [first, last + gap); an event
    landing exactly on the current window end EXTENDS the session
    (merge when diff <= gap), the same boundary rule as `sessionize`'s
    ``> gap`` new-session test — pinned by
    tests/test_session_window.py::test_session_window_gap_boundary.

    Unlike `sessionize` this shape is streaming-capable: the same
    expression over a `readStream` source with a watermark maintains
    session state incrementally (append mode emits a session once the
    watermark passes its end; update mode is rejected for session
    windows; tests/test_session_window.py pins streaming == batch via
    complete mode on a finite source).
    Returns one row per session: (session_window struct, entity, aggs).
    """
    ts = F.col(ts_col)
    return (df.where(F.col(entity_col).isNotNull() & ts.isNotNull())
              .groupBy(F.session_window(ts, gap).alias("session_window"),
                       entity_col)
              .agg(*aggs))
