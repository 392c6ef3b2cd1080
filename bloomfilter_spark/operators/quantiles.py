"""Quantile query operators over t-digest / KLL sketches."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..agg import build_sketch, grouped_sketch_df
from ..config import WGL_THRESHOLD_LOCK
from ..sketches.kll import KLL
from ..sketches.tdigest import TDigest


def quantiles(df: DataFrame, col, qs: Sequence[float], method: str = "tdigest",
              **kwargs) -> list[float]:
    """Distributed quantile estimates for one numeric column."""
    sk = build_sketch(df, [col], _factory(method, kwargs))
    return [float(sk.quantile(q)) for q in qs]


def grouped_quantiles(df: DataFrame, keys: Sequence[str], col,
                      qs: Sequence[float], method: str = "tdigest",
                      salt: int = 8, **kwargs) -> DataFrame:
    """Per-key quantile estimates: (keys..., q50, q90, ...) via the salted
    two-phase grouped sketch topology."""
    ests = {name: (lambda s, q=q: float(s.quantile(q)))
            for name, q in zip([f"q{int(q * 100):02d}" for q in qs], qs)}
    return grouped_sketch_df(df, keys, [col], _factory(method, kwargs), ests,
                             salt=salt)


def ks_drift(df_a: DataFrame, df_b: DataFrame, col, k: int = 200,
             max_cardinality: int = 2_000_000) -> float:
    """Distribution drift between two corpora/slices: the two-sample
    Kolmogorov–Smirnov statistic sup_x |F_a(x) - F_b(x)| estimated from
    two KLL sketches (`KLL.ks_distance`), each built JVM-reduced
    (`jvm_build.quantile_build_preagg`: codegen groupBy(value).count with
    map-side combine — distinct-value rows over the pipe, not n).

    The 100 TB monitoring primitive: is this week's document-length /
    latency / quality-score distribution the same as last week's? Cost is
    two one-scan sketch builds; nothing is joined or collected beyond the
    value histograms. |est - exact_KS| <= ~2 * 1.7/k (sum of the two rank
    errors). Falls back to the streaming kernel build above
    ``max_cardinality`` distinct values.
    """
    from ..jvm_build import quantile_build_preagg
    out = []
    for df in (df_a, df_b):
        try:
            out.append(quantile_build_preagg(df, col, lambda: KLL(k=k),
                                             max_cardinality=max_cardinality))
        except ValueError:
            out.append(build_sketch(df, [col], lambda: KLL(k=k)))
    return out[0].ks_distance(out[1])


def robust_bounds(df: DataFrame, col, n_sigmas: float = 3.0, k: int = 200,
                  max_cardinality: int = 2_000_000) -> dict:
    """Robust outlier bounds from two one-scan KLL builds: median from a
    sketch of the values, MAD (median absolute deviation) from a sketch of
    |x - median|, then the normal-consistent band

        [median - n_sigmas * 1.4826 * MAD,  median + n_sigmas * 1.4826 * MAD]

    — the outlier gate that, unlike mean/stddev, is not itself dragged by
    the outliers it is trying to catch (50% breakdown point vs 0%).

    Returns {"median", "mad", "lo", "hi", "rank_eps"}; rank_eps is the
    sketch's rank-error bound, so median sits within rank [0.5 - eps,
    0.5 + eps] of the data and MAD within the same band of the deviation
    distribution. Cost: two sequential one-scan JVM-reduced builds
    (codegen groupBy(value).count, distinct-value rows over the pipe);
    NULL/NaN values are excluded. Degenerate data (MAD == 0, e.g. >50%
    identical values) collapses the band to the median — callers gating on
    it should treat mad == 0 specially."""
    from pyspark.sql import functions as F

    from ..jvm_build import quantile_build_preagg

    def one_scan(d, c):
        try:
            return quantile_build_preagg(d, c, lambda: KLL(k=k),
                                         max_cardinality=max_cardinality)
        except ValueError:
            return build_sketch(d, [c], lambda: KLL(k=k))

    sk = one_scan(df, col)
    med = float(sk.quantile(0.5))
    c = F.col(col) if isinstance(col, str) else col
    dev = df.where(c.isNotNull() & ~F.isnan(c.cast("double"))) \
            .select(F.abs(c - F.lit(med)).alias("__dev"))
    mad = float(one_scan(dev, "__dev").quantile(0.5))
    half = float(n_sigmas) * 1.4826 * mad
    return {"median": med, "mad": mad, "lo": med - half, "hi": med + half,
            "rank_eps": sk.rank_error_bound()}


def filter_outliers(df: DataFrame, col, n_sigmas: float = 3.0, k: int = 200,
                    keep_nulls: bool = False,
                    max_cardinality: int = 2_000_000) -> DataFrame:
    """Drop rows whose `col` falls outside the robust_bounds band — the
    "remove absurd document lengths / latencies before they skew
    training-mix budgets" step. The band is computed once on the driver
    (two scalar doubles); the filter itself is a pure codegen predicate
    pushed to the scan, so the pruning cost at 100 TB is the two sketch
    scans, not a shuffle."""
    from pyspark.sql import functions as F
    b = robust_bounds(df, col, n_sigmas=n_sigmas, k=k,
                      max_cardinality=max_cardinality)
    c = F.col(col) if isinstance(col, str) else col
    in_band = (c >= F.lit(b["lo"])) & (c <= F.lit(b["hi"]))
    if keep_nulls:
        return df.where(c.isNull() | in_band)
    return df.where(in_band)


def _factory(method: str, kwargs: dict):
    if method == "tdigest":
        return lambda: TDigest(**kwargs) if kwargs else TDigest()
    if method == "kll":
        return lambda: KLL(**kwargs) if kwargs else KLL()
    raise ValueError(f"unknown quantile method {method!r}")


def extreme_quantiles(df: DataFrame, col, qs: Sequence[float],
                      max_tail_rows: int = 1_000_000):
    """EXACT extreme-tail quantiles (p99.99, p99.999, max) via a bounded
    top-m: the regime where every rank sketch fails at corpus scale —
    KLL/t-digest carry ADDITIVE rank error eps*n, and at n = 10^12 even
    eps = 1e-4 smears p99.99 across 10^8 ranks, the entire tail. But the
    tail is SMALL by definition: rank-exact p-quantiles for p >= 1 - m/n
    need only the top m rows, and Catalyst's `orderBy(desc).limit(m)`
    plans as TakeOrderedAndProject — per-task local top-m heaps, no
    global sort, no shuffle of the corpus; O(m) rows reach the driver.

    Definition (pinned so any engine reproduces it bit-exactly): the
    q-quantile is the ceil(q*n)-th smallest value, i.e. the MINIMUM of
    the top (n - ceil(q*n) + 1) multiset — tie-insensitive, no
    interpolation.

    Returns a list of (q, value) tuples plus n, as
    ``{"n": n, "quantiles": [(q, value), ...]}``. Raises if any q needs
    a tail wider than ``max_tail_rows`` (use the KLL path for central
    quantiles — this operator is the tail complement, not a
    replacement). Two scans by design: a codegen count() (rank -> tail
    width needs n), then ONE TakeOrdered serving every requested q."""
    import math

    from pyspark.sql import functions as F

    from ..agg import _cols

    if not qs or not all(0 <= q <= 1 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {list(qs)}")
    c = _cols([col])[0].cast("double")
    vals = df.select(c.alias("__v")).where(
        F.col("__v").isNotNull() & ~F.isnan(F.col("__v")))
    n = vals.count()
    out = []
    if n == 0:
        return {"n": 0, "quantiles": [(float(q), None) for q in qs]}
    ranks = {q: max(math.ceil(q * n), 1) for q in qs}   # 1-indexed, q=0 -> min
    widest = max(n - r + 1 for r in ranks.values())
    if widest > max_tail_rows:
        raise ValueError(
            f"q={min(qs)} needs the top {widest} rows (> max_tail_rows="
            f"{max_tail_rows}); use quantiles()/KLL for central ranks")
    # one TakeOrdered for the widest tail serves every requested q
    tail = [r["__v"] for r in
            vals.orderBy(F.col("__v").desc()).limit(widest).collect()]
    tail.sort()                       # ascending; len == widest (<= n)
    for q in qs:
        m = n - ranks[q] + 1          # tail width for this q
        out.append((float(q), tail[len(tail) - m]))
    return {"n": n, "quantiles": out}


def grouped_extreme_quantiles(df: DataFrame, keys: Sequence[str], col,
                              qs: Sequence[float],
                              max_tail_rows_per_key: int = 100_000):
    """Per-key EXACT tail quantiles — extreme_quantiles' grouped form,
    fully distributed (no driver collection of values): per key,
    rank-descending window -> keep only each key's tail (Catalyst plans
    the rank<=m filter as WindowGroupLimit, so tasks never materialize a
    key's full value list) -> select the pinned rank per q.

    Rank definition matches extreme_quantiles: the q-quantile of a key
    with n values is its ceil(q*n)-th smallest = the (n-ceil(q*n)+1)-th
    LARGEST, tie-insensitive. Returns (keys..., q, value, n) rows.

    ``max_tail_rows_per_key`` bounds the per-key tail the window keeps
    (guard against central q on a huge key): a cheap pre-flight pass
    (limit-1 probe over the tail) raises if any key's widest tail —
    determined by min(qs) — exceeds it."""
    import math

    from pyspark.sql import Window, functions as F

    from ..agg import _cols

    if not qs or not all(0 <= q <= 1 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {list(qs)}")
    ks = list(keys)
    c = _cols([col])[0].cast("double")
    vals = (df.select(*ks, c.alias("__v"))
              .where(F.col("__v").isNotNull() & ~F.isnan(F.col("__v"))))
    q_min = min(qs)
    # per-key totals via map-side-combined groupBy (NOT count().over(),
    # whose unbounded frame buffers each key's rows in the window
    # operator); the counts table is O(keys) and drives both the guard
    # and the per-key tail width
    counts = vals.groupBy(*ks).agg(F.count("*").alias("__n"))
    widest_of = (F.col("__n")
                 - F.greatest(F.ceil(F.lit(q_min) * F.col("__n")), F.lit(1))
                 + 1)
    # one O(keys) aggregate doubles as the guard AND the tightest
    # literal rank cutoff any key needs
    mx_row = counts.agg(F.max(widest_of).alias("mx")).first()
    cutoff = int(mx_row["mx"] or 0)
    if cutoff > max_tail_rows_per_key:
        raise ValueError(
            f"a key's q={q_min} tail needs {cutoff} rows "
            f"(> max_tail_rows_per_key={max_tail_rows_per_key}); use "
            "grouped_quantiles()/KLL for central ranks")
    cutoff = max(cutoff, 1)
    # LITERAL rank cutoff: Catalyst rewrites rank<=literal into
    # WindowGroupLimit (per-task top-m heaps before the window sort,
    # asserted in tests) — the rewrite only fires up to the optimizer
    # threshold, so raise it to cover this cutoff, SCOPED: the returned
    # plan is materialized eagerly under the raised threshold (a
    # DataFrame's QueryExecution is fixed at creation, so the rewrite is
    # pinned into it), then the session value is restored — no hidden
    # global side effect on later window queries. Caveat: a DataFrame
    # DERIVED from the result re-optimizes under the restored threshold
    # and may lose the rewrite when cutoff exceeds it (correctness
    # unaffected; only the top-m heap pruning). The shared lock keeps the
    # raised window invisible to the library's other planning threads
    # (config.WGL_THRESHOLD_LOCK, shared with jvm_build's grouped builds).
    spark = df.sparkSession
    thr_key = "spark.sql.optimizer.windowGroupLimitThreshold"
    with WGL_THRESHOLD_LOCK:
        prev = spark.conf.get(thr_key, None)
        raised = int(prev if prev is not None else "1000") < cutoff
        if raised:
            spark.conf.set(thr_key, str(cutoff))
        try:
            w = Window.partitionBy(*ks).orderBy(F.col("__v").desc())
            ranked = (vals.withColumn("__rk", F.row_number().over(w))
                          .where(F.col("__rk") <= cutoff)
                          .join(counts, ks))
            tail = ranked.where(F.col("__rk") <= widest_of)
            q_df = F.explode(F.array(*[F.lit(float(q)) for q in qs])) \
                    .alias("q")
            picked = (tail.select(*ks, "__v", "__n", "__rk", q_df)
                          .where(F.col("__rk")
                                 == F.col("__n")
                                 - F.greatest(
                                     F.ceil(F.col("q") * F.col("__n")),
                                     F.lit(1)) + 1))
            out = picked.select(*ks, "q", F.col("__v").alias("value"),
                                F.col("__n").alias("n"))
            if raised:
                # force optimization NOW so the pinned plan carries the
                # rewrite
                out._jdf.queryExecution().executedPlan()
            return out
        finally:
            if raised:
                if prev is None:
                    spark.conf.unset(thr_key)
                else:
                    spark.conf.set(thr_key, prev)


def quantile_rank_normalize(df: DataFrame, col, n_buckets: int = 1000,
                            k: int = 200, out_col: str | None = None,
                            sketch: KLL | None = None) -> DataFrame:
    """Percentile-rank transform of a column — each value mapped to its
    approximate CDF position in (0, 1) — WITHOUT the global sort
    ``percent_rank()`` needs (a total-order window is a single-reducer
    chokepoint at 100 TB; this is one KLL scan + a codegen fold).

    Mechanism: one KLL build over the column (or pass a prebuilt/
    warehoused ``sketch`` for zero extra scans), ``n_buckets`` equi-depth
    cut points from it, then rank = (bucket + 0.5) / n_buckets via
    `layout.equidepth_bucket`'s higher-order array fold — whole-stage
    codegen, no Python in the transform plan. Error <= KLL rank error
    (~1.7/k) + 1/(2*n_buckets) quantization; ranks are bucket midpoints,
    so they never hit exactly 0 or 1 (safe for logit-style downstream
    transforms). Heavy ties: all rows of a tied value land in ONE bucket
    (cut points collapse), matching the CDF convention. NULL/NaN values
    get NULL ranks.

    The feature-scaling normalizer for training pipelines: rank features
    are distribution-free, robust to outliers, and — because the sketch
    is mergeable and persistable — train-time and serve-time transforms
    can share the exact same cut points via the sketch warehouse.
    """
    from .layout import equidepth_bucket, kll_cut_points

    name = col if isinstance(col, str) else df.select(col).columns[0]
    v = F.col(name) if isinstance(col, str) else col
    if sketch is None:
        # pass the Column itself, not its stringified name — an
        # expression like F.col("x")*2 has no resolvable column name
        sketch = build_sketch(
            df.where(v.isNotNull() & ~F.isnan(v.cast("double"))),
            [v], lambda: KLL(k))
    if sketch.n == 0:
        raise ValueError(
            "quantile_rank_normalize: the column has no non-NULL/non-NaN "
            "values (or the prebuilt sketch is empty) — cut points would "
            "be NaN and every row would silently rank in bucket 0")
    cuts = kll_cut_points(sketch, n_buckets)
    # NaN guard: Spark orders NaN above every number, so without this a
    # NaN row would fold into the TOP bucket and rank ~1.0 instead of
    # the documented NULL (equidepth_bucket already maps NULL -> NULL)
    vd = v.cast("double")
    rank = F.when(F.isnan(vd), F.lit(None).cast("double")).otherwise(
        (equidepth_bucket(v, cuts) + F.lit(0.5)) / F.lit(n_buckets))
    return df.withColumn(out_col or f"{name}_qrank", rank)
