"""Weighted quantile-sketch inserts + the pre-aggregated JVM-reduced build
(jvm_build.quantile_build_preagg): rank bounds must hold identically to
the per-row path, since weighted insert is a level-wise merge (KLL) /
a weighted _compress (t-digest)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.agg import build_sketch
from bloomfilter_spark.jvm_build import quantile_build_preagg
from bloomfilter_spark.sketches import KLL, HyperLogLog, TDigest

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _weighted_rank(x: np.ndarray, w: np.ndarray, v: float) -> float:
    return w[x <= v].sum() / w.sum()


@pytest.fixture(scope="module")
def discrete_corpus():
    rng = np.random.default_rng(7)
    vals = np.arange(500, dtype=np.float64)            # 500 distinct values
    wts = rng.integers(1, 2000, size=vals.size)        # skewed counts
    return vals, wts


def test_kll_update_weighted_rank_bound(discrete_corpus):
    vals, wts = discrete_corpus
    sk = KLL(200)
    sk.update_weighted(vals, wts)
    assert sk.n == int(wts.sum())
    for q in QS:
        est = sk.quantile(q)
        assert abs(_weighted_rank(vals, wts, est) - q) \
            <= 3 * sk.rank_error_bound(), q


def test_kll_update_weighted_equals_repeat_semantics(discrete_corpus):
    """Weighted insert answers like the explicit-repetition build (both
    within bound of the same exact ranks; n identical)."""
    vals, wts = discrete_corpus
    a = KLL(200)
    a.update_weighted(vals, wts)
    b = KLL(200)
    b.update(np.repeat(vals, wts))
    assert a.n == b.n
    for q in QS:
        ra = _weighted_rank(vals, wts, a.quantile(q))
        rb = _weighted_rank(vals, wts, b.quantile(q))
        assert abs(ra - rb) <= 6 * a.rank_error_bound(), q


def test_kll_weighted_merges_with_unweighted(discrete_corpus):
    vals, wts = discrete_corpus
    a = KLL(200)
    a.update_weighted(vals, wts)
    b = KLL(200)
    b.update(np.repeat(vals, wts))
    merged = a.merge(b)
    assert merged.n == 2 * int(wts.sum())
    for q in QS:
        est = merged.quantile(q)
        assert abs(_weighted_rank(vals, wts, est) - q) \
            <= 4 * merged.rank_error_bound(), q


def test_kll_weighted_rejects_fractional():
    with pytest.raises(ValueError, match="integral"):
        KLL(200).update_weighted(np.array([1.0]), np.array([1.5]))


def test_tdigest_update_weighted_rank_bound(discrete_corpus):
    vals, wts = discrete_corpus
    sk = TDigest(200)
    sk.update_weighted(vals, wts.astype(np.float64))
    for q in QS:
        est = sk.quantile(q)
        assert abs(_weighted_rank(vals, wts, est) - q) <= 0.015, q


def test_quantile_build_preagg_kll_vs_exact(spark, lineitem):
    x = np.sort(lineitem.select(F.col("l_quantity").cast("double"))
                .toPandas()["l_quantity"].to_numpy())
    sk = quantile_build_preagg(lineitem, "l_quantity", lambda: KLL(200))
    assert sk.n == x.size
    for q in QS:
        est = sk.quantile(q)
        true_rank = (x <= est).mean()
        assert abs(true_rank - q) <= 3 * sk.rank_error_bound(), q


def test_quantile_build_preagg_tdigest_vs_kernel_build(spark, lineitem):
    pre = quantile_build_preagg(lineitem, "l_extendedprice",
                                lambda: TDigest(200),
                                max_cardinality=2_000_000)
    x = np.sort(lineitem.select(F.col("l_extendedprice").cast("double"))
                .toPandas()["l_extendedprice"].to_numpy())
    for q in QS:
        true_rank = (x <= pre.quantile(q)).mean()
        assert abs(true_rank - q) <= 0.015, q


def test_quantile_build_preagg_cardinality_guard(spark, lineitem):
    with pytest.raises(ValueError, match="distinct"):
        quantile_build_preagg(lineitem, "l_extendedprice",
                              lambda: KLL(200), max_cardinality=10)


def test_quantile_build_preagg_rejects_hash_keyed(spark, lineitem):
    with pytest.raises(ValueError, match="value sketches"):
        quantile_build_preagg(lineitem, "l_quantity",
                              lambda: HyperLogLog(12))


def test_ks_drift_spark(spark, lineitem):
    """operators.quantiles.ks_drift end-to-end: same-slice drift is near
    zero, a shifted copy is detected, both within the summed rank-error
    tolerance of the exact two-sample KS."""
    from bloomfilter_spark.operators.quantiles import ks_drift

    def exact_ks(x, y):
        pts = np.union1d(x, y)
        fx = np.searchsorted(np.sort(x), pts, side="right") / x.size
        fy = np.searchsorted(np.sort(y), pts, side="right") / y.size
        return float(np.abs(fx - fy).max())

    a = lineitem.where(F.col("l_orderkey") % 2 == 0) \
                .select(F.col("l_extendedprice").alias("x"))
    b = lineitem.where(F.col("l_orderkey") % 2 == 1) \
                .select(F.col("l_extendedprice").alias("x"))
    shifted = b.select((F.col("x") * 1.5).alias("x"))
    xa = a.toPandas()["x"].to_numpy(dtype=np.float64)
    xb = b.toPandas()["x"].to_numpy(dtype=np.float64)
    k = 400
    tol = 4 * (2 * 1.7 / k)
    same = ks_drift(a, b, "x", k=k)
    assert abs(same - exact_ks(xa, xb)) <= tol
    drift = ks_drift(a, shifted, "x", k=k)
    assert abs(drift - exact_ks(xa, 1.5 * xb)) <= tol
    assert drift > same + 0.05
    # high-cardinality fallback path (kernel build) agrees
    fallback = ks_drift(a, shifted, "x", k=k, max_cardinality=10)
    assert abs(fallback - exact_ks(xa, 1.5 * xb)) <= tol


# --- robust outlier bounds --------------------------------------------------

def test_robust_bounds_matches_exact_median_mad(spark):
    import numpy as np
    from bloomfilter_spark.operators.quantiles import robust_bounds
    rng = np.random.default_rng(11)
    vals = rng.normal(100.0, 10.0, 20000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    b = robust_bounds(df, "v", n_sigmas=3.0)
    exact_med = float(np.median(vals))
    exact_mad = float(np.median(np.abs(vals - exact_med)))
    # sketch median within the rank-error band of the exact one
    eps = b["rank_eps"]
    assert abs((vals < b["median"]).mean() - 0.5) <= eps + 1e-3
    assert abs(b["median"] - exact_med) < 10.0 * eps * 40  # loose value band
    assert abs(b["mad"] - exact_mad) / exact_mad < 0.15
    assert b["lo"] < exact_med < b["hi"]


def test_filter_outliers_drops_injected_extremes(spark):
    """90% N(0,1) bulk + 10% mass at 1e9: a mean/std gate would keep the
    outliers (they drag sigma); the robust gate must drop exactly the
    extreme block and keep ~all of the bulk."""
    import numpy as np
    from bloomfilter_spark.operators.quantiles import filter_outliers
    rng = np.random.default_rng(5)
    bulk = rng.normal(0.0, 1.0, 18000)
    rows = [(float(v), "bulk") for v in bulk] + [(1e9, "out")] * 2000
    df = spark.createDataFrame(rows, "v double, tag string")
    kept = filter_outliers(df, "v", n_sigmas=5.0)
    tags = {r["tag"]: r["n"] for r in
            kept.groupBy("tag").agg(F.count("*").alias("n")).collect()}
    assert tags.get("out", 0) == 0
    assert tags["bulk"] >= int(0.99 * len(bulk))


def test_robust_bounds_degenerate_mad_zero(spark):
    from bloomfilter_spark.operators.quantiles import robust_bounds
    df = spark.createDataFrame([(7.0,)] * 1000, "v double")
    b = robust_bounds(df, "v")
    assert b["median"] == 7.0 and b["mad"] == 0.0
    assert b["lo"] == b["hi"] == 7.0


def test_filter_outliers_keep_nulls(spark):
    from bloomfilter_spark.operators.quantiles import filter_outliers
    rows = [(float(i),) for i in range(100)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "v double")
    with_nulls = filter_outliers(df, "v", n_sigmas=10.0, keep_nulls=True)
    without = filter_outliers(df, "v", n_sigmas=10.0)
    assert with_nulls.where(F.col("v").isNull()).count() == 5
    assert without.where(F.col("v").isNull()).count() == 0


def test_extreme_quantiles_exact_and_guard(spark):
    """extreme_quantiles: bit-exact against a full sort at every
    requested rank (incl. q=0 clamp and q=1 max), and the max_tail_rows
    guard rejects central quantiles."""
    import math
    import pytest
    from pyspark.sql import functions as F
    from bloomfilter_spark.operators import extreme_quantiles

    df = spark.range(10007).select(
        (F.xxhash64("id") % 100000).cast("double").alias("v"))
    vals = sorted(r["v"] for r in df.collect())
    n = len(vals)
    qs = [0.0, 0.5, 0.999, 0.9999, 1.0]
    res = extreme_quantiles(df, "v", qs, max_tail_rows=n + 1)
    assert res["n"] == n
    for q, got in res["quantiles"]:
        want = vals[max(math.ceil(q * n), 1) - 1]
        assert got == want, (q, got, want)

    with pytest.raises(ValueError, match="max_tail_rows"):
        extreme_quantiles(df, "v", [0.5], max_tail_rows=100)
    empty = extreme_quantiles(df.where("v IS NULL"), "v", [0.99])
    assert empty == {"n": 0, "quantiles": [(0.99, None)]}


def test_grouped_extreme_quantiles_exact(spark):
    """Per-key exact tails: every (key, q) value equals the full-sort
    reference at the pinned rank; guard rejects too-central q."""
    import math
    import pytest
    from collections import defaultdict
    from pyspark.sql import functions as F
    from bloomfilter_spark.operators import grouped_extreme_quantiles

    df = spark.range(30011).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.xxhash64("id") % 100000).cast("double").alias("v"))
    ref = defaultdict(list)
    for r in df.collect():
        ref[r["k"]].append(r["v"])
    for vs in ref.values():
        vs.sort()
    qs = [0.99, 0.999, 1.0]
    out = grouped_extreme_quantiles(df, ["k"], "v", qs)
    # the literal rank cutoff must engage the WindowGroupLimit rewrite
    # (per-task top-m heaps), the property the operator exists for
    assert "WindowGroupLimit" in \
        out._jdf.queryExecution().executedPlan().toString()
    got = out.collect()
    assert len(got) == 7 * len(qs)
    for r in got:
        vs = ref[r["k"]]
        n = len(vs)
        assert r["n"] == n
        want = vs[max(math.ceil(r["q"] * n), 1) - 1]
        assert r["value"] == want, (r, want)

    with pytest.raises(ValueError, match="max_tail_rows_per_key"):
        grouped_extreme_quantiles(df, ["k"], "v", [0.5],
                                  max_tail_rows_per_key=50)


def test_extreme_quantiles_reject_out_of_range_q(spark):
    """q outside [0, 1] (or an empty q list) raises instead of silently
    mis-indexing the tail / dropping rows."""
    import pytest
    from pyspark.sql import functions as F
    from bloomfilter_spark.operators import (extreme_quantiles,
                                             grouped_extreme_quantiles)

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.col("id").cast("double").alias("v"))
    for bad in ([1.5], [0.9, 2.0], [-0.1], []):
        with pytest.raises(ValueError, match="quantiles must be in"):
            extreme_quantiles(df, "v", bad)
        with pytest.raises(ValueError, match="quantiles must be in"):
            grouped_extreme_quantiles(df, ["k"], "v", bad)


def test_grouped_extreme_quantiles_restores_window_threshold(spark):
    """The WindowGroupLimit threshold raise is scoped: the returned plan
    carries the rewrite, but the session conf is restored afterwards (no
    hidden global optimizer side effect)."""
    from pyspark.sql import functions as F
    from bloomfilter_spark.operators import grouped_extreme_quantiles

    thr_key = "spark.sql.optimizer.windowGroupLimitThreshold"
    prev = spark.conf.get(thr_key, None)
    try:
        spark.conf.set(thr_key, "10")
        df = spark.range(5000).select(
            (F.col("id") % 2).cast("string").alias("k"),
            F.col("id").cast("double").alias("v"))
        # widest tail per key ~ 25 rows > the 10 threshold -> must raise it
        out = grouped_extreme_quantiles(df, ["k"], "v", [0.99, 1.0])
        assert spark.conf.get(thr_key) == "10"   # restored
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan        # rewrite pinned in plan
        assert out.count() == 4                  # still correct
    finally:
        if prev is None:
            spark.conf.unset(thr_key)
        else:
            spark.conf.set(thr_key, prev)


def test_quantile_rank_normalize_accuracy_and_plan(spark, lineitem):
    """quantile_rank_normalize stays within KLL rank error + bucket
    quantization of the exact empirical CDF on a near-unique column,
    never emits 0 or 1, gives tied values identical ranks, maps NULLs to
    NULL, reuses a prebuilt sketch with a Python-free transform plan,
    and validates n_buckets."""
    import numpy as np

    from bloomfilter_spark.operators.quantiles import quantile_rank_normalize

    li = lineitem.select(F.col("l_extendedprice").alias("v"))
    out = quantile_rank_normalize(li, "v", n_buckets=500, k=200).toPandas()
    n = len(out)
    exact_cdf = out["v"].rank(method="max").to_numpy() / n
    err = np.abs(out["v_qrank"].to_numpy() - exact_cdf)
    tol = 1.7 / 200 + 1 / (2 * 500) + 0.01
    assert err.max() <= tol
    assert (out["v_qrank"] > 0).all() and (out["v_qrank"] < 1).all()

    # ties collapse to one rank; NULL -> NULL; prebuilt sketch reused
    from bloomfilter_spark.agg import build_sketch
    from bloomfilter_spark.sketches import KLL
    ties = spark.createDataFrame(
        [(1.0,)] * 50 + [(2.0,)] * 50 + [(None,)], "v double")
    sk = build_sketch(ties.where(F.col("v").isNotNull()), ["v"],
                      lambda: KLL(200))
    ranked = quantile_rank_normalize(ties, "v", n_buckets=10, sketch=sk)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    pdf = ranked.toPandas()
    assert pdf[pdf["v"] == 1.0]["v_qrank"].nunique() == 1
    assert pdf[pdf["v"] == 2.0]["v_qrank"].nunique() == 1
    assert (pdf[pdf["v"] == 1.0]["v_qrank"].iloc[0]
            < pdf[pdf["v"] == 2.0]["v_qrank"].iloc[0])
    assert pdf[pdf["v"].isna()]["v_qrank"].isna().all()

    with pytest.raises(ValueError, match="buckets"):
        quantile_rank_normalize(ties, "v", n_buckets=1, sketch=sk)


def test_quantile_rank_normalize_nan_expr_and_empty_guards(spark):
    """Review-pass regressions: NaN values rank NULL (Spark sorts NaN
    above every number, so unguarded they fell in the TOP bucket at rank
    ~1.0); a Column EXPRESSION input builds the sketch from the
    expression, not its unresolvable stringified name; an empty /
    all-NULL column raises instead of silently ranking every row in
    bucket 0."""
    import math

    from bloomfilter_spark.operators.quantiles import quantile_rank_normalize

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)]
        + [(float("nan"),), (None,)], "x double")
    out = quantile_rank_normalize(df, "x", n_buckets=10, k=200,
                                  out_col="r").toPandas()
    finite = out[out["x"].notna()]                   # None and NaN -> NaN
    assert finite.set_index("x")["r"].loc[100.0] > 0.9  # real max ranks high
    assert out[out["x"].isna()]["r"].isna().all()    # NaN/NULL -> NULL rank
    assert out["r"].isna().sum() == 2                # exactly those two rows

    from pyspark.sql import functions as F
    expr_out = quantile_rank_normalize(
        spark.range(1, 101).select(F.col("id").cast("double").alias("x")),
        F.col("x") * 2, n_buckets=10, out_col="r").toPandas()
    assert expr_out["r"].between(0.0, 1.0).all()

    empty = spark.createDataFrame([(None,), (float("nan"),)], "x double")
    with pytest.raises(ValueError, match="no non-NULL"):
        quantile_rank_normalize(empty, "x", n_buckets=10)
