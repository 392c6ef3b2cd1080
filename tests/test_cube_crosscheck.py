"""Sketch cube/rollup composition + cross-checks against Spark's own
approximate aggregates (SURVEY.md §2.6: approx_count_distinct,
percentile_approx, count_min_sketch used as independent oracles)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.agg import build_sketch
from bloomfilter_spark.operators.cube import sketch_cube, sketch_rollup
from bloomfilter_spark.sketches import KLL, CountMinSketch, HyperLogLog, TDigest


def test_sketch_cube_matches_exact_cube(spark, lineitem):
    got = sketch_cube(lineitem, ["l_returnflag", "l_linestatus"], ["l_orderkey"],
                      lambda: HyperLogLog(14),
                      {"nd": lambda s: s.estimate()}, salt=2)
    rows = got.collect()
    assert len(rows) == (lineitem.select("l_returnflag").distinct().count() *
                         lineitem.select("l_linestatus").distinct().count()
                         + lineitem.select("l_returnflag").distinct().count()
                         + lineitem.select("l_linestatus").distinct().count() + 1)
    exact_global = lineitem.select("l_orderkey").distinct().count()
    glob = [r for r in rows if r["l_returnflag"] is None and r["l_linestatus"] is None]
    assert len(glob) == 1
    assert abs(glob[0]["nd"] - exact_global) / exact_global < 0.05
    exact_by_flag = {r["l_returnflag"]: r["n"] for r in
                     lineitem.groupBy("l_returnflag")
                     .agg(F.countDistinct("l_orderkey").alias("n")).collect()}
    for r in rows:
        if r["l_returnflag"] is not None and r["l_linestatus"] is None:
            n = exact_by_flag[r["l_returnflag"]]
            assert abs(r["nd"] - n) / n < 0.05


def test_sketch_rollup_levels(spark, events):
    got = sketch_rollup(events, ["event_type"], ["user_id"],
                        lambda: HyperLogLog(12),
                        {"nd": lambda s: s.estimate()}, salt=2)
    rows = got.collect()
    n_types = events.select("event_type").distinct().count()
    assert len(rows) == n_types + 1
    assert sum(1 for r in rows if r["event_type"] is None) == 1


def test_sketch_cube_single_scan_equals_per_set(spark, lineitem):
    """The single-scan cube (finest sketch table merged upward) must give
    IDENTICAL estimates to independent per-set builds: HLL merge is
    commutative/associative and byte-exact, so any merge order of the same
    inserted set yields the same registers."""
    kwargs = dict(cols=["l_orderkey"], factory=lambda: HyperLogLog(14),
                  estimates={"nd": lambda s: s.estimate()}, salt=2)
    one = sketch_cube(lineitem, ["l_returnflag", "l_linestatus"],
                      single_scan=True, **kwargs)
    per = sketch_cube(lineitem, ["l_returnflag", "l_linestatus"],
                      single_scan=False, **kwargs)
    key = lambda r: (r["l_returnflag"], r["l_linestatus"], r["gid"])  # noqa: E731
    a = {key(r): r["nd"] for r in one.collect()}
    b = {key(r): r["nd"] for r in per.collect()}
    assert a == b


# --- cross-checks vs Spark built-ins -------------------------------------

def test_hll_vs_spark_approx_count_distinct(spark, lineitem):
    ours = build_sketch(lineitem, ["l_partkey"], lambda: HyperLogLog(14)).estimate()
    spark_est = lineitem.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("e")).first()["e"]
    exact = lineitem.select("l_partkey").distinct().count()
    assert abs(ours - exact) / exact < 0.03
    assert abs(spark_est - exact) / exact < 0.05
    assert abs(ours - spark_est) / exact < 0.07  # two estimators agree


def test_quantiles_vs_spark_percentile_approx(spark, lineitem):
    td = build_sketch(lineitem, ["l_extendedprice"], lambda: TDigest(200))
    kll = build_sketch(lineitem, ["l_extendedprice"], lambda: KLL(200))
    sp = lineitem.agg(F.percentile_approx(
        "l_extendedprice", [0.5, 0.9], 10000).alias("p")).first()["p"]
    exact = lineitem.selectExpr(
        "percentile(l_extendedprice, array(0.5, 0.9)) p").first()["p"]
    for i, q in enumerate((0.5, 0.9)):
        for est in (td.quantile(q), kll.quantile(q), sp[i]):
            assert abs(est - exact[i]) / exact[i] < 0.05, (q, est, exact[i])


def test_cms_vs_spark_count_min_sketch(spark, events):
    """Spark's count_min_sketch SQL aggregate as an independent CMS: both
    must over-estimate exact counts by at most their bounds."""
    ours = build_sketch(events, ["event_type"], lambda: CountMinSketch(eps=1e-4,
                                                                       delta=1e-3))
    exact = {r["event_type"]: r["n"] for r in
             events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    from bloomfilter_spark.agg import with_cms_count
    keys = spark.createDataFrame([(k,) for k in exact], "event_type string")
    est = {r["event_type"]: r["est_count"] for r in
           with_cms_count(keys, ours, ["event_type"]).collect()}
    # spark's own CMS exists and runs (sanity that semantics align)
    spark_cms = events.agg(F.expr(
        "count_min_sketch(event_type, 0.001d, 0.99d, 42)")).first()[0]
    assert spark_cms is not None
    for k, n in exact.items():
        assert est[k] >= n
        assert est[k] - n <= max(2 * ours.error_bound(), 1)
