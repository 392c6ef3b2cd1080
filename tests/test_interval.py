"""Interval join + sessionization (operators/interval.py): exact
equivalence with the naive non-equi join, bucket-width invariance,
explosion guard, session assignment vs a Python reference."""

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.interval import (interval_join, sessionize,
                                                  suggest_bucket_width)


def _naive(points, intervals, p, lo, hi, equi=None):
    cond = (F.col(lo) <= F.col(p)) & (F.col(p) <= F.col(hi))
    for k in (equi or []):
        cond = cond & (points[k] == intervals[k])
    out = points.alias("a").join(intervals.alias("b"), cond)
    return out


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [(i, float(i * 7 % 100), f"u{i % 3}") for i in range(200)],
        "pid long, x double, grp string")


@pytest.fixture(scope="module")
def ivs(spark):
    rows = [(j, float(j * 13 % 90), float(j * 13 % 90 + j % 17), f"u{j % 3}")
            for j in range(40)]
    rows += [(100, 50.0, 40.0, "u0"),      # empty interval (hi < lo)
             (101, None, 10.0, "u1"),      # NULL lo
             (102, 5.0, None, "u2")]       # NULL hi
    return spark.createDataFrame(rows, "iid long, lo double, hi double, grp string")


def test_interval_join_equals_naive(spark, pts, ivs):
    for width in (1.0, 5.0, 33.3):
        got = sorted((r["pid"], r["iid"]) for r in
                     interval_join(pts, ivs.drop("grp"), "x", "lo", "hi",
                                   width).collect())
        want = sorted((r["pid"], r["iid"]) for r in
                      _naive(pts, ivs.drop("grp"), "x", "lo", "hi").collect())
        assert got == want and len(want) > 0, width


def test_interval_join_equi_keys(spark, pts, ivs):
    got = sorted((r["pid"], r["iid"]) for r in
                 interval_join(pts, ivs, "x", "lo", "hi", 10.0,
                               equi_keys=["grp"]).collect())
    want = sorted((r["pid"], r["iid"]) for r in
                  _naive(pts.select("pid", "x", "grp"),
                         ivs.select("iid", "lo", "hi", "grp"),
                         "x", "lo", "hi", equi=["grp"])
                  .collect())
    assert got == want and len(want) > 0


def test_interval_join_guard_and_validation(spark, pts, ivs):
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, ivs, "x", "lo", "hi", 0.0)
    with pytest.raises(ValueError, match="spans"):
        interval_join(pts, ivs.drop("grp"), "x", "lo", "hi", 0.001,
                      max_buckets_per_interval=100)


def test_suggest_bucket_width_median_length(spark, ivs):
    w = suggest_bucket_width(ivs.where(F.col("iid") < 100), "lo", "hi")
    lens = sorted((r["hi"] - r["lo"]) for r in
                  ivs.where(F.col("iid") < 100).collect())
    # KLL at k=200 on 40 values is exact: median within the value set
    assert lens[len(lens) // 2 - 1] <= w <= lens[len(lens) // 2 + 1]
    assert suggest_bucket_width(ivs.limit(0), "lo", "hi") == 1.0


def test_sessionize_matches_reference(spark):
    rows = [("a", 0.0), ("a", 10.0), ("a", 100.0), ("a", 101.0),
            ("a", 300.0), ("b", 5.0), ("b", 400.0), ("c", 7.0),
            ("a", None), (None, 1.0)]
    df = spark.createDataFrame(rows, "user string, ts double")
    out = sessionize(df, "user", "ts", gap=50.0)
    got = {(r["user"], r["ts"]): r["session_id"] for r in out.collect()}
    want = {("a", 0.0): 0, ("a", 10.0): 0, ("a", 100.0): 1,
            ("a", 101.0): 1, ("a", 300.0): 2,
            ("b", 5.0): 0, ("b", 400.0): 1, ("c", 7.0): 0}
    assert got == want  # NULL user/ts rows dropped


def test_sessionize_partition_invariant(spark, pts):
    ev = pts.select(F.col("grp").alias("user"), F.col("x").alias("ts"),
                    "pid")
    a = sorted((r["user"], r["ts"], r["pid"], r["session_id"])
               for r in sessionize(ev, "user", "ts", 3.0).collect())
    b = sorted((r["user"], r["ts"], r["pid"], r["session_id"])
               for r in sessionize(ev.repartition(13), "user", "ts", 3.0)
               .collect())
    assert a == b


def test_interval_join_closed_modes(spark):
    """Points exactly on shared band edges: 'left' (half-open) assigns the
    edge to exactly one band; 'both' matches it in two; 'right'/'neither'
    mirror. Bucket binning must not lose any edge case."""
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 15.0), (4, 20.0)], "pid long, x double")
    ivs = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 10.0, 20.0)], "iid long, lo double, hi double")
    def got(closed):
        return sorted((r["pid"], r["iid"]) for r in
                      interval_join(pts, ivs, "x", "lo", "hi", 10.0,
                                    closed=closed).collect())
    assert got("both") == [(1, 100), (2, 100), (2, 200), (3, 200), (4, 200)]
    assert got("left") == [(1, 100), (2, 200), (3, 200)]
    assert got("right") == [(2, 100), (3, 200), (4, 200)]
    assert got("neither") == [(3, 200)]
    with pytest.raises(ValueError, match="closed"):
        interval_join(pts, ivs, "x", "lo", "hi", 10.0, closed="open")
