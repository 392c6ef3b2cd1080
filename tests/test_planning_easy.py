"""Planning arithmetic and the Easy convenience API."""

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.easy import (approx_distinct, approx_quantiles,
                                    bloom_fit, bloom_membership)
from bloomfilter_spark.plans import (merge_partitions_for, plan_bloom,
                                     scaling_efficiency,
                                     shuffle_partitions_for)


def test_plan_bloom_broadcastable_smallscale():
    p = plan_bloom(100000, 0.01)
    assert p.broadcastable and p.n_shards == 1
    assert p.num_bits == 1048576 and p.num_hashes == 7


def test_plan_bloom_sharded_at_web_scale():
    """n=10^10 keys @1% -> ~2^37 bits = 16 GiB: not broadcastable, sharded
    into ~64 MiB shards (SURVEY.md §4 cap-lift row)."""
    p = plan_bloom(10**10, 0.01)
    assert not p.broadcastable
    assert p.n_shards >= 2 and (p.n_shards & (p.n_shards - 1)) == 0
    assert p.filter_bytes / p.n_shards <= 128 << 20


def test_merge_partitions_scale():
    assert merge_partitions_for(1024, 1 << 20) >= 16
    # 100k partitions of 1 GiB partials: width must cap task fan-in
    w = merge_partitions_for(100_000, 1 << 30)
    assert w >= 100_000 / 4  # <= 4 partials of 1GiB per task


def test_shuffle_partitions_for():
    assert shuffle_partitions_for(10 << 30) == 80
    assert shuffle_partitions_for(1 << 20) == 32  # floor


def test_scaling_efficiency_math():
    assert scaling_efficiency(100.0, 400.0) == 1.0
    assert scaling_efficiency(100.0, 320.0) == pytest.approx(0.8)
    assert scaling_efficiency(0.0, 100.0) == 0.0


def test_easy_bloom_fit_roundtrip(spark, lineitem):
    bf = bloom_fit(lineitem, ["l_orderkey"], fpr=0.01)
    out = bloom_membership(lineitem, bf, ["l_orderkey"])
    assert out.where(~F.col("is_member")).count() == 0


def test_easy_approx_distinct(spark, lineitem):
    est = approx_distinct(lineitem, ["l_orderkey"])
    exact = lineitem.select("l_orderkey").distinct().count()
    assert abs(est - exact) / exact < 0.05


def test_easy_approx_quantiles(spark, lineitem):
    for method in ("tdigest", "kll"):
        q50, q99 = approx_quantiles(lineitem, "l_quantity", [0.5, 0.99], method)
        assert q50 <= q99


# --- skew diagnosis ------------------------------------------------------

def test_suggest_salt_math():
    from bloomfilter_spark.plans import suggest_salt
    assert suggest_salt(0.3, 32) == 10
    assert suggest_salt(0.0, 32) == 1
    assert suggest_salt(1.0, 32) == 32
    assert suggest_salt(0.5, 64, max_salt=16) == 16
    with pytest.raises(ValueError):
        suggest_salt(1.5, 32)


def test_diagnose_skew_finds_hot_key(spark):
    from bloomfilter_spark.plans import diagnose_skew
    # 500 rows of key "hot" + 500 spread over 100 cold keys
    hot = spark.range(500).selectExpr("'hot' AS k")
    cold = spark.range(500).selectExpr("concat('c', id % 100) AS k")
    key, share, salt = diagnose_skew(hot.unionAll(cold), "k", partitions=32)
    assert key == ("hot",)
    assert share == pytest.approx(0.5)
    assert salt == 16


def test_diagnose_skew_empty(spark):
    from bloomfilter_spark.plans import diagnose_skew
    df = spark.range(10).selectExpr("'x' AS k").where("1=0")
    assert diagnose_skew(df, "k", partitions=8) == (None, 0.0, 1)


def test_estimate_join_size_sandwich(spark):
    """CMS inner-product join-size pre-flight: never undercounts the true
    join cardinality, stays within the (e/w)*Na*Nb slack, and matches the
    real join on a multiplicity-bearing pair of tables."""
    from bloomfilter_spark.plans import estimate_join_size
    # left: key k appears (k % 7) + 1 times; right: k appears (k % 3) + 1
    # times for even k only -> join size has real multiplicity products
    left = (spark.range(2000)
            .selectExpr("id % 400 AS k")
            .selectExpr("k", "explode(sequence(1, k % 7 + 1)) AS r")
            .select("k"))
    right = (spark.range(1000)
             .selectExpr("(id % 200) * 2 AS k")
             .selectExpr("k", "explode(sequence(1, k % 3 + 1)) AS r")
             .select("k"))
    exact = left.join(right, "k").count()
    est = estimate_join_size(left, right, ["k"], eps=1e-4, delta=1e-3)
    assert est.estimate >= exact
    assert est.estimate <= exact + est.upper_slack
    assert est.n_left == left.count() and est.n_right == right.count()
    # wide-sketch regime: few distinct keys -> estimate is exact
    assert est.estimate == exact


def test_estimate_join_size_distinct_keys(spark):
    """Different key names per side (the o_orderkey vs l_orderkey case)."""
    from bloomfilter_spark.plans import estimate_join_size
    a = spark.range(500).selectExpr("id AS a_key")
    b = spark.range(250).selectExpr("id * 2 AS b_key")
    est = estimate_join_size(a, b, ["a_key"], ["b_key"], eps=1e-4)
    # unique keys, half overlap: exact = 250; per-row cross-key collisions
    # can add a few, bounded by the published slack
    assert 250 <= est.estimate <= 250 + est.upper_slack


# --- Catalyst runtime bloom filter ------------------------------------------

def test_runtime_bloom_filter_injection_and_equivalence(spark, sf_dir):
    """With the thresholds opened, Catalyst must inject might_contain into
    a selective shuffle join, and the filtered join must return exactly
    the same rows as the unfiltered one."""
    from pyspark.sql import functions as F

    from bloomfilter_spark.plans import (enable_runtime_bloom_filters,
                                         has_runtime_bloom_filter)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hi = orders.where("o_totalprice > 200000").select("o_orderkey")
    saved = {k: spark.conf.get(k, None) for k in
             ["spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
              "spark.sql.optimizer.runtime.bloomFilter."
              "applicationSideScanSizeThreshold"]}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        enable_runtime_bloom_filters(spark)
        j = li.join(hi, li.l_orderkey == hi.o_orderkey)
        assert has_runtime_bloom_filter(j)
        got = j.agg(F.count("*").alias("n"),
                    F.sum("l_orderkey").alias("s")).first()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = li.join(hi, li.l_orderkey == hi.o_orderkey)
    assert not has_runtime_bloom_filter(plain)
    want = plain.agg(F.count("*").alias("n"),
                     F.sum("l_orderkey").alias("s")).first()
    assert (got["n"], got["s"]) == (want["n"], want["s"])
