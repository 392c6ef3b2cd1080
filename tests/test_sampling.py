"""Deterministic hash-threshold sampling (operators/sampling.py):
reproducibility, binomial accuracy, entity consistency, stratification."""

import math

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.sampling import (hash_sample,
                                                  sample_to_budget,
                                                  sample_uniform_col,
                                                  split_train_holdout,
                                                  stratified_sample)


def _binomial_ok(got: int, n: int, f: float, sigmas: float = 4.0) -> bool:
    return abs(got - n * f) <= sigmas * math.sqrt(n * f * (1 - f)) + 1


def test_hash_sample_deterministic_and_partition_invariant(spark, events):
    a = sorted(r["event_id"] for r in
               hash_sample(events, ["event_id"], 0.3).select("event_id").collect())
    b = sorted(r["event_id"] for r in
               hash_sample(events.repartition(13), ["event_id"], 0.3)
               .select("event_id").collect())
    assert a == b and len(a) > 0


def test_hash_sample_fraction_binomial(spark, events):
    n = events.count()
    for f in (0.1, 0.5, 0.9):
        got = hash_sample(events, ["event_id"], f).count()
        assert _binomial_ok(got, n, f), (f, got, n)


def test_hash_sample_nested_subsets(spark, events):
    """Thresholding one variate means smaller fractions are subsets of
    larger ones (same seed) — stable curriculum subsampling."""
    small = {r["event_id"] for r in
             hash_sample(events, ["event_id"], 0.2).select("event_id").collect()}
    big = {r["event_id"] for r in
           hash_sample(events, ["event_id"], 0.6).select("event_id").collect()}
    assert small <= big


def test_hash_sample_entity_consistency(spark, events):
    """Sampling by user_id keeps all of a user's rows or none."""
    kept = hash_sample(events.where(F.col("user_id").isNotNull()),
                       ["user_id"], 0.4)
    per_user = kept.groupBy("user_id").agg(F.count("*").alias("k")).collect()
    totals = {r["user_id"]: r["t"] for r in
              events.where(F.col("user_id").isNotNull())
              .groupBy("user_id").agg(F.count("*").alias("t")).collect()}
    for r in per_user:
        assert r["k"] == totals[r["user_id"]]


def test_hash_sample_different_seeds_independent(spark, events):
    s1 = {r["event_id"] for r in
          hash_sample(events, ["event_id"], 0.5, seed=1).select("event_id").collect()}
    s2 = {r["event_id"] for r in
          hash_sample(events, ["event_id"], 0.5, seed=2).select("event_id").collect()}
    n = events.count()
    overlap = len(s1 & s2)
    assert _binomial_ok(overlap, n, 0.25, sigmas=5.0)


def test_stratified_sample_per_stratum_fractions(spark, events):
    fracs = {"click": 0.1, "purchase": 1.0, "view": 0.5}
    out = stratified_sample(events, "event_type", fracs,
                            key_cols=["event_id"])
    got = {r["event_type"]: r["n"] for r in
           out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    tot = {r["event_type"]: r["n"] for r in
           events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got["purchase"] == tot["purchase"]          # f=1: everything
    for t, f in (("click", 0.1), ("view", 0.5)):
        assert _binomial_ok(got[t], tot[t], f), t
    # absent strata default to 0.0: dropped entirely
    assert "error" not in got


def test_stratified_sample_plan_is_broadcast_join(spark, events):
    plan = stratified_sample(events, "event_type", {"click": 0.5},
                             key_cols=["event_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_split_train_holdout_partitions_exactly(spark, events):
    ev = events.where(F.col("user_id").isNotNull())
    train, hold = split_train_holdout(ev, ["user_id"], 0.25)
    assert train.count() + hold.count() == ev.count()
    tu = {r["user_id"] for r in train.select("user_id").distinct().collect()}
    hu = {r["user_id"] for r in hold.select("user_id").distinct().collect()}
    assert not (tu & hu)


def test_hash_sample_rejects_bad_fraction(spark, events):
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(events, ["event_id"], 1.5)


def test_sample_to_budget_hits_targets(spark, events):
    """Each budgeted stratum's sampled cost lands within the published
    variance band; fraction-1 strata are kept exactly."""
    cost = F.floor(F.col("value") * 100).cast("long")
    ev = events.where(F.col("value").isNotNull()).withColumn("cost", cost)
    totals = {r["event_type"]: r["t"] for r in
              ev.groupBy("event_type").agg(F.sum("cost").alias("t")).collect()}
    budgets = {"click": totals["click"] // 2,        # downsample ~0.5
               "purchase": totals["purchase"] * 2,   # above total -> f=1
               "view": totals["view"] // 10}         # downsample ~0.1
    sampled, fracs = sample_to_budget(ev, "event_type", "cost", budgets,
                                      key_cols=["event_id"])
    assert fracs["purchase"] == 1.0
    got = {r["event_type"]: r["g"] for r in
           sampled.groupBy("event_type").agg(F.sum("cost").alias("g")).collect()}
    assert got["purchase"] == totals["purchase"]
    sq = {r["event_type"]: r["s2"] for r in
          ev.groupBy("event_type")
            .agg(F.sum(F.col("cost") * F.col("cost")).alias("s2")).collect()}
    for t in ("click", "view"):
        f = fracs[t]
        sd = math.sqrt(f * (1 - f) * sq[t])
        assert abs(got.get(t, 0) - f * totals[t]) <= 5 * sd + 1, t
    # default=1.0: unbudgeted strata pass through whole
    assert got["error"] == totals["error"]


def test_sample_to_budget_rejects_negative(spark, events):
    with pytest.raises(ValueError, match=">= 0"):
        sample_to_budget(events, "event_type", F.lit(1), {"click": -5},
                         key_cols=["event_id"])


def test_stratified_sample_non_string_strata(spark, events):
    """Integer strata join correctly (thresholds are keyed by the string
    form; df side casts)."""
    with_bucket = events.withColumn("bucket", F.col("event_id") % 3)
    out = stratified_sample(with_bucket, "bucket", {0: 1.0, 1: 0.0},
                            key_cols=["event_id"], default=0.0)
    got = {r["bucket"]: r["n"] for r in
           out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    tot = {r["bucket"]: r["n"] for r in
           with_bucket.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert got.get(0) == tot[0]       # f=1 keeps all
    assert 1 not in got and 2 not in got  # f=0 / default=0 drop all


# --- weighted reservoir sampling (Efraimidis–Spirakis A-ES) ---------------

def test_weighted_reservoir_matches_reference(spark, events):
    """Python reference: take Spark's raw xxhash64 and redo the
    open-interval shift + ln(u)/w + full-sort top-k independently; the
    operator's TakeOrdered path must agree exactly."""
    from bloomfilter_spark.operators.sampling import (
        weighted_reservoir_sample)
    ev = events.where(F.col("value").isNotNull() & (F.col("value") > 0))
    rows = ev.select("event_id", "value",
                     # seed literal cast long, matching the engine's
                     # type-stable salt (hash_col docstring)
                     F.xxhash64(F.lit(7).cast("long"),
                                "event_id").alias("h")).collect()

    def key(r):
        u32 = (r["h"] & 0xFFFFFFFFFFFFFFFF) >> 32
        return math.log((u32 + 0.5) / float(1 << 32)) / r["value"]

    keys = sorted(((key(r), r["event_id"]) for r in rows), reverse=True)
    want = sorted(eid for _, eid in keys[:25])
    got = sorted(r["event_id"] for r in
                 weighted_reservoir_sample(events, 25, "value",
                                           ["event_id"], seed=7)
                 .select("event_id").collect())
    assert got == want


def test_weighted_reservoir_partition_invariant(spark, events):
    from bloomfilter_spark.operators.sampling import (
        weighted_reservoir_sample)
    a = sorted(r["event_id"] for r in
               weighted_reservoir_sample(events, 40, "value", ["event_id"])
               .select("event_id").collect())
    b = sorted(r["event_id"] for r in
               weighted_reservoir_sample(events.repartition(13), 40,
                                         "value", ["event_id"])
               .select("event_id").collect())
    assert a == b and len(a) == 40


def test_weighted_reservoir_k1_proportional(spark):
    """k=1 A-ES inclusion probability is EXACTLY w/W (ES 2006): one heavy
    item (w=500) among 100 light (w=1) must win ~500/600 of independent
    seed replicates, within 4 sigma of Binomial(R, p)."""
    from bloomfilter_spark.operators.sampling import (
        weighted_reservoir_sample)
    rows = [(0, 500.0)] + [(i, 1.0) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, w double")
    R = 400
    # all replicates in ONE pass: broadcast the seed range, per-seed argmax
    # of the same key formula (seed cast to int matches F.lit(seed) typing)
    seeds = spark.range(R).select(F.col("id").cast("int").alias("seed"))
    j = df.crossJoin(F.broadcast(seeds))
    u32 = F.shiftrightunsigned(
        F.xxhash64(F.col("seed"), F.col("id")), 32).cast("double")
    key = F.log((u32 + F.lit(0.5)) / F.lit(float(1 << 32))) / F.col("w")
    per_seed = j.groupBy("seed").agg(F.max_by("id", key).alias("winner"))
    wins = per_seed.where(F.col("winner") == 0).count()
    p = 500.0 / 600.0
    assert abs(wins - R * p) <= 4 * math.sqrt(R * p * (1 - p)) + 1, wins
    # the inline formula agrees with the operator for a spot seed
    spot = per_seed.where(F.col("seed") == 11).first()["winner"]
    assert (weighted_reservoir_sample(df, 1, "w", ["id"], seed=11)
            .first()["id"] == spot)


def test_weighted_reservoir_edge_cases(spark):
    from bloomfilter_spark.operators.sampling import (
        weighted_reservoir_sample)
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 3.0)],
        "id long, w double")
    # non-positive / NULL weights excluded; k > n returns all eligible
    got = sorted(r["id"] for r in
                 weighted_reservoir_sample(df, 10, "w", ["id"]).collect())
    assert got == [1, 5]
    assert weighted_reservoir_sample(df, 0, "w", ["id"]).count() == 0
    with pytest.raises(ValueError, match=">= 0"):
        weighted_reservoir_sample(df, -1, "w", ["id"])


# --- grouped weighted sampling --------------------------------------------

def test_grouped_weighted_sample_counts_and_subset(spark, events):
    from bloomfilter_spark.operators.sampling import grouped_weighted_sample
    eligible = events.where(F.col("value").isNotNull() & (F.col("value") > 0)
                            & F.col("event_type").isNotNull())
    exact = {r["event_type"]: r["n"] for r in
             eligible.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    k = 7
    got = grouped_weighted_sample(events, "event_type", k, "value",
                                  ["event_id"])
    counts = {r["event_type"]: r["n"] for r in
              got.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert counts == {t: min(k, n) for t, n in exact.items()}
    # sampled rows are a subset of the eligible rows
    extra = got.join(eligible, "event_id", "left_anti").count()
    assert extra == 0


def test_grouped_weighted_sample_partition_invariant(spark, events):
    from bloomfilter_spark.operators.sampling import grouped_weighted_sample
    a = sorted(r["event_id"] for r in
               grouped_weighted_sample(events.repartition(1), "event_type",
                                       5, "value", ["event_id"]).collect())
    b = sorted(r["event_id"] for r in
               grouped_weighted_sample(events.repartition(16), "event_type",
                                       5, "value", ["event_id"]).collect())
    assert a == b and len(a) > 0


def test_grouped_weighted_sample_single_group_matches_global(spark, events):
    """With one group the per-group top-k must equal the global A-ES
    reservoir (same key, same seed)."""
    from bloomfilter_spark.operators.sampling import (
        grouped_weighted_sample, weighted_reservoir_sample)
    one = events.withColumn("g", F.lit("all"))
    a = sorted(r["event_id"] for r in
               grouped_weighted_sample(one, "g", 10, "value",
                                       ["event_id"]).collect())
    b = sorted(r["event_id"] for r in
               weighted_reservoir_sample(events, 10, "value",
                                         ["event_id"]).collect())
    assert a == b


def test_grouped_weighted_sample_plan_uses_group_limit(spark, events):
    """The rank<=k filter must push into the sort as WindowGroupLimit so
    tasks never materialize whole sorted groups."""
    from bloomfilter_spark.operators.sampling import grouped_weighted_sample
    got = grouped_weighted_sample(events, "event_type", 3, "value",
                                  ["event_id"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
