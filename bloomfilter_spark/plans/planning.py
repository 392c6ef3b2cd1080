"""Capacity / topology planning for sketch jobs at cluster scale.

Answers the questions a 1000-executor deployment has to answer before it
runs (SURVEY.md §4, §7 hard parts c/d):

- is the sized filter broadcastable, or does it need the sharded path?
- how many shards / merge partitions / shuffle partitions?
- what does the two-cluster-size scaling contract require?

Pure arithmetic — no SparkSession needed (except `diagnose_skew`, which
measures a real DataFrame); used by the submit script and by operators to
pick defaults.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..config import BROADCAST_BUDGET_BYTES, DEFAULT_MERGE_PARTITIONS
from ..sizing import suggest_sizing


@dataclass
class BloomPlan:
    capacity: int
    fpr: float
    num_bits: int
    num_hashes: int
    filter_bytes: int
    broadcastable: bool
    n_shards: int            # 1 => broadcast path
    merge_partitions: int


def plan_bloom(capacity: int, fpr: float = 0.01,
               broadcast_budget: int = BROADCAST_BUDGET_BYTES,
               input_partitions: int | None = None) -> BloomPlan:
    m, k = suggest_sizing(max(capacity, 1), fpr)
    nbytes = m // 8
    broadcastable = nbytes <= broadcast_budget
    if broadcastable:
        shards = 1
    else:
        # target ~64 MiB per shard: small enough to move/deserialize per
        # task, big enough to keep shard count (and probe-shuffle fanout) low
        shards = max(2, 1 << math.ceil(math.log2(nbytes / (64 << 20))))
    merge = merge_partitions_for(input_partitions or 1024, nbytes)
    return BloomPlan(capacity, fpr, m, k, nbytes, broadcastable, shards, merge)


def merge_partitions_for(input_partitions: int, partial_bytes: int) -> int:
    """Intermediate merge width for the two-level topology: ~sqrt(P) tasks,
    clamped so no merge task ORs more than ~4 GiB of partials."""
    width = max(DEFAULT_MERGE_PARTITIONS, int(math.sqrt(input_partitions)))
    max_per_task = max(1, (4 << 30) // max(partial_bytes, 1))
    min_width = -(-input_partitions // max_per_task)
    return max(width, min_width)


def shuffle_partitions_for(input_bytes: int, target_partition_bytes: int = 128 << 20,
                           min_partitions: int = 32) -> int:
    """spark.sql.shuffle.partitions sizing: keep post-shuffle partitions
    near the target so they fit executor memory at any input scale."""
    return max(min_partitions, -(-input_bytes // target_partition_bytes))


def suggest_salt(top_share: float, partitions: int,
                 max_salt: int | None = None) -> int:
    """Salt factor for a grouped shuffle given the hottest key's share of
    all rows: enough splits that the hot key's largest slice is no bigger
    than a fair partition (share/salt <= 1/partitions), clamped to
    [1, max_salt or partitions]. share=0.3 on 32 partitions -> 10."""
    if not (0.0 <= top_share <= 1.0):
        raise ValueError("top_share must be in [0, 1]")
    cap = max_salt or partitions
    return min(cap, max(1, math.ceil(top_share * partitions)))


def diagnose_skew(df, key_cols, partitions: int | None = None):
    """Measure key skew with one map-side-combined pass and recommend a
    salt factor: returns (top_key_tuple, top_share, suggested_salt).

    The measurement is `groupBy(keys).count()` + ordered limit — the
    shuffle carries one row per DISTINCT key (partial aggregation), so
    the diagnosis itself is safe on the very distribution it diagnoses.
    Feed the result to `agg.grouped_sketch_table(salt=...)` or any salted
    repartition. One Spark job; run it on a sample for quick checks.
    """
    from pyspark.sql import functions as F
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("__n"))
    row = counts.agg(
        F.sum("__n").alias("__total"),
        F.max(F.struct(F.col("__n"), *[F.col(k) for k in keys]))
         .alias("__top")).first()
    if row["__total"] is None:
        return None, 0.0, 1
    top, total = row["__top"], row["__total"]
    share = top["__n"] / total
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    return tuple(top[k] for k in keys), share, suggest_salt(share, parts)


@dataclass
class JoinSizeEstimate:
    estimate: int          # never undercounts the true join cardinality
    upper_slack: float     # est <= exact + upper_slack w.p. >= 1 - exp(-depth)
    n_left: int
    n_right: int

    @property
    def upper_bound(self) -> float:
        return self.estimate + self.upper_slack


def estimate_join_size(df_left, df_right, keys_left, keys_right=None,
                       eps: float = 1e-4, delta: float = 1e-3,
                       seed: int | None = None) -> JoinSizeEstimate:
    """Sketch-driven join-cardinality estimate BEFORE running the join:
    CMS inner product (Cormode & Muthukrishnan 2005, Thm 3) of the two
    sides' key-frequency vectors — sum_k f_L(k)*f_R(k) is exactly
    |L JOIN R| on equal keys.

    Cost: two JVM-reduced CMS builds (one scan per side, <= depth*width
    counter cells over the Arrow pipe each — `jvm_build.cms_build_jvm`);
    nothing is joined, shuffled by key, or collected beyond O(d*w) cells.
    At 100 TB this is the cheap pre-flight that decides broadcast vs
    sort-merge vs sharded strategy and sizes shuffle partitions
    (`shuffle_partitions_for(est_rows * row_bytes)`) before committing to
    a plan — the same role theta sketches play for DISTINCT overlap.

    Guarantees (deterministic same-seed builds, asserted in tests and q64):
    exact <= estimate, and estimate <= exact + (e/width)*|L|*|R| with
    probability >= 1 - delta.
    """
    from ..config import DEFAULT_SEED
    from ..jvm_build import cms_build_jvm
    if seed is None:
        seed = DEFAULT_SEED
    keys_right = keys_right or keys_left
    left = cms_build_jvm(df_left, keys_left, eps=eps, delta=delta, seed=seed)
    right = cms_build_jvm(df_right, keys_right, eps=eps, delta=delta,
                          seed=seed)
    return JoinSizeEstimate(estimate=left.inner_product(right),
                            upper_slack=left.inner_product_bound(right),
                            n_left=left.total, n_right=right.total)


def scaling_efficiency(throughput_n: float, throughput_4n: float) -> float:
    """North-rule metric: efficiency = (T_4N / T_N) / 4 for a 4x resource
    increase; >= 0.8 required."""
    if throughput_n <= 0:
        return 0.0
    return (throughput_4n / throughput_n) / 4.0


def enable_runtime_bloom_filters(spark, creation_side_threshold: str = "100MB",
                                 application_side_scan_threshold: str = "0",
                                 expected_num_items: int | None = None):
    """Turn Catalyst's own injected runtime Bloom-filter semi-join
    reduction all the way on for the current session — the in-plan,
    per-query complement to this library's EXPLICIT Bloom operators.

    Spark (3.3+) already plants `bloom_filter_agg` on a selective build
    side and `might_contain` on the probe side of a shuffle join when the
    size thresholds allow (`InjectRuntimeFilter`); the defaults are
    conservative (build side <= 10MB, probe scan >= 10GB), so on
    mid-sized inputs the rewrite silently never fires. This helper raises
    the build ceiling and drops the probe floor so shuffle joins get the
    reduction.

    Division of labor, documented for planning: Catalyst's runtime filter
    is ephemeral (rebuilt per query, capped by
    `runtime.bloomFilter.max.numBits`) and only fires inside one join; the
    library's `bloom_semi_join` / sharded filters / file indexes persist,
    merge across jobs/streams, shard beyond one executor's memory, and
    feed non-join probes (membership scoring, file pruning). Use
    Catalyst's for ad-hoc joins; use the library's when the filter itself
    is a reusable artifact. Returns the dict of conf keys set, so callers
    can restore them."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            creation_side_threshold,
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": application_side_scan_threshold,
    }
    if expected_num_items is not None:
        confs["spark.sql.optimizer.runtime.bloomFilter.expectedNumItems"] = \
            str(int(expected_num_items))
    for k, v in confs.items():
        spark.conf.set(k, v)
    return confs


def has_runtime_bloom_filter(df) -> bool:
    """True when Catalyst injected a runtime Bloom filter into this
    DataFrame's optimized plan (`might_contain` probe over a
    `bloom_filter_agg` subquery) — the plan-property check scale tests
    assert, mirroring layout.has_exchange."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "might_contain" in plan
