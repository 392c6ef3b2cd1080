"""Capacity / topology planning for sketch jobs at cluster scale.

Answers the questions a 1000-executor deployment has to answer before it
runs (SURVEY.md §4, §7 hard parts c/d):

- is the sized filter broadcastable, or does it need the sharded path?
- how many shards / merge partitions / shuffle partitions?
- what does the two-cluster-size scaling contract require?

Pure arithmetic — no SparkSession needed; used by the submit script and by
operators to pick defaults.
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


def scaling_efficiency(throughput_n: float, throughput_4n: float) -> float:
    """North-rule metric: efficiency = (T_4N / T_N) / 4 for a 4x resource
    increase; >= 0.8 required."""
    if throughput_n <= 0:
        return 0.0
    return (throughput_4n / throughput_n) / 4.0
