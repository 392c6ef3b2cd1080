from .planning import (BloomPlan, JoinSizeEstimate, diagnose_skew,
                       estimate_join_size, merge_partitions_for,
                       plan_bloom, scaling_efficiency,
                       shuffle_partitions_for, suggest_salt)

__all__ = ["BloomPlan", "plan_bloom", "merge_partitions_for",
           "shuffle_partitions_for", "scaling_efficiency",
           "suggest_salt", "diagnose_skew",
           "JoinSizeEstimate", "estimate_join_size"]
