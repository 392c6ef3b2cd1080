from .planning import (BloomPlan, JoinSizeEstimate, diagnose_skew,
                       enable_runtime_bloom_filters, estimate_join_size,
                       has_runtime_bloom_filter, merge_partitions_for,
                       plan_bloom, scaling_efficiency,
                       shuffle_partitions_for, suggest_salt)

__all__ = ["BloomPlan", "plan_bloom", "merge_partitions_for",
           "shuffle_partitions_for", "scaling_efficiency",
           "suggest_salt", "diagnose_skew",
           "JoinSizeEstimate", "estimate_join_size",
           "enable_runtime_bloom_filters", "has_runtime_bloom_filter"]
