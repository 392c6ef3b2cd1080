from .planning import (BloomPlan, merge_partitions_for, plan_bloom,
                       scaling_efficiency, shuffle_partitions_for)

__all__ = ["BloomPlan", "plan_bloom", "merge_partitions_for",
           "shuffle_partitions_for", "scaling_efficiency"]
