"""Plan inspection & scale-property assertions (SURVEY.md §4, §6).

The reference's performance model reduces to measurable plan properties
(BASELINE.md): point lookups prune partitions (P3), counts are metadata-only
(P5), projections prune Parquet columns (P1). These helpers read the
physical plan so tests and operators can ASSERT those properties instead of
hoping — the 100 TB failure mode is a plan that silently stopped pruning.
"""

from heparchy_spark.plans.inspect import (
    executed_plan,
    has_broadcast_join,
    has_partition_filters,
    physical_plan,
    pushed_filters,
    scan_columns,
    shuffle_count,
    wholestage_codegen_ids,
)

__all__ = [
    "physical_plan",
    "executed_plan",
    "scan_columns",
    "pushed_filters",
    "has_partition_filters",
    "has_broadcast_join",
    "shuffle_count",
    "wholestage_codegen_ids",
]
