from galaxy_spark.plans.audit import (
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    partition_filters,
    physical_plan,
    plan_report,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "broadcast_join_count",
    "codegen_span_count",
    "exchange_count",
    "partition_filters",
    "physical_plan",
    "plan_report",
    "pushed_filters",
    "read_schema_columns",
]
