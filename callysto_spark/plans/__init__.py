from callysto_spark.plans.audit import (
    physical_plan,
    pushed_filters,
    broadcast_join_count,
    exchange_count,
    codegen_stage_count,
    nondet_dual_consumption,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "broadcast_join_count",
    "exchange_count",
    "codegen_stage_count",
    "nondet_dual_consumption",
]
