"""Physical-plan audit helpers.

The 100 TB contract is a plan-shape contract: filters reach the parquet
scan, constant-size dims broadcast, shuffles are counted and justified,
the hot path stays inside whole-stage codegen. These helpers extract
those properties from ``explain()`` output so tests can pin them —
a regression that un-broadcasts a dim join or drops a pushed filter
fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists in the scan nodes (empty strings removed)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages (simple-mode `*(n)` markers).

    Under AQE the pre-execution plan carries no codegen markers
    (isFinalPlan=false); execute once so the final plan is inspectable.
    """
    plan = physical_plan(df, mode="simple")
    if "isFinalPlan=false" in plan:
        df.collect()
        plan = physical_plan(df, mode="simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
