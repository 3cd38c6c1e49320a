"""Relational helper operators built purely from Catalyst primitives.

These compile to built-in physical operators (window exec, hash agg) —
no Python in the data path, so whole-stage codegen applies end-to-end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F, Window


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number.

    ``order_by`` must be a TOTAL order (include a unique tie-break column)
    for deterministic results. At scale this is a single shuffle on
    ``partition_by`` + per-partition sort — no global sort, no driver
    collection; skewed groups are handled by AQE.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def enumerate_rows(
    df: DataFrame,
    order_by: Sequence[Column] | None = None,
    out: str = "seq",
) -> DataFrame:
    """Attach a sequence number (reference D3: `enumerate()` in
    `examples/src/elastic-sink.rs:22`).

    With ``order_by``: a global row_number (total order — one range
    exchange; use only when the semantics genuinely need global
    numbering). Without: ``monotonically_increasing_id`` — unique and
    partition-monotonic with NO shuffle, the 100 TB default.
    """
    if order_by is None:
        return df.withColumn(out, F.monotonically_increasing_id())
    w = Window.orderBy(*order_by)
    return df.withColumn(out, F.row_number().over(w))


def pivot_on(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Pivot with an explicit value list.

    Always pass ``values``: without it Spark runs an extra distinct scan
    AND the output schema becomes data-dependent — both wrong at 100 TB.
    """
    return df.groupBy(*group_by).pivot(pivot_col, list(values)).agg(agg)
