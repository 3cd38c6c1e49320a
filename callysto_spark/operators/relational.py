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


def _idiv(a: Column, b: Column) -> Column:
    """Exact integral division on long columns (no `div` builtin in the
    Python API; (a - a%b)/b is IEEE-exact for quotients < 2^53)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    _keep_total: bool = False,
) -> DataFrame:
    """Global 1-based row_number over a total order WITHOUT funneling the
    data through one task.

    A bare ``Window.orderBy(...)`` plans ``Exchange SinglePartition`` —
    every row through a single reducer, the classic scale-killer. Here:

    1. ``repartitionByRange`` on the order keys (partition i holds keys
       entirely before partition i+1's),
    2. partition-local ``row_number`` keyed on ``spark_partition_id()``
       (materialized as a column BELOW the window's hash exchange;
       nondeterministic, so Catalyst cannot push it around),
    3. per-partition row counts → cumulative offsets, computed in-plan
       (the only global window runs over ~num_partitions rows — bounded
       by cluster width, not data size) and broadcast-joined back.

    ``order_by`` must be a total order for deterministic ranks.

    The ranged table is persisted (transient, released at the next
    registry-query boundary) because BOTH consumers below — the local
    row_number and the per-partition counts — must observe the SAME
    partitioning. Without the persist each branch compiles its own
    range exchange, and repartitionByRange's boundary SAMPLING is not
    stable across executions when the upstream's intra-partition row
    order varies (hash-aggregate iteration order does): the sf1
    oracle run caught offsets computed against different boundaries
    than the local numbering — ~8% of ntile assignments off by one
    bucket, varying run to run. One materialization pins boundaries
    and halves the scans; the persisted set is whatever the caller
    ranks (typically an aggregate, not the raw fact table).
    """
    from callysto_spark.operators.util import transient_persist

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = transient_persist(
        df.repartitionByRange(n, *order_by).withColumn("__pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    local = ranged.withColumn("__lrn", F.row_number().over(w_local))
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )
    out = (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )
    return out if _keep_total else out.drop("__total")


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n_buckets: int,
    out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n)`` over a global order with no single-partition window —
    exact ntile semantics (first ``N mod n`` buckets one row larger),
    derived arithmetically from :func:`global_rank`.
    """
    ranked = global_rank(
        df, order_by, rank_col="__grank", num_partitions=num_partitions, _keep_total=True
    )
    r = F.col("__grank")
    total = F.col("__total")
    k = F.lit(n_buckets).cast("long")
    q = _idiv(total, k)
    rem = F.pmod(total, k)
    big_span = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    bucket = (
        F.when(r <= big_span, _idiv(r - 1, q + 1) + 1)
        .otherwise(rem + _idiv(r - 1 - big_span, q) + 1)
        .cast("int")
    )
    return ranked.withColumn(out, bucket).drop("__grank", "__total")


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
