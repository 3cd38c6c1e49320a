"""Storage-layout operators: partitioned and bucketed writes.

At 100 TB the dominant costs are scan width and join shuffles; layout is
the lever: partition pruning eliminates files, bucketing eliminates the
shuffle for joins/aggs on the bucket key (reference analog: callysto
co-partitions state with the source topic's partitions,
`types/table.rs:161-214` — bucketing is the batch-storage expression of
the same idea).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet: predicates on the partition
    columns prune directories before any IO. Keep partition columns
    low-cardinality (date/hour/category) — small-file explosion is the
    failure mode."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write df as a bucketed managed table: joins/aggregations on the
    bucket key between co-bucketed tables run with ZERO exchange (see
    tests/test_layout.py for the plan proof)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
