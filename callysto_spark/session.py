"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
config block is what we would ship to a 1000-executor cluster — AQE on
(runtime coalescing + skew-join splitting), UTC session time, Arrow for
the Python boundary, and shuffle partitions sized to the parallelism at
hand rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "callysto-spark",
    master: str | None = None,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster ``master`` comes from spark-submit; locally we run
    ``local[N]``. Every conf here is also correct for cluster mode.
    """
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Parallelism: shuffle partitions ~ cores locally. On a cluster AQE
        # coalesces from a high initial number; keep both knobs explicit.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow batches for every pandas_udf / toPandas crossing.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dim tables (nation/region/supplier at any SF; part/customer at
        # test SFs) should broadcast; 64 MB covers them without risking
        # driver OOM at 100 TB fact scale.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Driver testdata writes TIMESTAMP(NANOS) parquet, which Spark's
        # reader rejects; read ns as long (callysto_spark.tables.load
        # converts back to µs timestamps).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferWindowGroupLimit skips row_number()<=k filters with
        # k above this threshold (default 1000); the bounded top-k
        # sketches (operators/sketches.py) use k up to a few thousand
        # and depend on the map-side prune, so raise it well past any
        # sketch size while still far below a partition's row count.
        .config("spark.sql.optimizer.windowGroupLimitThreshold", str(64 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
