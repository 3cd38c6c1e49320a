"""Operator-internal utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_files: int | None = None) -> DataFrame:
    """Repartition when the input is a small file scan.

    Small single-file tables read as 1 partition and serialize every
    downstream narrow op; one cheap shuffle unlocks the cluster. Uses
    ``inputFiles()`` (metadata-only) rather than ``df.rdd`` (which
    builds the whole RDD plan). At real scale inputs have thousands of
    files/row-groups and this is a no-op.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    threshold = min_files if min_files is not None else max(2, target // 2)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < threshold:
        return df.repartition(target)
    return df
