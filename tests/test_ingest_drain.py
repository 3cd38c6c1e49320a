"""bench.batch_drain_bytes — the per-micro-batch ingest drain (r16).

The r16 default drain replaced the legacy per-batch ``agg().collect()``
with a noop-sink write whose byte count rides an ``Observation`` on the
same job (verdict item 7). The committed ingest MB/s figures divide by
whatever this function returns, so the two drains must count IDENTICAL
bytes — on real batches, on batches with nulls, and on the empty batch
(a trial's trailing trigger can be empty).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def test_drains_agree_and_match_ground_truth(spark):
    # varying-length payloads like the real corpus (repeated-block text)
    df = (
        spark.range(500)
        .select(
            F.col("id").alias("key"),
            F.repeat(
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("salt")), 256),
                (F.col("id") % 7 + 1).cast("int"),
            ).alias("value"),
        )
    )
    expected = df.select(F.sum(F.length("value"))).collect()[0][0]
    assert expected > 0
    got_observe = bench.batch_drain_bytes(df, "observe")
    got_legacy = bench.batch_drain_bytes(df, "legacy")
    assert got_observe == got_legacy == expected


def test_drains_agree_with_null_values(spark):
    df = spark.range(100).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(F.lit("x" * 64)).alias("value"),
    )
    expected = df.select(F.sum(F.length("value"))).collect()[0][0]
    assert bench.batch_drain_bytes(df, "observe") == expected
    assert bench.batch_drain_bytes(df, "legacy") == expected


def test_empty_batch_counts_zero_under_both_drains(spark):
    df = (
        spark.range(1)
        .select(F.col("id").alias("key"), F.lit("x").alias("value"))
        .where(F.lit(False))
    )
    assert bench.batch_drain_bytes(df, "observe") == 0
    assert bench.batch_drain_bytes(df, "legacy") == 0
