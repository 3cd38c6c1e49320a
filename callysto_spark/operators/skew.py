"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join splitting handles most skew at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on by default in our session);
explicit salting remains the tool for (a) skewed AGGREGATIONS (AQE does
not split agg keys) and (b) joins where one key dominates so heavily
that even split partitions overwhelm a task. Both operators here are
semantics-preserving rewrites.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(df: DataFrame, keys: Sequence[str], salt: int = 16) -> DataFrame:
    """Two-phase count for skewed group keys: count by (key, salt) —
    spreading a hot key over ``salt`` reducers — then re-aggregate by
    key. Identical result to ``groupBy(keys).count()``."""
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("count"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicated-salted join for a hot LEFT key against a small-ish
    right side: left rows get a random salt in [0, salt); the right side
    is replicated ``salt`` times, so each (key, salt) bucket is 1/salt
    of the hot key. Use when the right side is too big to broadcast but
    small enough to replicate; otherwise rely on AQE skew-join.

    Only left-preserving modes are semantics-preserving: the replicated
    right side would emit ``salt`` copies of every non-matched right row
    under right/full outer joins.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not semantics-preserving with a "
            f"replicated right side; use one of {sorted(allowed)}"
        )
    lsalted = left.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    rrepl = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = lsalted.join(rrepl, [key, "__salt"], how)
    return out.drop("__salt")
