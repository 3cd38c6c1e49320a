"""Salting operators preserve semantics (skew story, operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from callysto_spark.operators.skew import salted_count, salted_join
from callysto_spark.tables import load


def test_salted_count_equals_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    plain = {
        (r["l_returnflag"],): r["count"]
        for r in li.groupBy("l_returnflag").count().collect()
    }
    salted = {
        (r["l_returnflag"],): r["count"]
        for r in salted_count(li, ["l_returnflag"], salt=16).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    o = t["orders"].select(F.col("o_custkey").alias("custkey"), "o_orderkey")
    c = t["customer"].select(F.col("c_custkey").alias("custkey"), "c_mktsegment")
    plain = sorted(
        (r["o_orderkey"], r["c_mktsegment"]) for r in o.join(c, "custkey").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in salted_join(o, c, "custkey", salt=4).collect()
    )
    assert plain == salted


def test_salted_join_rejects_outer_modes(spark, sf_dir):
    """Replicated right side is NOT semantics-preserving for right/full
    outer joins (non-matched right rows would appear salt times)."""
    import pytest

    t = load(spark, sf_dir, "orders", "customer")
    o = t["orders"].select(F.col("o_custkey").alias("custkey"))
    c = t["customer"].select(F.col("c_custkey").alias("custkey"))
    for how in ("full", "right", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="not semantics-preserving"):
            salted_join(o, c, "custkey", salt=4, how=how)


def test_aqe_skew_join_split_triggers(spark):
    """The skew story is config + AQE: prove the configured runtime
    actually SPLITS a skewed join partition, not just that the flag is
    set. Plant one dominant join key (≫ every other partition), lower
    the split thresholds to test scale, run a sort-merge join, and pin
    the 'skew=true' / skewed-AQEShuffleRead markers in the final
    adaptive plan."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # 100k rows of key 0 vs a uniform tail: the key-0 partition is
        # orders of magnitude above every advisory-sized neighbor
        left = spark.range(120_000).select(
            F.when(F.col("id") < 100_000, F.lit(0)).otherwise(F.pmod("id", F.lit(500))).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(500).select(
            F.col("id").alias("k"),
            F.col("id").alias("rv"),
        )
        joined = left.join(right, "k")
        # drive THIS DataFrame's own QueryExecution (a write/count spawns
        # a separate one whose adaptive plan we couldn't inspect)
        n = len(joined.collect())
        assert n == 120_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "skewed" in plan, (
            f"AQE skew split did not trigger:\n{plan}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
