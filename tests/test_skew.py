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
