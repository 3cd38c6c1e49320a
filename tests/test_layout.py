"""Storage layout: partition pruning + bucketed join without shuffle —
the plan-level proof of the 100 TB layout story."""

from __future__ import annotations

from pyspark.sql import functions as F

from callysto_spark.operators.layout import bucketed_table, partitioned_write
from callysto_spark.plans import exchange_count, physical_plan
from callysto_spark.tables import load


def test_partition_pruning(spark, tmp_path, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    out = str(tmp_path / "orders_by_status")
    partitioned_write(o, out, ["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = physical_plan(back)
    # the predicate lands in PartitionFilters → directory pruning, no IO
    # on other partitions
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:800]
    assert back.count() == spark.read.parquet(out).filter("o_orderstatus = 'F'").count()


def test_bucketed_join_no_shuffle(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    bucketed_table(t["orders"].select("o_orderkey", "o_custkey", "o_totalprice"), "b_orders", ["o_custkey"], 8)
    bucketed_table(t["customer"].select("c_custkey", "c_mktsegment"), "b_customer", ["c_custkey"], 8)
    bo, bc = spark.table("b_orders"), spark.table("b_customer")
    joined = bo.join(bc.hint("merge"), bo.o_custkey == bc.c_custkey)
    # co-bucketed sort-merge join: no Exchange on either side
    assert exchange_count(joined) == 0, physical_plan(joined)[:800]
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
