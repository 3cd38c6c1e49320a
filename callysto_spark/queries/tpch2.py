"""Relational coverage, batch 2: outer joins, correlated/scalar
subqueries (TPC-H Q4/Q17/Q18 shapes), having + join-back, multi-predicate
OR joins (Q19 shape), window frames (RANGE BETWEEN, first/last/nth),
exact interpolated percentiles, null handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from callysto_spark.functions import fixed_sum, rnd
from callysto_spark.queries import register
from callysto_spark.tables import load


def REV():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "left_join_customer_orders",
    oracle="""
SELECT c_custkey, c_mktsegment,
       count(o_orderkey) AS n_orders,
       coalesce(MSUM(o_totalprice), 0.0) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
""",
)
def left_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null-aware aggregates (count skips nulls,
    coalesce fills the no-order customers)."""
    t = load(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(fixed_sum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


@register(
    "full_outer_nation_activity",
    oracle="""
WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(cn.nk, sn.nk) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with coalesced keys."""
    t = load(spark, sf_dir, "customer", "supplier")
    cn = t["customer"].groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    sn = t["supplier"].groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    # shuffle_hash hint (r15): both sides are per-nation aggregates —
    # bounded by the fixed 25-row nation dimension at ANY scale — but
    # full_outer cannot broadcast and otherwise plans as SortMergeJoin,
    # sorting both tiny sides. SHJ drops the two sorts (guide §3.1);
    # the aggregates' output partitioning already feeds the join, so
    # exchange count is unchanged.
    return (
        cn.join(sn.hint("shuffle_hash"), cn.nk == sn.nk, "full_outer")
        .select(
            F.coalesce(cn.nk, sn.nk).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "q4_priority_with_discounted_lines",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
GROUP BY o_orderpriority
""",
)
def q4_priority_with_discounted_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join."""
    t = load(spark, sf_dir, "orders", "lineitem")
    disc = t["lineitem"].filter(F.col("l_discount") > 0.08).select("l_orderkey")
    return (
        t["orders"]
        .join(disc, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS pk, avg(l_quantity) AS aq FROM lineitem GROUP BY 1
)
SELECT MSUM(l_extendedprice) AS total_price, count(*) AS n_lines
FROM lineitem JOIN avg_qty ON l_partkey = pk
WHERE l_quantity < 0.5 * aq
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-key scalar aggregate joined back (correlated
    scalar subquery, decorrelated into agg + join — one shuffle)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(F.avg("l_quantity").alias("aq"))
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(fixed_sum("l_extendedprice").alias("total_price"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS ok, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
)
SELECT o_orderkey, o_custkey, o_orderdate, total_qty
FROM orders JOIN big ON o_orderkey = ok
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-having then join back to the dim row.
    total_qty sums integral doubles — exact, unrounded."""
    t = load(spark, sf_dir, "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("ok"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty")
    )


@register(
    "q19_bracket_revenue",
    oracle="""
SELECT MSUM(l_extendedprice * (1 - l_discount)) AS revenue, count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_type = 'PROMO' AND p_size <= 15 AND l_quantity >= 20)
""",
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-bracket predicate over a join —
    Catalyst extracts the common l/p conjuncts and keeps one join."""
    t = load(spark, sf_dir, "lineitem", "part")
    j = t["lineitem"].join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "PROMO") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 20))
    )
    return j.filter(cond).agg(
        fixed_sum(REV()).alias("revenue"), F.count(F.lit(1)).alias("n")
    )


@register(
    "scalar_subquery_vs_max",
    oracle="""
SELECT o_orderkey, o_totalprice,
       round(o_totalprice / (SELECT max(o_totalprice) FROM orders), 6) AS frac_of_max
FROM orders
WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
""",
)
def scalar_subquery_vs_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (global max) used in projection and
    filter — via the SQL surface so Catalyst plans the subquery reuse."""
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               floor(o_totalprice / (SELECT max(o_totalprice) FROM orders) * 1e6 + 0.5) / 1e6
                 AS frac_of_max
        FROM orders
        WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
        """
    )


@register(
    "suppliers_many_parts",
    oracle="""
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_suppkey
HAVING count(DISTINCT l_partkey) > 50
""",
)
def suppliers_many_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over a distinct aggregate (TPC-H Q20 flavor)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
        .filter(F.col("n_parts") > 50)
    )


@register(
    "orders_price_range_frame",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice NULLS FIRST
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_within_1000,
       first_value(o_orderkey) OVER w AS cheapest_key,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def orders_price_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: RANGE BETWEEN value offsets + first/nth_value over
    an unbounded rows frame (total order via o_orderkey tie-break)."""
    o = load(spark, sf_dir, "orders")["orders"]
    # NULLS FIRST pinned explicitly on BOTH sides (Spark's ascending
    # default vs DuckDB's NULLS LAST): without it a NULL price makes
    # first_value/nth_value pick different keys per engine
    w_range = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").asc_nulls_first())
        .rangeBetween(-1000, 1000)
    )
    w_full = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").asc_nulls_first(), F.col("o_orderkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w_range).alias("n_within_1000"),
        F.first("o_orderkey").over(w_full).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    )


@register(
    "price_quartiles_by_segment",
    oracle="""
SELECT c_mktsegment,
       round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
       round(quantile_cont(o_totalprice, 0.90), 6) AS p90
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def price_quartiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile ≡ quantile_cont: both
    use the (n−1)·p linear-interpolation definition)."""
    t = load(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return j.groupBy("c_mktsegment").agg(
        rnd(F.percentile("o_totalprice", 0.25), 6).alias("p25"),
        rnd(F.percentile("o_totalprice", 0.50), 6).alias("p50"),
        rnd(F.percentile("o_totalprice", 0.75), 6).alias("p75"),
        rnd(F.percentile("o_totalprice", 0.90), 6).alias("p90"),
    )


@register(
    "null_handling_funcs",
    oracle="""
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_filled,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS pos_bal,
       greatest(round(c_acctbal, 2), 0.0) AS bal_floor0,
       least(round(c_acctbal, 2), 1000.0) AS bal_cap1000
FROM customer
""",
)
def null_handling_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar functions: nullif/coalesce/case-null/
    greatest/least."""
    c = load(spark, sf_dir, "customer")["customer"]
    bal = rnd(F.col("c_acctbal"), 2)
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg_filled"),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")).otherwise(bal).alias("pos_bal"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1000"),
    )
