"""Relational coverage, batch 4: the remaining classic TPC-H query
shapes expressible on this schema — national market share (Q8),
multi-dim profit rollup (Q9), outer-join count distribution (Q13),
max-equality view join (Q15), correlated-min selection (Q2), and
double-correlated EXISTS/NOT EXISTS (Q21).

(The testdata has no partsupp table, so Q2/Q9/Q11-style queries are
re-grounded on lineitem prices — same plan shapes, same operator
exercise: correlated aggregates, conditional shares, multi-way joins.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from callysto_spark.functions import fixed_sum
from callysto_spark.queries import register
from callysto_spark.tables import load


def REV():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q8_market_share",
    oracle="""
WITH base AS (
  SELECT extract(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'EUROPE'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       MSUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END) AS nation_volume,
       MSUM(volume) AS total_volume,
       MSUM(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END)
         / MSUM(volume) AS mkt_share
FROM base GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's share of a region's yearly
    order volume — conditional share of a sum, 6-table join with every
    dimension broadcast. The share divides two order-independent
    scaled-integer sums, so it is bit-deterministic unrounded."""
    t = load(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region")
    cn = t["nation"].select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    sn = t["nation"].select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_7", REV()).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("crk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            fixed_sum(nation_vol).alias("nation_volume"),
            fixed_sum(REV()).alias("total_volume"),
            (fixed_sum(nation_vol) / fixed_sum(REV())).alias("mkt_share"),
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
SELECT n_name AS nation, extract(year FROM o_orderdate) AS o_year,
       MSUM(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity) AS profit,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a retail-price cost proxy —
    no partsupp table at this SF) by supplier nation and order year,
    with a LIKE-filtered part dimension."""
    t = load(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    profit = REV() - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(fixed_sum(profit).alias("profit"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two stacked aggregations over a filtered LEFT
    OUTER join — order-count histogram including zero-order customers
    (count(col) skips the nulls the outer join introduces)."""
    t = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, MSUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — a
    reused CTE joined against its own max (scalar subquery stays
    in-plan via broadcast cross join; equality on revenue is safe
    because fixed_sum is exact at 1-cent resolution)."""
    t = load(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(fixed_sum(REV()).alias("total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("_best"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("_best"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q2_cheapest_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey AS pk, l_suppkey AS sk, min(l_extendedprice) AS best_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_name, s_name, best_price
FROM offers
JOIN part ON pk = p_partkey
JOIN supplier ON sk = s_suppkey
WHERE p_type = 'SMALL'
  AND best_price = (SELECT min(best_price) FROM offers o2 WHERE o2.pk = offers.pk)
ORDER BY p_partkey, s_name
LIMIT 100
""",
)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated-min subquery — for each (small)
    part, the supplier(s) offering its minimum observed price. The
    correlation compiles to ONE window min over the part key on the
    already-aggregated offers (no re-join of the subquery), then a
    filter — the plan Catalyst can't always derive from EXISTS SQL.
    min() is order-independent ⇒ exact equality is deterministic."""
    t = load(spark, sf_dir, "lineitem", "part", "supplier")
    offers = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min("l_extendedprice").alias("best_price"))
    )
    w = Window.partitionBy("pk")
    return (
        offers.withColumn("_part_min", F.min("best_price").over(w))
        .filter(F.col("best_price") == F.col("_part_min"))
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "SMALL").select("p_partkey", "p_name")),
            F.col("pk") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")), F.col("sk") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "best_price")
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey, MSUM(l_extendedprice * (1 - l_discount)) AS part_value
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT MSUM(l_extendedprice * (1 - l_discount)) AS total_value FROM lineitem)
SELECT l_partkey, part_value
FROM pv CROSS JOIN tot
WHERE part_value > 0.0005 * total_value
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a FRACTION of the
    global total (HAVING sum > k·total). The global total is a 1-row
    aggregate broadcast-crossed onto the per-part aggregate — in-plan,
    no driver round-trip; both sums are exact scaled integers so the
    threshold compare is deterministic."""
    t = load(spark, sf_dir, "lineitem")
    pv = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(fixed_sum(REV()).alias("part_value"))
    )
    tot = t["lineitem"].agg(fixed_sum(REV()).alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.lit(0.0005) * F.col("total_value"))
        .select("l_partkey", "part_value")
    )


@register(
    "customer_balance_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment,
       percent_rank() OVER w AS bal_pct_rank,
       cume_dist() OVER w AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal NULLS FIRST, c_custkey)
""",
)
def customer_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank, cume_dist) per
    segment: (rank-1)/(n-1) and rank/n are int/int divisions of
    identical ranks ⇒ bit-deterministic with the custkey tie-break."""
    c = load(spark, sf_dir, "customer")["customer"]
    # NULLS FIRST explicitly on BOTH sides: Spark's ascending default,
    # but DuckDB defaults NULLS LAST — a NULL balance would otherwise
    # shift every percent_rank/cume_dist in the segment differently
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_first(), F.col("c_custkey").asc_nulls_first()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    AND l_suppkey IS NOT NULL
),
members AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_suppkey IS NOT NULL)
SELECT s_name, count(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM members m2
              WHERE m2.l_orderkey = l1.l_orderkey AND m2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on
    multi-supplier orders ('late' = shipped >90 days after the order —
    this schema carries no commit/receipt dates).

    The double-correlated EXISTS / NOT EXISTS decorrelates to COUNTS
    over distinct (order, supplier) pairs: NOT EXISTS(other late
    supplier) ⟺ the order has exactly one late supplier; EXISTS(other
    member) ⟺ the order has ≥2 distinct suppliers. That computes the
    expensive lineitem⨝orders 'late' set ONCE (the naive semi+anti
    form re-derives it for the anti side) and replaces both
    inequality joins with a window count riding the join's orderkey
    partitioning plus one aggregate semi join.
    """
    from pyspark.sql import Window

    t = load(spark, sf_dir, "lineitem", "orders", "supplier")
    # NULL-supplier lineitems can't witness EITHER correlated predicate
    # (NULL <> x is never true), but a (order, NULL) pair WOULD inflate
    # the decorrelated per-order counts — excluding them up front is
    # exactly the EXISTS semantics, stated once on both engines
    li = t["lineitem"].filter(F.col("l_suppkey").isNotNull())
    late = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # late is distinct pairs ⇒ count per order = distinct late suppliers;
    # the window reuses the l_orderkey hash partitioning already in place
    sole_late = (
        late.withColumn("__n_late", F.count("*").over(Window.partitionBy("l_orderkey")))
        .filter(F.col("__n_late") == 1)
        .drop("__n_late")
    )
    multi_supplier_orders = (
        li.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__n_supp"))
        .filter(F.col("__n_supp") >= 2)
        .select("l_orderkey")
    )
    waiting = sole_late.join(multi_supplier_orders, "l_orderkey", "left_semi")
    return (
        waiting.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )
