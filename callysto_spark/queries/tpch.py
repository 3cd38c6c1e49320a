"""Relational operator coverage on the TPC-H-ish star schema
(SURVEY.md §2.5): scans, filters, multi-way joins (broadcast + shuffle,
semi/anti), hash aggregation, rollup/cube/grouping sets, window
functions, top-k, set ops, pivot, scalar string/date/case functions.

Determinism: see callysto_spark.queries docstring — float aggregates are
rounded on both sides; integral-valued double sums (l_quantity) are
exact in IEEE regardless of order and stay unrounded; every top-k has a
unique-key tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from callysto_spark.operators import top_k_per_group, pivot_on
from callysto_spark.operators.sketches import kmv_distinct, kmv_distinct_sql
from callysto_spark.functions import fixed_sum, rnd
from callysto_spark.queries import register
from callysto_spark.tables import load

def REV():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                        AS sum_qty,
       MSUM(l_extendedprice)                                  AS sum_base_price,
       MSUM(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
       MSUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       sum(l_quantity) / count(*)                             AS avg_qty,
       MSUM(l_extendedprice) / count(*)                       AS avg_price,
       FSUM(l_discount, 1000000) / count(*)                   AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash-agg (8 aggregates). Filter pushes
    to the parquet scan; partial aggregation is map-side (6 groups)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            fixed_sum("l_extendedprice").alias("sum_base_price"),
            fixed_sum(REV()).alias("sum_disc_price"),
            fixed_sum(REV() * (1 + F.col("l_tax"))).alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (fixed_sum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"),
            (fixed_sum("l_discount", 1_000_000) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       MSUM(l_extendedprice * (1 - l_discount)) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-10.
    customer side is small after the segment filter → broadcast."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .join(
            t["orders"].filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fixed_sum(REV()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_supplier_volume",
    oracle="""
SELECT n_name, MSUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    bench=True,
)
def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. nation/region/supplier broadcast
    (constant-size dims at any SF); orders⨝lineitem is the one real
    shuffle, pre-filtered by the pushed-down date predicate."""
    t = load(spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem")
    asia_nations = (
        t["nation"]
        .join(t["region"].filter(F.col("r_name") == "ASIA"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    sup = t["supplier"].join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "n_name"
    )
    ord_f = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(fixed_sum(REV()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT MSUM(l_extendedprice * l_discount) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg; every predicate pushes to parquet."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        fixed_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: one shuffle on the group key, rank, filter."""
    o = load(spark, sf_dir, "orders")["orders"]
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
        keep_rank=True,
    )


@register(
    "supplier_daily_running",
    oracle="""
WITH daily AS (
  SELECT l_suppkey, CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
         sum(l_quantity) AS qty,
         MSUM(l_extendedprice * (1 - l_discount)) AS revenue
  FROM lineitem
  WHERE l_shipdate IS NOT NULL
  GROUP BY 1, 2
)
SELECT l_suppkey, day, qty, revenue,
       sum(qty)  OVER (PARTITION BY l_suppkey ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
       lag(qty)  OVER (PARTITION BY l_suppkey ORDER BY day) AS prev_qty,
       lead(qty) OVER (PARTITION BY l_suppkey ORDER BY day) AS next_qty
FROM daily
""",
    bench=True,
)
def supplier_daily_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: running sum + lag/lead over a pre-aggregated
    daily series, in ONE exchange: hash(l_suppkey) satisfies both the
    agg's (l_suppkey, day) clustering and the window's partitioning, so
    repartitioning the scan by supplier up front replaces the usual
    partial-agg exchange + window exchange pair. Right for THIS data
    distribution: TPC-H has <1 lineitem per supplier-day, so partial
    aggregation reduces almost nothing and shuffling raw rows once
    moves less data than shuffling near-raw aggregates twice — measured
    0.80s vs 0.93s at sf0.1, and the ratio holds at scale because the
    rows-per-group constant is scale-invariant. (A workload with many
    rows per group wants the default partial-agg shape instead.)
    running_qty sums integral doubles — exact in IEEE, no rounding;
    fixed_sum is order-independent, so the result is repartition-proof."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    # a NULL ship date has no place on the daily time axis (same
    # contract as the window()-bucket queries); without the filter the
    # NULL-day group's running/lag/lead position depends on the
    # engine's NULL ordering default (Spark FIRST, DuckDB LAST)
    daily = li.filter(F.col("l_shipdate").isNotNull()).repartition("l_suppkey").groupBy(
        "l_suppkey", F.date_trunc("day", F.col("l_shipdate")).alias("day")
    ).agg(
        F.sum("l_quantity").alias("qty"),
        fixed_sum(REV()).alias("revenue"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("day")
    return daily.select(
        "l_suppkey",
        "day",
        "qty",
        "revenue",
        F.sum("qty").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_qty"),
        F.lag("qty").over(w).alias("prev_qty"),
        F.lead("qty").over(w).alias("next_qty"),
    )


@register(
    "rollup_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       MSUM(l_extendedprice * (1 - l_discount)) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping: (flag,status), (flag), () subtotals in one pass."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        fixed_sum(REV()).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       MSUM(o_totalprice) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping over orders."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        fixed_sum("o_totalprice").alias("total"),
    )


@register(
    "grouping_sets_order_stats",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) / 1e2 / count(*) AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (same Catalyst plan as
    the DataFrame rollup/cube path)."""
    load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) / 1e2 / count(*) AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "setop_customers_96_97",
    oracle="""
WITH c96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
     c97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT 'both'   AS tag, o_custkey FROM (SELECT o_custkey FROM c96 INTERSECT SELECT o_custkey FROM c97)
UNION ALL
SELECT 'only96' AS tag, o_custkey FROM (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c97)
""",
)
def setop_customers_96_97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: INTERSECT / EXCEPT / UNION ALL."""
    o = load(spark, sf_dir, "orders")["orders"]

    def active(y0: str, y1: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    c96, c97 = active("1996-01-01", "1997-01-01"), active("1997-01-01", "1998-01-01")
    both = c96.intersect(c97).select(F.lit("both").alias("tag"), "o_custkey")
    only96 = c96.exceptAll(c97).distinct().select(F.lit("only96").alias("tag"), "o_custkey")
    return both.unionByName(only96)


@register(
    "semi_anti_customers",
    oracle="""
SELECT 'has_urgent' AS tag, c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
UNION ALL
SELECT 'no_orders' AS tag, c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
""",
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins.

    The oracle is pinned to EXISTS / NOT EXISTS — NOT the superficially
    equivalent IN / NOT IN: Spark's left_anti join has NOT-EXISTS
    semantics (a NULL join key matches nothing, each left row decided
    independently), while SQL ``NOT IN`` returns UNKNOWN for EVERY row
    the moment the subquery contains a single NULL, collapsing the
    no_orders branch to 0 rows. Identical on NULL-free keys, divergent
    under NULL fuzz — caught by the r15 deep NULL-density sweep
    (density 1/2: Spark 150 rows vs NOT-IN oracle 0)."""
    t = load(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    semi = (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select(F.lit("has_urgent").alias("tag"), "c_custkey")
    )
    anti = (
        t["customer"]
        .join(t["orders"].select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(F.lit("no_orders").alias("tag"), "c_custkey")
    )
    return semi.unionByName(anti)


@register(
    "case_bucket_orders",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS bucket,
       o_orderstatus,
       count(*) AS n,
       MSUM(o_totalprice) / count(*) AS avg_price
FROM orders
GROUP BY 1, 2
""",
)
def case_bucket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    o = load(spark, sf_dir, "orders")["orders"]
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        o.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"), (fixed_sum("o_totalprice") / F.count(F.lit(1))).alias("avg_price"))
    )


@register(
    "order_month_stats",
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       MSUM(o_totalprice) AS total,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM orders
GROUP BY 1
""",
)
def order_month_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions + exact distinct aggregation per month."""
    o = load(spark, sf_dir, "orders")["orders"]
    return o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        fixed_sum("o_totalprice").alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "pivot_linestatus",
    oracle="""
SELECT l_returnflag,
       sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O",
       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F"
FROM lineitem GROUP BY l_returnflag
""",
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (schema-stable at any scale)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return pivot_on(li, ["l_returnflag"], "l_linestatus", ["O", "F"], F.sum("l_quantity"))


@register(
    "part_type_topk",
    oracle="""
SELECT p_type, p_partkey, revenue, rn FROM (
  SELECT p_type, p_partkey,
         MSUM(l_extendedprice * (1 - l_discount)) AS revenue,
         row_number() OVER (PARTITION BY p_type
                            ORDER BY MSUM(l_extendedprice * (1 - l_discount)) DESC, p_partkey) AS rn
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_partkey
) WHERE rn <= 5
""",
    bench=True,
)
def part_type_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k per group. part is broadcast at test SF; at
    100 TB the same plan holds with a shuffle join on l_partkey (AQE
    decides from runtime stats)."""
    t = load(spark, sf_dir, "lineitem", "part")
    agg = (
        t["lineitem"]
        .join(t["part"].select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_partkey")
        .agg(fixed_sum(REV()).alias("revenue"))
    )
    return top_k_per_group(
        agg, ["p_type"], [F.col("revenue").desc(), F.col("p_partkey")], 5, keep_rank=True
    )


@register(
    "string_funcs_parts",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up_name,
       substring(p_name, 1, 5) AS pfx,
       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
       concat_ws('|', p_brand, p_type) AS brand_type,
       length(p_name) AS name_len
FROM part
""",
)
def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string function coverage: upper/substring/regexp_extract/
    concat_ws/length — all JVM kernels inside one codegen stage."""
    p = load(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "distinct_counts_by_flag",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def distinct_counts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distinct aggregates (expand + two-phase agg)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "approx_distinct_parts",
    oracle=kmv_distinct_sql(
        "lineitem", "l_returnflag", "CAST(l_partkey AS VARCHAR)", k=256, out="kmv_parts"
    )
    + "ORDER BY l_returnflag",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct parts per return flag via the KMV
    (k-minimum-values) sketch on the md5_60 spec hash
    (operators/sketches.py) — the mergeable bounded-memory
    distinct-count a 100 TB pipeline uses instead of exact distinct,
    but spec-defined, so the DuckDB oracle recomputes the estimate
    bit-for-bit and the driver hash-checks it (was rows-only when built
    on engine-specific HLL++; that production variant moved to
    approx_distinct_parts_hll, error-bound-tested in pytest)."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    return kmv_distinct(
        li, ["l_returnflag"], F.col("l_partkey").cast("string"), k=256, out="kmv_parts"
    ).orderBy("l_returnflag")


def approx_distinct_parts_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-native production variant: HLL++ approx_count_distinct,
    GK percentile_approx, and a mergeable DataSketches HLL union — the
    right tools at 100 TB, but engine-specific outputs no other engine
    can recompute, so this runs under pytest error bounds
    (tests/test_sketches.py) rather than the registry's hash gate."""
    li = load(spark, sf_dir, "lineitem")["lineitem"]
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.hll_sketch_agg("l_partkey").alias("__hll"),
    )
    # DataSketches HLL: mergeable sketches are the 100 TB distinct-count
    # path (union across partitions/days without re-scanning)
    return agg.select(
        "l_returnflag",
        "approx_parts",
        "approx_median_price",
        F.hll_sketch_estimate("__hll").alias("hll_estimate"),
    )
