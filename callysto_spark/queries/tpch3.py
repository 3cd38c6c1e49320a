"""Relational coverage, batch 3: more TPC-H query shapes — bilateral
join filters (Q7), revenue-loss report (Q10), CASE-bucketed shipmode
stats (Q12 flavor), promo share (Q14), anti-join with scalar-subquery
filter (Q22 flavor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from callysto_spark.functions import fixed_sum, rnd
from callysto_spark.queries import register
from callysto_spark.tables import load


def REV():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q7_bilateral_volume",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       extract(year FROM l_shipdate) AS ship_year,
       MSUM(l_extendedprice * (1 - l_discount)) AS volume,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
)
def q7_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dim table joined twice under different
    roles (customer nation vs supplier nation) + year extraction."""
    t = load(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    cn = t["nation"].select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = t["nation"].select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(fixed_sum(REV()).alias("volume"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       MSUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue loss, top-20 customers
    (deterministic tie-break on custkey)."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(fixed_sum(REV()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_by_bracket",
    oracle="""
SELECT CASE WHEN l_quantity < 10 THEN 'small'
            WHEN l_quantity < 30 THEN 'medium'
            ELSE 'large' END AS qty_bracket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
)
def q12_priority_by_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-sum pivoting by priority class."""
    t = load(spark, sf_dir, "lineitem", "orders")
    bracket = (
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bracket.alias("qty_bracket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
SELECT round(
         100.0 * MSUM(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
         / MSUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio (promo share %)."""
    t = load(spark, sf_dir, "lineitem", "part")
    promo = F.when(F.col("p_type") == "PROMO", REV()).otherwise(F.lit(0.0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"].select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            rnd(F.lit(100.0) * fixed_sum(promo) / fixed_sum(REV()), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment, count(*) AS n_cust, MSUM(c_acctbal) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balance + never ordered
    (scalar subquery + anti join)."""
    t = load(spark, sf_dir, "customer", "orders")
    # Scalar subquery stays in-plan: a 1-row aggregate broadcast-cross-joined
    # onto customer, so Catalyst sees one job and no driver round-trip.
    avg_bal = (
        t["customer"].filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
        .join(t["orders"].select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"), fixed_sum("c_acctbal").alias("total_bal"))
    )


@register(
    "setop_all_variants",
    oracle="""
WITH a AS (SELECT o_orderstatus AS s FROM orders WHERE o_totalprice > 100000),
     b AS (SELECT o_orderstatus AS s FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT 'intersect_all' AS tag, s, count(*) AS n FROM (SELECT s FROM a INTERSECT ALL SELECT s FROM b) GROUP BY s
UNION ALL
SELECT 'except_all' AS tag, s, count(*) AS n FROM (SELECT s FROM a EXCEPT ALL SELECT s FROM b) GROUP BY s
""",
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops: INTERSECT ALL / EXCEPT ALL (bag semantics —
    duplicates preserved, unlike the distinct set ops)."""
    o = load(spark, sf_dir, "orders")["orders"]
    a = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_orderstatus").alias("s"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_orderstatus").alias("s"))
    ia = a.intersectAll(b).groupBy("s").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("tag"), "s", "n"
    )
    ea = a.exceptAll(b).groupBy("s").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("tag"), "s", "n"
    )
    return ia.unionByName(ea)


@register(
    "shipping_delay_histogram",
    oracle="""
SELECT date_diff('day', o_orderdate, l_shipdate) AS delay_days,
       count(*) AS n,
       MSUM(l_extendedprice) / count(*) AS avg_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
GROUP BY 1
""",
)
def shipping_delay_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: per-day order→ship delay histogram
    (datediff ≡ date_diff('day'))."""
    t = load(spark, sf_dir, "lineitem", "orders")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay_days"))
        .agg(F.count(F.lit(1)).alias("n"), (fixed_sum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"))
    )


@register(
    "string_normalize_parts",
    oracle="""
SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
       reverse(p_brand) AS brand_rev,
       replace(p_type, 'ANOD', 'anod') AS type_repl,
       CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS has_steel,
       position('#' IN p_brand) AS hash_pos
FROM part
""",
)
def string_normalize_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More scalar string kernels: translate/lpad/reverse/replace/LIKE/
    position — all whole-stage-codegen JVM ops."""
    p = load(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.replace(F.col("p_type"), F.lit("ANOD"), F.lit("anod")).alias("type_repl"),
        F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("has_steel"),
        F.instr("p_brand", "#").alias("hash_pos"),
    )


@register(
    "argmax_order_per_nation",
    oracle="""
WITH j AS (
  SELECT n_name, o_orderkey, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_totalprice IS NOT NULL
),
r AS (
  SELECT n_name, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY n_name ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
         row_number() OVER (PARTITION BY n_name ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
  FROM j
)
SELECT n_name,
       max(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_orderkey,
       max(o_totalprice) AS top_price,
       max(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_orderkey
FROM r GROUP BY n_name
""",
)
def argmax_order_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) aggregates with a composite
    tie-break ordering so the chosen row is total-order deterministic."""
    t = load(spark, sf_dir, "orders", "customer", "nation")
    key = F.struct(F.col("o_totalprice"), F.col("o_orderkey").cast("double"))
    return (
        # an argmax over a NULL compare key is undefined — those rows
        # don't participate (max(o_totalprice) already ignores NULLs, so
        # only the arg columns could have diverged between engines)
        t["orders"]
        .filter(F.col("o_totalprice").isNotNull())
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.max_by("o_orderkey", key).alias("top_orderkey"),
            F.max("o_totalprice").alias("top_price"),
            F.min_by("o_orderkey", key).alias("bottom_orderkey"),
        )
    )


@register(
    "token_positions",
    oracle=r"""
SELECT doc_id,
       generate_subscripts(toks, 1) - 1 AS pos,
       unnest(toks) AS tok
FROM (SELECT doc_id, string_split_regex(trim(replace(replace(lower(text), 'ς', 'σ'), chr(775), '')), '[\t\n\x0B\f\r ]+') AS toks
      FROM documents WHERE doc_id < 10)
""",
)
def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral expansion with ordinality) — 0-based token
    positions for the first 10 documents."""
    d = load(spark, sf_dir, "documents")["documents"]
    from callysto_spark.operators.dedup import tokens_col

    return (
        d.filter(F.col("doc_id") < 10)
        .select("doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok"))
        .select("doc_id", "pos", "tok")
    )
