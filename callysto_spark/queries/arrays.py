"""Array / map / explode / higher-order-function coverage (SURVEY.md
§2.5 scalar-function rows). Array-valued outputs are rendered as CSV
strings so cross-engine value comparison is representation-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from callysto_spark.functions import rnd
from callysto_spark.queries import register
from callysto_spark.tables import load


@register(
    "user_event_type_sets",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
       count(DISTINCT event_type) AS n_types,
       CAST(list_contains(list(DISTINCT event_type), 'purchase') AS INT) AS has_purchase
FROM events GROUP BY user_id
""",
)
def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted array → array_join / array_contains. A user
    whose every event_type is NULL gets a NULL types_csv (SQL aggregate
    convention: no non-null inputs → NULL, as DuckDB's list() returns),
    not the empty string array_join would render."""
    e = load(spark, sf_dir, "events")["events"]
    types = F.array_sort(F.collect_set("event_type"))
    return e.groupBy("user_id").agg(
        F.when(F.size(types) > 0, F.array_join(types, ",")).alias("types_csv"),
        F.size(types).alias("n_types"),
        F.array_contains(types, "purchase").cast("int").alias("has_purchase"),
    )


@register(
    "token_top20",
    oracle=r"""
SELECT tok, count(*) AS n FROM (
  SELECT unnest(string_split_regex(trim(replace(replace(lower(text), 'ς', 'σ'), chr(775), '')), '[\t\n\x0B\f\r ]+')) AS tok FROM documents
) GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
""",
)
def token_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split) → global token frequency top-20 (deterministic
    tie-break on the token)."""
    d = load(spark, sf_dir, "documents")["documents"]
    return (
        d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
    )


@register(
    "embedding_array_stats",
    oracle="""
SELECT vec_id,
       length(embedding) AS dim,
       length(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_sum([CAST(x AS DOUBLE) for x in embedding]), 6) AS vec_sum,
       round(list_max([CAST(x AS DOUBLE) for x in embedding]), 6) AS vec_max
FROM embeddings
""",
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter / aggregate / array_max over
    the embedding column — all JVM-side, no UDF."""
    e = load(spark, sf_dir, "embeddings")["embeddings"]
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    # SQL aggregate semantics pinned on the fold: sum over the NON-NULL
    # elements, empty/all-NULL array → NULL — matching DuckDB's
    # list_sum, where a raw fold would turn [] into the 0.0 init and a
    # NULL element into a NULL total
    nn = F.filter(dbl, lambda x: x.isNotNull())
    vec_sum = F.when(F.size(nn) > 0, F.aggregate(nn, F.lit(0.0), lambda a, x: a + x))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        rnd(vec_sum, 6).alias("vec_sum"),
        rnd(F.array_max(dbl), 6).alias("vec_max"),
    )


@register(
    "user_type_count_map",
    oracle="""
WITH tc AS (
  SELECT user_id, event_type, count(*) AS n FROM events
  WHERE event_type IS NOT NULL GROUP BY 1, 2
)
SELECT user_id,
       array_to_string(list(event_type ORDER BY event_type), ',') AS keys_csv,
       array_to_string(list(CAST(n AS VARCHAR) ORDER BY event_type), ',') AS counts_csv
FROM tc GROUP BY user_id
""",
)
def user_type_count_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-shaped aggregation (per-user type→count), rendered as aligned
    sorted key/value CSVs (map columns themselves hash differently across
    engines). Internally built with map_from_entries to exercise map
    functions. NULL event_types are excluded on both sides — SQL maps
    cannot hold a NULL key (Spark throws NULL_MAP_KEY), so a user with
    only NULL types emits no row."""
    e = load(spark, sf_dir, "events")["events"]
    tc = (
        e.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    entries = F.array_sort(F.collect_list(F.struct("event_type", "n")))
    m = F.map_from_entries(entries)
    return tc.groupBy("user_id").agg(
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.array_join(F.transform(F.map_values(m), lambda v: v.cast("string")), ",").alias("counts_csv"),
    )
