"""Driver contract for the spark-graft builder (PySpark target).

entry/queries/oracle_sql are all backed by the single query registry in
callysto_spark.queries — the same registry the pytest oracle harness and
bench.py iterate, so declared surface, tests and benchmarks cannot drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# import works regardless of the harness's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from callysto_spark.queries import load_all  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped revenue
    by nation (scan → pushed filters → broadcast dims → shuffle join →
    hash agg → sort)."""
    registry = load_all()
    return registry["q5_supplier_volume"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2)."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every registered query (87 of 87, since
    r9): MinHash/SimHash/LSH run on the portable md5_60 spec hash, the
    approximate-aggregate queries run on spec-defined KMV /
    bottom-k-sample sketches (operators/sketches.py), and the two BLAS
    serving-kernel rows (emb_ivf_assign_blas / emb_cosine_topk_blas)
    surface only engine-agreement-asserted values — integer cells, and
    the expr engine's sims — so they hash-replay under the shared
    assignment/cosine oracles while an IN-PLAN raise_error cross-check
    still fails the row loudly on any float32-kernel regression (the
    BLAS accumulation itself is not bit-replayable in SQL)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
