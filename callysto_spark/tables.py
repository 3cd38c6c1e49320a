"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under a sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables that stay broadcast-size at ANY scale factor (TPC-H
# proportions: region=5, nation=25 rows forever; supplier grows slowly).
BROADCAST_DIMS = {"region", "nation", "supplier"}


# The driver testdata's timestamp encoding has varied across rounds:
# TIMESTAMP(NANOS) (Spark's vectorized reader rejects it → read ns-as-long
# and convert) in early rounds, plain timestamp[us] without isAdjustedToUTC
# (Spark 4 reads it as TIMESTAMP_NTZ) later. The loader normalizes BOTH to
# session-zone ``timestamp`` so every downstream consumer sees one dtype
# (DuckDB performs the same coercions on read; session zone is UTC).
_NANOS_TS_COLS = {"events": ["ts"]}


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read the named parquet tables, register temp views, return dict.

    The built DataFrame is cached per (session, sf_dir, table):
    DataFrames are immutable logical plans, and rebuilding one costs a
    parquet-footer read + several py4j round trips (~100 ms/table —
    measured 0.3-0.8 s of pure plan-construction overhead per TPC-H
    query invocation before caching). The cache lives on the session
    object, so it dies with the session. Temp-view registration is
    re-applied only when a DIFFERENT sf_dir claims the table name, so
    ``spark.sql`` queries always see the most recently loaded sf.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The sketches' bounded top-k relies on InferWindowGroupLimit, which
    # skips row_number()<=k filters with k above this threshold (default
    # 1000 < the k=1024 sample branch). get_spark sets it at build time,
    # but the correctness driver hands us ITS OWN plain session — it is a
    # runtime SQL conf, so raise it here where every query path passes.
    # Raise-only: a user who set it even higher keeps their value.
    _wgl_key = "spark.sql.optimizer.windowGroupLimitThreshold"
    if int(spark.conf.get(_wgl_key, "1000")) < 64 * 1024:
        spark.conf.set(_wgl_key, str(64 * 1024))
    cache: dict = spark.__dict__.setdefault("_callysto_table_cache", {})
    views: dict = spark.__dict__.setdefault("_callysto_view_owner", {})
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        df = cache.get((sf_dir, name))
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            for col in _NANOS_TS_COLS.get(name, []):
                if dict(df.dtypes).get(col) == "bigint":
                    # Infer the epoch unit from magnitude (2000-2100 era:
                    # s≈1e9, ms≈1e12, µs≈1e15, ns≈1e18) so a future
                    # encoding shift (ns→ms/µs as plain int64) can't
                    # silently mis-scale every timestamp. Probe the FIRST
                    # NON-NULL value: the IS NOT NULL filter pushes to the
                    # scan and first() stops after one match — O(1) at any
                    # table size (a max() aggregate would scan the whole
                    # column at load time), and all non-null values of a
                    # column share one encoding, so one probe decides.
                    # Integer division: ns epochs exceed double precision.
                    probe = df.select(col).where(F.col(col).isNotNull()).first()
                    v = abs(probe[0]) if probe is not None else 0
                    div = 1_000 if v > 1e17 else 1 if v > 1e14 else None
                    if div is not None:
                        df = df.withColumn(
                            col, F.expr(f"timestamp_micros(CAST({col} DIV {div} AS LONG))")
                        )
                    else:
                        mul = 1_000 if v > 1e11 else 1_000_000
                        df = df.withColumn(
                            col, F.expr(f"timestamp_micros(CAST({col} * {mul} AS LONG))")
                        )
            for col, dtype in df.dtypes:
                if dtype == "timestamp_ntz":
                    # same instant under the UTC session zone; restores the
                    # LTZ dtype every consumer (and DuckDB) expects
                    df = df.withColumn(col, F.col(col).cast("timestamp"))
            cache[(sf_dir, name)] = df
        if views.get(name) != sf_dir:
            df.createOrReplaceTempView(name)
            views[name] = sf_dir
        out[name] = df
    return out
