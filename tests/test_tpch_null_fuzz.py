"""NULL-fuzz parity for the RELATIONAL surface: every TPC-H-family
registry query vs its oracle with 5% of every non-key column in
lineitem/orders/customer/supplier/part/partsupp NULLed (primary keys
kept; the tiny nation/region dims stay clean).

The pinned testdata has no NULLs, so joins, argmax aggregates, and
window functions never saw one — and the engines' NULL ORDERING
DEFAULTS differ (Spark: ASC ⇒ NULLS FIRST; DuckDB: NULLS LAST).
Divergences this sweep caught, each pinned on both sides:

- window ordering (orders_price_range_frame,
  customer_balance_distribution): NULLS FIRST stated explicitly in
  both the Window spec and the oracle SQL — first_value/percent_rank
  shifted per engine otherwise;
- time-series windows (supplier_daily_running): a NULL ship date has
  no place on the daily axis — filtered on both sides (same contract
  as the window()-bucket queries);
- argmax (argmax_order_per_nation): rows with a NULL compare key don't
  participate (max_by over a NULL key is engine-defined);
- q21 decorrelation: a (order, NULL-supplier) pair can never witness
  the correlated <>-EXISTS predicates, but it WOULD inflate the
  decorrelated per-order counts — excluded up front on both engines,
  which is provably the EXISTS semantics.

Mask is crc32-deterministic; failures reproduce exactly. Override the
density with ``SPARK_GRAFT_NULL_FUZZ_DENSITY`` (NULL every Nth non-key
row; ``1`` = every non-key column entirely NULL). The r15 deep sweep
at densities 10/4/2/1 caught one latent oracle-semantics mismatch the
committed 5% mask never exposed: semi_anti_customers' oracle said
``NOT IN``, which collapses to 0 rows once the subquery contains a
single NULL, while Spark's left_anti join has NOT-EXISTS semantics —
pinned to NOT EXISTS on the oracle side (the declared intent). All
targets green at every density after the pin; default stays 20 (5%)
and the knob replays the sweep.
"""

from __future__ import annotations

import os
import shutil
import zlib

import pytest

from callysto_spark.queries import load_all


pytestmark = pytest.mark.slow  # gated: see pytest.ini / conftest (r16 verify-budget fix)

REGISTRY = load_all()
_SKIP_PREFIXES = ("doc_", "emb", "events_", "user_", "raw_message", "avro_")
TARGETS = sorted(n for n in REGISTRY if not n.startswith(_SKIP_PREFIXES))

_KEYS = {
    "lineitem": ("l_orderkey", "l_linenumber"),
    "orders": ("o_orderkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "partsupp": ("ps_partkey", "ps_suppkey"),
}


DENSITY = int(os.environ.get("SPARK_GRAFT_NULL_FUZZ_DENSITY", "20"))


def _fuzz_table(src: str, dst: str, keep: tuple[str, ...]) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tab = pq.read_table(src)
    n = tab.num_rows
    cols = {}
    for name in tab.column_names:
        col = tab.column(name)
        if name in keep:
            cols[name] = col.combine_chunks()
            continue
        if DENSITY == 1:
            cols[name] = pa.nulls(n, col.type)
            continue
        off = zlib.crc32(name.encode()) % DENSITY
        mask = pa.array([(i + off) % DENSITY == 0 for i in range(n)])
        cols[name] = pc.if_else(mask, pa.nulls(n, col.type), col.combine_chunks())
    pq.write_table(pa.table(cols), dst)


@pytest.fixture(scope="module")
def fuzzed_sf(tmp_path_factory, sf_dir):
    from callysto_spark.tables import TABLES

    base = tmp_path_factory.mktemp("tpch_null_fuzz_sf")
    for t in TABLES:
        if t in _KEYS:
            _fuzz_table(f"{sf_dir}/{t}.parquet", str(base / f"{t}.parquet"), _KEYS[t])
        else:
            shutil.copy(f"{sf_dir}/{t}.parquet", base / f"{t}.parquet")
    return str(base)


@pytest.fixture(scope="module")
def fuzzed_ddb(fuzzed_sf):
    import duckdb

    from callysto_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fuzzed_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TARGETS)
def test_tpch_null_fuzz_parity(name, spark, fuzzed_sf, fuzzed_ddb):
    q = REGISTRY[name]
    srows = sorted(map(str, (tuple(r) for r in q.fn(spark, fuzzed_sf).collect())))
    orows = sorted(map(str, (tuple(r) for r in fuzzed_ddb.execute(q.oracle).fetchall())))
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} vs {len(orows)} rows under relational NULL fuzz"
    )
    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not diffs, f"{name}: {len(diffs)} rows diverge; first: {diffs[:2]}"
