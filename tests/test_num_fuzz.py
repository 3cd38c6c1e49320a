"""Numeric-extremes parity: the events-consuming registry queries vs
their oracles with ~10% of event values replaced by NaN, ±Inf, ±1e308,
denormals, and -0.0.

What this pinned (functions/compat.py fixed_sum / the MSUM macro):
MSUM is a fixed-point sum, and fixed-point cannot represent non-finite
or >2^53-scaled values — those rows are EXCLUDED (NULL) on BOTH
engines. Before the contract, one 1e308 row crashed the whole job
under ANSI mode (int64 sum overflow: exactly what a dirty row in a
100 TB corpus must never do), and NaN silently counted as zero because
Spark's floor(double) returns LONG and maps NaN to 0 — so the range
check runs on the DOUBLE, pre-floor.

Mask is crc32-deterministic; failures reproduce exactly.
"""

from __future__ import annotations

import shutil
import zlib

import pytest

from callysto_spark.queries import load_all


pytestmark = pytest.mark.slow  # gated: see pytest.ini / conftest (r16 verify-budget fix)

REGISTRY = load_all()
TARGETS = sorted(
    n for n in REGISTRY
    if n.startswith(("events_", "user_", "raw_message", "avro_"))
)

SPECIALS = [float("nan"), float("inf"), float("-inf"), 1e308, -1e308, 5e-324, -0.0]


@pytest.fixture(scope="module")
def fuzzed_sf(tmp_path_factory, sf_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from callysto_spark.tables import TABLES

    base = tmp_path_factory.mktemp("num_fuzz_sf")
    tab = pq.read_table(f"{sf_dir}/events.parquet")
    vals = tab.column("value").to_pylist()
    ids = tab.column("event_id").to_pylist()
    for i in range(len(vals)):
        if (zlib.crc32(str(ids[i]).encode()) % 10) == 0:  # ~10%, deterministic
            vals[i] = SPECIALS[ids[i] % len(SPECIALS)]
    cols = {name: tab.column(name) for name in tab.column_names}
    cols["value"] = pa.array(vals, type=pa.float64())
    pq.write_table(pa.table(cols), str(base / "events.parquet"))
    for t in TABLES:
        if t != "events":
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
def test_num_fuzz_parity(name, spark, fuzzed_sf, fuzzed_ddb):
    q = REGISTRY[name]
    srows = sorted(map(str, (tuple(r) for r in q.fn(spark, fuzzed_sf).collect())))
    orows = sorted(map(str, (tuple(r) for r in fuzzed_ddb.execute(q.oracle).fetchall())))
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} vs {len(orows)} rows under numeric fuzz"
    )
    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not diffs, f"{name}: {len(diffs)} rows diverge under numeric fuzz; first: {diffs[:2]}"
