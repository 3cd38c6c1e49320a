"""Malformed-JSON parity: the props-consuming registry queries vs
their oracles with ~10% of event props replaced by broken or
adversarial JSON (syntax errors, wrong types, 1e999 overflow, quoted
and non-integral numbers, duplicate keys, NULL, array roots).

What this pinned (queries/events.py):
- NULL-on-malformed on BOTH engines: Spark's get_json_object yields
  NULL for invalid JSON but DuckDB's json_extract_string ERRORS — the
  oracle parses through TRY_CAST(props AS JSON). And under ANSI mode a
  plain .cast("int") ABORTS the job on the first uncastable extract
  ('{"k": 1e999}' extracts as "Infinity") — the engine uses try_cast.
- Spark string→int semantics on the value: only integral strings cast
  (DuckDB's TRY_CAST would ROUND '3.7' to 4); the oracle guards with
  an integral-pattern CASE.

Mask is crc32-deterministic; failures reproduce exactly.
"""

from __future__ import annotations

import shutil
import zlib

import pytest

from callysto_spark.queries import load_all


pytestmark = pytest.mark.slow  # gated: see pytest.ini / conftest (r16 verify-budget fix)

REGISTRY = load_all()
TARGETS = ["events_json_kv", "events_type_stats"]

BAD_PROPS = [
    "",
    "not json at all",
    '{"k": }',
    '{"k": "12abc"}',
    '{"k": null}',
    '{"K": 5}',
    '{"k": 1e999}',
    '{"k": [1,2]}',
    '{"k": 3.7}',
    '{"k": "7"}',
    None,
    '{"k": 2147483648}',
    '{"k": -0}',
    "[5]",
    '{"k": 1, "k": 2}',
    '{"k":\t 9}',
]


@pytest.fixture(scope="module")
def fuzzed_sf(tmp_path_factory, sf_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from callysto_spark.tables import TABLES

    base = tmp_path_factory.mktemp("json_fuzz_sf")
    tab = pq.read_table(f"{sf_dir}/events.parquet")
    props = tab.column("props").to_pylist()
    ids = tab.column("event_id").to_pylist()
    for i in range(len(props)):
        if (zlib.crc32(str(ids[i]).encode()) % 10) == 0:  # ~10%, deterministic
            props[i] = BAD_PROPS[ids[i] % len(BAD_PROPS)]
    cols = {name: tab.column(name) for name in tab.column_names}
    cols["props"] = pa.array(props, type=pa.string())
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
def test_json_fuzz_parity(name, spark, fuzzed_sf, fuzzed_ddb):
    q = REGISTRY[name]
    srows = sorted(map(str, (tuple(r) for r in q.fn(spark, fuzzed_sf).collect())))
    orows = sorted(map(str, (tuple(r) for r in fuzzed_ddb.execute(q.oracle).fetchall())))
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} vs {len(orows)} rows under JSON fuzz"
    )
    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not diffs, f"{name}: {len(diffs)} rows diverge under JSON fuzz; first: {diffs[:2]}"
