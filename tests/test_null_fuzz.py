"""NULL-fuzz parity: events- and documents-consuming registry queries
vs their oracles with ~10% of every nullable column NULLed.

The pinned testdata contains no NULLs, so neither the oracle harness
nor the driver gate ever exercises a NULL through the window / shingle
/ serde / map kernels — and Spark and DuckDB disagree about NULLs in
several defaults (window rank placement, list() vs array_join over
empty sets, map keys, unnest-of-NULL). Each divergence this sweep
caught was fixed by pinning ONE semantics on both sides:

- window()/date_trunc buckets: a NULL ts lands in no window;
- sessionize/as-of: NULL timestamps and NULL join keys match nothing;
- shingle/token kernels: NULL text yields no tokens (ranking it gave
  every untexted doc an identical '' shingle — a quadratic false-pair
  blowup in the near-dup pipelines);
- maps: NULL keys excluded (Spark throws NULL_MAP_KEY);
- Avro round-trip: union-with-null schema, NaN-as-null at the Arrow
  crossing;
- csv-of-set renderings: no non-null inputs → NULL, not ''.

The fuzz mask is deterministic (per-column offset, every 10th row), so
failures reproduce exactly. Override the density with
``SPARK_GRAFT_NULL_FUZZ_DENSITY`` (NULL every Nth row; ``1`` = every
nullable column entirely NULL) — the r15 deep sweep ran all targets at
densities 5/3/2/1 and every one held parity, so the committed default
stays 10 and the knob exists to re-run that sweep cheaply.
"""

from __future__ import annotations

import os
import zlib

import pytest

from callysto_spark.queries import load_all


pytestmark = pytest.mark.slow  # gated: see pytest.ini / conftest (r16 verify-budget fix)

REGISTRY = load_all()
TARGETS = sorted(
    n for n in REGISTRY
    if n.startswith(("events_", "user_", "raw_message", "avro_", "doc_"))
)


DENSITY = int(os.environ.get("SPARK_GRAFT_NULL_FUZZ_DENSITY", "10"))


def _fuzz_table(src: str, dst: str, keep: tuple[str, ...] = ()) -> None:
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
        # crc32, not hash(): str hash is salted per interpreter run, which
        # would silently change the NULL pattern between runs and break
        # the "failures reproduce exactly" guarantee
        off = zlib.crc32(name.encode()) % DENSITY
        mask = pa.array([(i + off) % DENSITY == 0 for i in range(n)])
        cols[name] = pc.if_else(mask, pa.nulls(n, col.type), col.combine_chunks())
    pq.write_table(pa.table(cols), dst)


@pytest.fixture(scope="module")
def fuzzed_sf(tmp_path_factory, sf_dir):
    import shutil

    from callysto_spark.tables import TABLES

    base = tmp_path_factory.mktemp("null_fuzz_sf")
    _fuzz_table(f"{sf_dir}/events.parquet", str(base / "events.parquet"))
    # doc_id stays: it is the primary key every pipeline joins/groups on
    _fuzz_table(
        f"{sf_dir}/documents.parquet", str(base / "documents.parquet"), keep=("doc_id",)
    )
    for t in TABLES:
        if t not in ("events", "documents"):
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
def test_null_fuzz_parity(name, spark, fuzzed_sf, fuzzed_ddb):
    q = REGISTRY[name]
    srows = sorted(map(str, (tuple(r) for r in q.fn(spark, fuzzed_sf).collect())))
    orows = sorted(map(str, (tuple(r) for r in fuzzed_ddb.execute(q.oracle).fetchall())))
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} vs {len(orows)} rows under NULL fuzz"
    )
    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not diffs, f"{name}: {len(diffs)} rows diverge under NULL fuzz; first: {diffs[:2]}"
