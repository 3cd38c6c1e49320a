"""Dirty-vector parity: the embedding-consuming registry queries vs
their oracles with ~10% of embeddings replaced by adversarial vectors
(zero-norm, NaN/Inf components, NULL, empty, NULL element, 1e30
magnitudes).

What this pinned — the vector-cleanliness contract
(operators/similarity.py clean_vec / size_ok / valid_norm and the
clean_vec_sql oracle twins): dirty vectors are EXCLUDED by every
similarity operator on BOTH engines. Before the contract, one
zero-norm vector aborted cosine scoring with DIVIDE_BY_ZERO under
ANSI mode (one dirty row in a 100 TB corpus must degrade to "row
absent", never kill the job), a NaN/NULL-element vector made IVF
assignment engine-dependent, and rnd() turned Inf into a saturated
long. The cosine paths evaluate the contract on the already-hoisted
norm — NULL/NaN/Inf/zero all collapse into one scalar test, so the
checks cost no extra per-row array fold.

Mask is crc32-deterministic; failures reproduce exactly.
"""

from __future__ import annotations

import shutil
import zlib

import pytest

from callysto_spark.queries import load_all


pytestmark = pytest.mark.slow  # gated: see pytest.ini / conftest (r16 verify-budget fix)

REGISTRY = load_all()
TARGETS = sorted(n for n in REGISTRY if n.startswith("emb"))


def _mutate(v, kind, dim):
    v = list(v)
    if kind == 0:
        return [0.0] * dim                 # zero-norm
    if kind == 1:
        v[0] = float("nan")
        return v
    if kind == 2:
        v[0] = float("inf")
        return v
    if kind == 3:
        return None                        # NULL embedding
    if kind == 4:
        return []                          # empty array
    if kind == 5:
        v[3] = None                        # NULL element
        return v
    if kind == 6:
        return [x * 1e30 for x in v]       # huge (finite) magnitude
    return v


@pytest.fixture(scope="module")
def fuzzed_sf(tmp_path_factory, sf_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from callysto_spark.tables import TABLES

    base = tmp_path_factory.mktemp("emb_fuzz_sf")
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet")
    embs = tab.column("embedding").to_pylist()
    ids = tab.column("vec_id").to_pylist()
    dim = len(embs[0])
    for i in range(len(embs)):
        if (zlib.crc32(str(ids[i]).encode()) % 10) == 0:  # ~10%, deterministic
            embs[i] = _mutate(embs[i], ids[i] % 7, dim)
    cols = {name: tab.column(name) for name in tab.column_names}
    cols["embedding"] = pa.array(embs, type=pa.list_(pa.float32()))
    pq.write_table(pa.table(cols), str(base / "embeddings.parquet"))
    for t in TABLES:
        if t != "embeddings":
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
def test_emb_fuzz_parity(name, spark, fuzzed_sf, fuzzed_ddb):
    q = REGISTRY[name]
    srows = sorted(map(str, (tuple(r) for r in q.fn(spark, fuzzed_sf).collect())))
    if q.oracle is None:
        # rows-only BLAS rows: the value check here is the IN-PLAN
        # cross-engine raise_error (a kernel/contract divergence on the
        # dirty corpus fails the collect above) plus two-run
        # determinism — the branch run_oracle_parity takes, on the
        # fuzzed corpus
        again = sorted(map(str, (tuple(r) for r in q.fn(spark, fuzzed_sf).collect())))
        assert srows == again, f"{name}: nondeterministic under vector fuzz"
        return
    orows = sorted(map(str, (tuple(r) for r in fuzzed_ddb.execute(q.oracle).fetchall())))
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} vs {len(orows)} rows under vector fuzz"
    )
    diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not diffs, f"{name}: {len(diffs)} rows diverge under vector fuzz; first: {diffs[:2]}"
