"""Oracle harness: every registry query vs DuckDB, exact-match.

Mimics the driver's t2 gate: run the Spark implementation and the oracle
SQL on the same parquet, sort columns by name, sort rows, compare values
EXACTLY (floats too — the determinism rules in callysto_spark.queries
are designed to make exact equality hold; a tolerance here would hide
driver hash mismatches).
"""

from __future__ import annotations

import math

import pytest

from callysto_spark.queries import load_all

REGISTRY = load_all()


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = None
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is not None, str(type(x)), x) for x in r))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, ddb, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if q.oracle is None:
        # rows-only: deterministic across two runs of our own engine
        again = [tuple(r) for r in q.fn(spark, sf_dir).collect()]
        assert len(srows) == len(again)
        assert sorted(map(str, srows)) == sorted(map(str, again))
        return
    cur = ddb.execute(q.oracle)
    ocols = [d[0] for d in cur.description]
    orows = [tuple(r) for r in cur.fetchall()]
    assert sorted(scols) == sorted(ocols), f"{name}: column sets differ: {scols} vs {ocols}"
    s_cols, s_norm = normalize(scols, srows)
    o_cols, o_norm = normalize(ocols, orows)
    assert len(s_norm) == len(o_norm), f"{name}: row count {len(s_norm)} vs oracle {len(o_norm)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
