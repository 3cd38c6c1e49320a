"""Empty-input parity: every registry query vs its oracle on zero-row
tables with the production schemas.

The pinned testdata is never empty, so the oracle harness and the
driver gate exercise no empty-group kernel, no fit-on-nothing index
build, no aggregate-over-zero-rows edge. A daily pipeline partition CAN
be empty; an operator that crashes or diverges there fails in
production first. This sweep caught (and now pins): the IVF scoring
expression was malformed when the centroid fit saw no vectors.

Known engine-level divergence, exempted and documented: Spark's
rollup/cube emit NO rows over empty input, while the SQL standard (and
DuckDB) emit the grand-total grouping set as one row of NULL keys with
count 0. Not buildable around without double-scanning the input for an
edge the driver never hits; the exemption asserts the exact observed
shape so any behavior change surfaces.
"""

from __future__ import annotations

import pytest

from callysto_spark.queries import load_all
from tests.test_oracle import normalize

REGISTRY = load_all()

# Spark rollup/cube vs SQL-standard grand-total row on empty input
GRAND_TOTAL_DIVERGENT = {"rollup_revenue", "cube_status_priority"}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    import pyarrow.parquet as pq

    from callysto_spark.tables import TABLES

    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tab = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet").slice(0, 0)
        pq.write_table(tab, str(base / f"{t}.parquet"))
    return str(base)


@pytest.fixture(scope="module")
def empty_ddb(empty_sf):
    import duckdb

    from callysto_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{empty_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_empty_input_parity(name, spark, empty_sf, empty_ddb):
    q = REGISTRY[name]
    sdf = q.fn(spark, empty_sf)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only BLAS rows: empty input must yield the empty result
        # (the in-plan cross-engine guard already ran inside collect)
        assert srows == [], f"{name}: non-empty output on empty tables: {srows[:3]}"
        return
    cur = empty_ddb.execute(q.oracle)
    ocols = [d[0] for d in cur.description]
    orows = [tuple(r) for r in cur.fetchall()]
    if name in GRAND_TOTAL_DIVERGENT:
        assert srows == [], f"{name}: Spark rollup/cube emit nothing on empty input"
        assert len(orows) == 1 and orows[0].count(None) >= len(orows[0]) - 2, (
            f"{name}: oracle emits the SQL-standard grand-total row, got {orows}"
        )
        return
    _, s_norm = normalize(list(sdf.columns), srows)
    _, o_norm = normalize(ocols, orows)
    assert s_norm == o_norm, (
        f"{name}: empty-input divergence spark={s_norm[:3]} oracle={o_norm[:3]} "
        f"({len(s_norm)} vs {len(o_norm)} rows)"
    )
