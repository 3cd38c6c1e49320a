"""Property-based check: the union-sort as-of join matches
pandas.merge_asof (an independent reference implementation) on random
keyed time series."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from callysto_spark.operators import asof_join

BASE = dt.datetime(2024, 1, 1)


@st.composite
def keyed_series(draw):
    n_left = draw(st.integers(1, 25))
    n_right = draw(st.integers(1, 25))
    keys = draw(st.lists(st.integers(0, 3), min_size=n_left, max_size=n_left))
    rkeys = draw(st.lists(st.integers(0, 3), min_size=n_right, max_size=n_right))
    lts = draw(st.lists(st.integers(0, 10_000), min_size=n_left, max_size=n_left))
    rts = draw(
        st.lists(st.integers(0, 10_000), min_size=n_right, max_size=n_right, unique=True)
    )
    left = [(i, keys[i], BASE + dt.timedelta(seconds=lts[i])) for i in range(n_left)]
    right = [(1000 + i, rkeys[i], BASE + dt.timedelta(seconds=rts[i])) for i in range(n_right)]
    return left, right


@settings(max_examples=12, deadline=None)
@given(keyed_series())
def test_asof_join_matches_merge_asof(data):
    from callysto_spark.session import get_spark

    spark = get_spark("asof-prop", cpus=4)
    left, right = data
    # dedup right to one row per (key, ts) — the operator's documented
    # determinism precondition (keep max id)
    rbest: dict[tuple, int] = {}
    for rid, k, ts in right:
        cur = rbest.get((k, ts))
        if cur is None or rid > cur:
            rbest[(k, ts)] = rid
    right = [(rid, k, ts) for (k, ts), rid in rbest.items()]

    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, rts timestamp")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rid"], strict=False
        ).collect()
    }

    lpdf = pd.DataFrame(left, columns=["lid", "k", "ts"]).sort_values("ts", kind="mergesort")
    rpdf = pd.DataFrame(right, columns=["rid", "k", "rts"]).sort_values("rts", kind="mergesort")
    merged = pd.merge_asof(
        lpdf, rpdf, left_on="ts", right_on="rts", by="k", direction="backward"
    )
    expect = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == expect
