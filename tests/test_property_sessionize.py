"""Property-based check: gap sessionization matches a pure-Python
reference on random per-user event streams, under BOTH timestamp
encodings (LTZ and NTZ) — the encoding drift that broke round 3."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from callysto_spark.operators import sessionize

BASE = dt.datetime(2024, 1, 1)


def reference_sessions(rows, gap_seconds):
    """Per-key 1-based session ids: a gap > gap_seconds starts a new one."""
    out = {}
    by_key: dict = {}
    for key, ts in rows:
        by_key.setdefault(key, []).append(ts)
    for key, tss in by_key.items():
        sid = 0
        prev = None
        for ts in sorted(tss):
            if prev is None or (ts - prev).total_seconds() > gap_seconds:
                sid += 1
            out[(key, ts)] = sid
            prev = ts
    return out


@st.composite
def event_stream(draw):
    n = draw(st.integers(1, 40))
    keys = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    # distinct per-key offsets keep (key, ts) a unique row id, matching
    # the operator's documented total-order requirement
    offs = draw(st.lists(st.integers(0, 5_000), min_size=n, max_size=n, unique=True))
    gap = draw(st.sampled_from([1, 60, 600]))
    return [(keys[i], BASE + dt.timedelta(seconds=offs[i])) for i in range(n)], gap


@settings(max_examples=10, deadline=None)
@given(event_stream())
def test_sessionize_matches_reference_both_encodings(data):
    from callysto_spark.session import get_spark

    spark = get_spark("sess-prop", cpus=4)
    rows, gap = data
    want = reference_sessions(rows, gap)
    for enc in ("timestamp", "timestamp_ntz"):
        df = spark.createDataFrame(rows, "k long, ts timestamp").withColumn(
            "ts", F.col("ts").cast(enc)
        )
        got = {
            (r["k"], r["ts"].replace(tzinfo=None)): r["session_id"]
            for r in sessionize(df, "k", "ts", gap_seconds=gap).collect()
        }
        assert got == want, f"mismatch under {enc} (gap={gap})"
