"""Table loader: per-session DataFrame cache + temp-view ownership."""

from __future__ import annotations

import os

from callysto_spark.tables import load

SF_A = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_B = "/root/testdata/sf0.01"


def test_load_caches_dataframe_per_sf(spark):
    a1 = load(spark, SF_A, "orders")["orders"]
    a2 = load(spark, SF_A, "orders")["orders"]
    assert a1 is a2, "repeat load must return the cached DataFrame object"
    b = load(spark, SF_B, "orders")["orders"]
    assert b is not a1, "different sf_dir must not share cache entries"


def test_temp_view_follows_latest_sf(spark):
    """spark.sql over a table name must always see the most recently
    loaded sf_dir, even though earlier loads are cached."""
    load(spark, SF_A, "orders")
    n_a = spark.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
    load(spark, SF_B, "orders")
    n_b = spark.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
    load(spark, SF_A, "orders")
    n_a2 = spark.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
    assert n_a != n_b, "test needs two sf dirs of different size"
    assert n_a2 == n_a, "view must re-register when an earlier sf reclaims the name"


def test_events_timestamp_conversion_cached(spark):
    """The cached events DataFrame must carry the ns→µs timestamp
    conversion (not the raw bigint column)."""
    e1 = load(spark, SF_A, "events")["events"]
    assert dict(e1.dtypes)["ts"] == "timestamp"
    e2 = load(spark, SF_A, "events")["events"]
    assert e2 is e1


def test_loader_normalizes_all_timestamps_at_every_sf():
    """Drift guard (r3 lesson: testdata timestamp encoding changed
    between rounds and broke consumers): whatever parquet encoding the
    driver writes — TIMESTAMP(NANOS) read as bigint, or plain micros
    read as TIMESTAMP_NTZ — the loader must surface session-zone
    ``timestamp`` columns, never timestamp_ntz and never a leftover
    bigint epoch, at every shipped scale factor."""
    import os

    from callysto_spark.session import get_spark

    spark = get_spark("drift-guard", cpus=4)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        for name, df in load(spark, sf_dir).items():
            for col, dtype in df.dtypes:
                assert dtype != "timestamp_ntz", f"{sf}/{name}.{col} leaked NTZ"
                if col in ("ts",) or col.endswith("date"):
                    assert dtype in ("timestamp", "date"), (
                        f"{sf}/{name}.{col} unexpected dtype {dtype}"
                    )


def test_bigint_epoch_unit_inference(tmp_path):
    """The ns-as-long branch must infer the epoch unit from magnitude:
    ns, µs, ms, and s encodings of the same instant all load as the
    same timestamp."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from callysto_spark.session import get_spark

    spark = get_spark("unit-infer", cpus=2)
    want = dt.datetime(2024, 3, 1, 12, 30, 45)
    epoch_us = int(want.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    for unit, value in [
        ("ns", epoch_us * 1_000),
        ("us", epoch_us),
        ("ms", epoch_us // 1_000),
        ("s", epoch_us // 1_000_000),
    ]:
        d = tmp_path / unit
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": pa.array([1], pa.int64()), "ts": pa.array([value], pa.int64())}),
            str(d / "events.parquet"),
        )
        got = load(spark, str(d), "events")["events"].collect()[0]["ts"]
        assert got.replace(tzinfo=None) == want, f"{unit}: {got}"


def test_bigint_epoch_unit_inference_null_first_row(tmp_path):
    """A NULL leading value must not derail unit inference: the probe
    aggregates max(abs()) over non-null rows, so the unit comes from the
    real values (a first()-based probe read the NULL as 0 → 'seconds' →
    ns values multiplied by 1e6, overflowing LONG)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from callysto_spark.session import get_spark

    spark = get_spark("unit-infer-null", cpus=2)
    want = dt.datetime(2024, 3, 1, 12, 30, 45)
    epoch_ns = int(want.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1_000
    d = tmp_path / "ns_null"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([None, epoch_ns], pa.int64()),
            }
        ),
        str(d / "events.parquet"),
    )
    rows = {r["event_id"]: r["ts"] for r in load(spark, str(d), "events")["events"].collect()}
    assert rows[1] is None
    assert rows[2].replace(tzinfo=None) == want


def test_load_raises_window_group_limit_threshold_on_foreign_session(spark):
    """The correctness driver runs queries on its OWN plain session, not
    get_spark's. load() must raise windowGroupLimitThreshold there too,
    or the sketches' k=1024 bounded top-k ships unpruned exchanges
    (InferWindowGroupLimit skips k above the threshold, default 1000)."""
    key = "spark.sql.optimizer.windowGroupLimitThreshold"
    spark.conf.set(key, "1000")  # simulate a session without engine confs
    try:
        load(spark, SF_A, "region")
        assert int(spark.conf.get(key)) >= 64 * 1024
    finally:
        spark.conf.set(key, str(64 * 1024))
