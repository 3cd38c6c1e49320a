"""App framework tests: agents, flows, stateful table agents, recovery
(reference workloads: basic.rs counter, inmemory.rs odd/even — SURVEY §5
F1/F2 fixtures)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from callysto_spark.app import App
from callysto_spark.sources import SourceSpec
from callysto_spark.tables import load


@pytest.fixture()
def app(spark, tmp_path):
    a = App("test_app", spark=spark, checkpoint_root=str(tmp_path / "ckpt"))
    yield a
    a.stop()


def test_agent_counts_messages(app, spark, sf_dir):
    """Reference basic.rs: count messages into app state."""
    events = load(spark, sf_dir, "events")["events"]

    @app.agent("counter", events)
    def counter(df, ctx):
        ctx.state["n"] = ctx.state.get("n", 0) + df.count()
        ctx.commit(None)  # parity no-op

    app.run(await_termination=False)
    assert app.state["n"] == events.count()


def test_flow_transform_to_view(app, spark, sf_dir):
    events = load(spark, sf_dir, "events")["events"]

    @app.flow("purchases", events, collect_to="purchase_view")
    def purchases(df):
        return df.filter(F.col("event_type") == "purchase").select("event_id")

    app.run(await_termination=False)
    expect = events.filter(F.col("event_type") == "purchase").count()
    assert spark.table("purchase_view").count() == expect


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_table_agent_parity_counts_and_recovery(spark, tmp_path, sf_dir, provider):
    """Reference inmemory.rs odd/even tables + runtime/recovery.rs:
    restart must resume state from the checkpoint — on both state-store
    providers (RocksDB is the at-scale one; reference stores/rocksdb.rs)."""
    from callysto_spark.config import StateStoreConfig

    prev_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    out_dir = str(tmp_path / "out")

    def make_app():
        a = App(
            "test_state",
            spark=spark,
            checkpoint_root=str(tmp_path / "ckpt"),
            state_store=StateStoreConfig(provider=provider),
        )
        src = SourceSpec.parquet_stream(
            str(stream_dir),
            schema="event_id long, ts long, user_id long, event_type string, value double, props string",
        )
        stream = src.load(spark).withColumn(
            "parity", F.when(F.col("event_id") % 2 == 0, "even").otherwise("odd")
        )
        table = a.table("parity_counts", key_schema="parity string", value_schema="cnt long")
        table.output_schema = "parity string, cnt long"

        @a.table_agent(
            "parity_agent",
            stream,
            table,
            sink=lambda b: b.write.mode("append").parquet(out_dir),
        )
        def parity_agent(key, pdf, state):
            prev = state.get()
            cnt = (prev[0] if prev else 0) + len(pdf)
            state.set(cnt)
            return pd.DataFrame({"parity": [key[0]], "cnt": [cnt]})

        return a

    a1 = make_app()
    a1.run(await_termination=True, timeout=120)
    a1.stop()
    first = {r["parity"]: r["cnt"] for r in spark.read.parquet(out_dir).collect()}
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert first == {"even": n // 2, "odd": n // 2}

    # restart with more data: state must continue, not reset
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "b.parquet")
    a2 = make_app()
    a2.run(await_termination=True, timeout=120)
    a2.stop()
    rows = spark.read.parquet(out_dir).groupBy("parity").agg(F.max("cnt").alias("cnt")).collect()
    assert {r["parity"]: r["cnt"] for r in rows} == {"even": n, "odd": n}
    if prev_provider is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev_provider)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_task_timer_service_lifecycle(app, spark):
    import time

    ticks = []

    @app.task
    def startup(ctx):
        ctx.state["started"] = True

    @app.timer(0.2)
    def tick(ctx):
        ticks.append(1)

    @app.service
    def svc(ctx, stop_event):
        ctx.state["svc"] = "running"
        stop_event.wait()
        ctx.state["svc"] = "stopped"

    app.run(await_termination=False)
    time.sleep(1.0)
    assert app.state["started"] is True
    assert app.state["svc"] == "running"
    assert len(ticks) >= 2
    app.stop()
    time.sleep(0.3)
    assert app.state["svc"] == "stopped"


def _has_protobuf() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_table_agent_tws_builds_plan(spark, tmp_path, sf_dir):
    """The tws binding must build a valid streaming plan with the
    declared output schema regardless of environment (execution needs
    google.protobuf — runtime-gated, like the connector jars)."""
    from callysto_spark.streaming.state import CTable
    from callysto_spark.streaming.state_v2 import bind_table_processor

    src = SourceSpec.parquet_stream(
        f"{tmp_path}",  # never started — plan-level only
        schema="event_id long, parity string",
    )
    table = CTable(name="t", key_schema="parity string", value_schema="cnt long")
    table.output_schema = "parity string, cnt long"
    build = bind_table_processor(table, lambda k, pdf, st: None)
    out = build(src.load(spark))
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["parity", "cnt"]


def test_tws_timer_ttl_plan_and_processor_logic(spark, tmp_path):
    """Environment-independent tws coverage: (a) the timeMode string
    reaches the analyzed streaming plan (ProcessingTime timers); (b) the
    StatefulProcessor's logic — TTL wiring at init, per-batch state
    accumulation, timer arming, expired-timer callback — exercised
    directly with fake state handles (the streaming Python runner needs
    google.protobuf, absent in this image; execution parity is the
    skipped test below)."""
    from callysto_spark.streaming.state import CTable
    from callysto_spark.streaming.state_v2 import bind_table_processor

    stream_dir = tmp_path / "plan_src"
    stream_dir.mkdir()
    src = SourceSpec.parquet_stream(str(stream_dir), schema="event_id long, parity string")
    table = CTable(name="cnts", key_schema="parity string", value_schema="cnt long")
    table.output_schema = "parity string, cnt long"

    armed: list[int] = []

    def closure(key, pdf, state):
        if state.timed_out:
            state.delete()
            return pd.DataFrame({"parity": [key[0]], "cnt": [-1]})
        prev = state.get()
        cnt = (prev[0] if prev else 0) + len(pdf)
        state.set(cnt)
        state.set_timeout_ms(5_000)
        return pd.DataFrame({"parity": [key[0]], "cnt": [cnt]})

    build = bind_table_processor(table, closure, timeout="ProcessingTimeTimeout", ttl_ms=60_000)

    # (a) plan level: timeMode lands in the analyzed plan
    out = build(src.load(spark))
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["parity", "cnt"]
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "TransformWithState" in plan and "ProcessingTime" in plan

    # (b) processor logic with fake handles
    class FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    class FakeHandle:
        def __init__(self):
            self.ttl = None
            self.vs = FakeValueState()
            self.timers: list[int] = []  # tws contract: timers ACCUMULATE

        def getValueState(self, name, schema, ttlDurationMs=None):
            assert name == "cnts"
            self.ttl = ttlDurationMs
            return self.vs

        def registerTimer(self, ts):
            armed.append(ts)
            self.timers.append(ts)

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, ts):
            self.timers.remove(ts)

    class FakeTimerValues:
        def getCurrentProcessingTimeInMs(self):
            return 1_000_000

    proc = build.processor_cls()
    handle = FakeHandle()
    proc.init(handle)
    assert handle.ttl == 60_000, "ttl_ms must reach getValueState"

    batches = list(
        proc.handleInputRows(("odd",), iter([pd.DataFrame({"event_id": [1, 3, 5]})]), FakeTimerValues())
    )
    assert len(batches) == 1 and batches[0]["cnt"].tolist() == [3]
    assert handle.vs.v == (3,), "state must hold the accumulated count"
    assert armed == [1_005_000], "set_timeout_ms arms now+5s"

    # second batch accumulates on existing state
    batches = list(
        proc.handleInputRows(("odd",), iter([pd.DataFrame({"event_id": [7]})]), FakeTimerValues())
    )
    assert batches[0]["cnt"].tolist() == [4]
    # re-arming every batch must REPLACE the pending timer, not stack a
    # second one (GroupState.setTimeoutDuration parity; tws registerTimer
    # alone would accumulate and fire N eviction callbacks)
    assert handle.timers == [1_005_000], f"pending timers stacked: {handle.timers}"

    # timer expiry: closure sees timed_out=True, clears state, emits -1
    expired = list(proc.handleExpiredTimer(("odd",), FakeTimerValues(), None))
    assert expired[0]["cnt"].tolist() == [-1]
    assert handle.vs.v is None, "closure's delete() must clear the value state"


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python runner requires google.protobuf, "
    "not shipped in this image (same environment gating as the avro/kafka jars)",
)
def test_table_agent_tws_parity_counts_and_recovery(spark, tmp_path, sf_dir):
    """The same odd/even workload on the transformWithState binding
    (api='tws', Spark 4 StatefulProcessor + RocksDB provider): identical
    closure, identical results, checkpoint recovery across restart."""
    from callysto_spark.config import StateStoreConfig

    prev_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    out_dir = str(tmp_path / "out")

    def make_app():
        a = App(
            "tws_state",
            spark=spark,
            checkpoint_root=str(tmp_path / "ckpt"),
            state_store=StateStoreConfig(provider="rocksdb"),
        )
        src = SourceSpec.parquet_stream(
            str(stream_dir),
            schema="event_id long, ts long, user_id long, event_type string, value double, props string",
        )
        stream = src.load(spark).withColumn(
            "parity", F.when(F.col("event_id") % 2 == 0, "even").otherwise("odd")
        )
        table = a.table("tws_counts", key_schema="parity string", value_schema="cnt long")
        table.output_schema = "parity string, cnt long"

        @a.table_agent(
            "tws_agent",
            stream,
            table,
            api="tws",
            sink=lambda b: b.write.mode("append").parquet(out_dir),
        )
        def tws_agent(key, pdf, state):
            prev = state.get()
            cnt = (prev[0] if prev else 0) + len(pdf)
            state.set(cnt)
            return pd.DataFrame({"parity": [key[0]], "cnt": [cnt]})

        return a

    try:
        a1 = make_app()
        a1.run(await_termination=True, timeout=120)
        a1.stop()
        n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        first = {r["parity"]: r["cnt"] for r in spark.read.parquet(out_dir).collect()}
        assert first == {"even": n // 2, "odd": n // 2}

        shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "b.parquet")
        a2 = make_app()
        a2.run(await_termination=True, timeout=120)
        a2.stop()
        rows = spark.read.parquet(out_dir).groupBy("parity").agg(F.max("cnt").alias("cnt")).collect()
        assert {r["parity"]: r["cnt"] for r in rows} == {"even": n, "odd": n}
    finally:
        if prev_provider is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev_provider)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_service_dependency_start_order(app, spark):
    """Reference starts a service's dependencies before the service
    itself (`types/service.rs:146-151`)."""

    def db(ctx, stop_event):
        stop_event.wait()

    def cache(ctx, stop_event):
        stop_event.wait()

    def api(ctx, stop_event):
        stop_event.wait()

    # register intentionally out of dependency order
    app.service(api, deps=[cache, db])
    app.service(cache, deps=[db])
    app.service(db)
    app.run(await_termination=False)
    order = app._service_start_order
    assert order.index("db") < order.index("cache") < order.index("api")
    app.stop()


def test_supervision_tracks_foreachbatch_queries(app, spark, tmp_path, sf_dir):
    """Every started query must carry a name and an owner mapping —
    the silent-failure path was foreachBatch queries with name=None."""
    import shutil

    stream_dir = tmp_path / "s"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    src = SourceSpec.parquet_stream(
        str(stream_dir),
        schema="event_id long, ts long, user_id long, event_type string, value double, props string",
    )

    @app.agent("fb_agent", src)
    def fb_agent(df, ctx):
        ctx.state["rows"] = ctx.state.get("rows", 0) + df.count()

    app.run(await_termination=True, timeout=120)
    assert app.state["rows"] > 0
    for q in app.queries:
        assert q.name is not None, "foreachBatch query must have a queryName"
        assert app._query_owner.get(str(q.id)) == "fb_agent"
    app.stop_agent("fb_agent")
    assert app.queries == []


def test_table_agent_processing_time_timeout(spark, tmp_path, sf_dir):
    """Processing-time TTL: state armed with a short timeout is handed
    back to the closure (timed_out=True, empty batch) when a later
    micro-batch runs past the deadline — the eviction surface the
    reference's tables lack."""
    import shutil
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from callysto_spark.app import App
    from callysto_spark.sources import SourceSpec

    stream_dir = tmp_path / "s"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    out_dir = str(tmp_path / "out")

    def make_app():
        a = App("ttl_app", spark=spark, checkpoint_root=str(tmp_path / "ckpt"))
        src = SourceSpec.parquet_stream(
            str(stream_dir),
            schema="event_id long, ts long, user_id long, event_type string, value double, props string",
        )
        stream = src.load(spark).withColumn(
            "parity", F.when(F.col("event_id") % 2 == 0, "even").otherwise("odd")
        )
        table = a.table("ttl_counts", key_schema="parity string", value_schema="cnt long")
        table.output_schema = "parity string, cnt long"

        @a.table_agent(
            "ttl_agent",
            stream,
            table,
            timeout="ProcessingTimeTimeout",
            sink=lambda b: b.write.mode("append").parquet(out_dir),
        )
        def agent(key, pdf, state):
            if state.timed_out:
                state.delete()  # evict → emit tombstone count -1
                return pd.DataFrame({"parity": [key[0]], "cnt": [-1]})
            prev = state.get()
            cnt = (prev[0] if prev else 0) + len(pdf)
            state.set(cnt)
            state.set_timeout_ms(100)
            return pd.DataFrame({"parity": [key[0]], "cnt": [cnt]})

        return a

    # availableNow keeps the query alive while processing-time timers are
    # pending, so awaitTermination times out — bound it tightly and stop.
    a1 = make_app()
    a1.run(await_termination=True, timeout=25)
    a1.stop()
    _time.sleep(0.5)  # let the processing-time deadline pass
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "b.parquet")
    a2 = make_app()
    a2.run(await_termination=True, timeout=25)
    a2.stop()
    rows = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    # run 2's batch first fires the timeout callbacks (tombstones), then
    # processes the new file against the now-deleted state
    assert ("even", -1) in rows and ("odd", -1) in rows
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert ("even", n // 2) in rows  # run 1


def test_tws_timer_firing_order_and_ttl_eviction(spark):
    """Runner-less semantics check for the tws binding: (a) expired
    timers fire in timestamp order across keys (Spark's documented timer
    contract); (b) TTL-evicted state reads as absent in the next batch
    (ValueState ttl expires per-update), and a post-eviction write
    re-arms the TTL clock. Simulated with a deterministic fake runtime —
    the real runner needs google.protobuf, absent in this image."""
    from callysto_spark.streaming.state import CTable
    from callysto_spark.streaming.state_v2 import bind_table_processor

    table = CTable(name="t", key_schema="k string", value_schema="cnt long")
    table.output_schema = "k string, cnt long"

    def closure(key, pdf, state):
        if state.timed_out:
            return pd.DataFrame({"k": [key[0]], "cnt": [-1]})
        prev = state.get()
        cnt = (prev[0] if prev else 0) + len(pdf)
        state.set(cnt)
        state.set_timeout_ms(1_000 if key[0] == "b" else 3_000)
        return pd.DataFrame({"k": [key[0]], "cnt": [cnt]})

    build = bind_table_processor(table, closure, timeout="ProcessingTimeTimeout", ttl_ms=2_000)

    class FakeRuntime:
        """Per-key ValueState with TTL + a global timer queue, modeled on
        the documented transformWithState semantics: ttl measured from
        the last update; expired timers delivered oldest-first."""

        def __init__(self, ttl_ms):
            self.now = 0
            self.ttl = ttl_ms
            self.values: dict[str, tuple] = {}
            self.written: dict[str, int] = {}
            self.timers: list[tuple[int, str]] = []
            self.current_key = None

        def handle_for(self, proc):
            rt = self

            class VS:
                def exists(self):
                    k = rt.current_key
                    return k in rt.values and rt.now - rt.written[k] < rt.ttl

                def get(self):
                    return rt.values[rt.current_key]

                def update(self, v):
                    rt.values[rt.current_key] = v
                    rt.written[rt.current_key] = rt.now

                def clear(self):
                    rt.values.pop(rt.current_key, None)

            class Handle:
                def getValueState(self, name, schema, ttlDurationMs=None):
                    assert ttlDurationMs == rt.ttl
                    return VS()

                def registerTimer(self, ts):
                    rt.timers.append((ts, rt.current_key))

                def listTimers(self):
                    return [ts for ts, k in rt.timers if k == rt.current_key]

                def deleteTimer(self, ts):
                    rt.timers.remove((ts, rt.current_key))

            return Handle()

        class TV:
            def __init__(self, now):
                self._n = now

            def getCurrentProcessingTimeInMs(self):
                return self._n

        def feed(self, proc, key, n_rows):
            self.current_key = key
            return list(
                proc.handleInputRows((key,), iter([pd.DataFrame({"x": range(n_rows)})]), self.TV(self.now))
            )

        def advance_and_fire(self, proc, to_ms):
            self.now = to_ms
            due = sorted(t for t in self.timers if t[0] <= to_ms)
            self.timers = [t for t in self.timers if t[0] > to_ms]
            fired = []
            for ts, key in due:  # oldest-first, the documented order
                self.current_key = key
                for out in proc.handleExpiredTimer((key,), self.TV(self.now), None):
                    fired.append((key, out["cnt"].tolist()))
            return fired

    rt = FakeRuntime(ttl_ms=2_000)
    proc = build.processor_cls()
    proc.init(rt.handle_for(proc))

    rt.feed(proc, "a", 2)   # arms timer at 3000
    rt.feed(proc, "b", 1)   # arms timer at 1000
    # (a) firing order: b's 1000 precedes a's 3000 even though a armed first
    fired = rt.advance_and_fire(proc, 3_500)
    assert [k for k, _ in fired] == ["b", "a"], "timers must fire in timestamp order"

    # (b) TTL eviction: at t=3500, a's state (written t=0, ttl 2000) has
    # expired — the next batch must see a fresh counter, not 2+1
    out = rt.feed(proc, "a", 1)
    assert out[0]["cnt"].tolist() == [1], "TTL-evicted state must read as absent"
    # the re-write re-arms the ttl clock: still live inside the window
    rt.now = 4_500
    out = rt.feed(proc, "a", 1)
    assert out[0]["cnt"].tolist() == [2], "post-eviction write restarts the TTL window"


def test_tws_state_value_schema_encoding_roundtrip(spark):
    """Runner-less closure of the tws gate: the one runner-dependent
    surface not otherwise covered is the encoding of what
    TableStateV2.set() actually STORES against the table's declared
    value_schema (the runner serializes that stored tuple, per that
    schema). Drive the real TableStateV2 set/get path into a recording
    state handle, then push the STORED representation through Spark's
    schema-driven encoding — a field-order/type/shape mismatch between
    the shim and the declared schema fails here rather than only on a
    protobuf-enabled cluster."""
    import datetime as dt

    from callysto_spark.streaming.state_v2 import TableStateV2

    class RecordingValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    cases = [
        ("cnt long", (42,)),
        ("cnt long, name string, score double", (7, "abc", 1.25)),
        ("ts timestamp, flag boolean", (dt.datetime(2024, 3, 1, 12, 0, 5), True)),
        ("xs array<long>, m map<string,long>", ([1, 2, 3], {"a": 1})),
        ("nested struct<a:long,b:string>", ((5, "in"),)),
    ]
    for schema, value in cases:
        vs = RecordingValueState()
        ts = TableStateV2(vs, handle=None, timer_values=None)
        ts.set(*value)
        stored = vs.v
        assert isinstance(stored, tuple), "set() must store a positional tuple"
        assert ts.get() == value, f"{schema}: get() must return what set() stored"
        # the runner would serialize `stored` against the declared
        # value_schema: prove that encoding round-trips value-identically
        got = tuple(spark.createDataFrame([stored], schema=schema).collect()[0])
        norm = tuple(tuple(v) if isinstance(v, tuple) else v for v in got)
        assert norm == value, f"{schema}: {norm} != {value}"
        ts.delete()
        assert not ts.exists and ts.get() is None


def test_foreach_batch_adapter_without_signature_keeps_batch_id():
    """Sinks whose signature inspect can't see (C-callables, exotic
    wrappers) must still get batch_id when they accept it — dropping it
    from an exactly-once wrapper silently voids the replay-dedup
    contract. The adapter probes the 2-arg form first and locks
    whichever arity works (app.py::_as_foreach_batch)."""
    from callysto_spark.app import _as_foreach_batch

    class _NoSig:
        # accessing __signature__ raises → inspect.signature() fails →
        # the adapter's unknown-arity fallback path
        @property
        def __signature__(self):
            raise ValueError("signature unavailable")

    class TwoArg(_NoSig):
        def __init__(self):
            self.seen = []

        def __call__(self, df, batch_id):
            self.seen.append(batch_id)

    class OneArg(_NoSig):
        def __init__(self):
            self.seen = []

        def __call__(self, df):
            self.seen.append("no-id")

    two = TwoArg()
    adapted = _as_foreach_batch(two)
    adapted("df", 7)
    adapted("df", 8)
    assert two.seen == [7, 8], "2-arg sink must receive real batch ids"

    one = OneArg()
    adapted = _as_foreach_batch(one)
    adapted("df", 7)  # first call probes 2-arg, falls back once
    adapted("df", 8)  # locked to 1-arg: no second probe
    assert one.seen == ["no-id", "no-id"]


def test_foreach_batch_adapter_c_sink_internal_typeerror_not_retried():
    """A C-implemented sink that raises TypeError INTERNALLY adds no
    Python traceback frame — indistinguishable from a bind failure by
    frame depth alone, and a retry would re-execute its side effects
    within one batch. The probe therefore also requires the message to
    read like CPython's argument-count complaints before falling back.

    `getattr` is a real specimen: inspect.signature() fails on it (so
    the adaptive path engages) and getattr('df', 7) raises a C-level
    TypeError ('attribute name must be string') with tb_next=None. The
    adapter must surface THAT error, not retry 1-arg (whose distinct
    'expected at least 2 arguments' error would mask the real one).
    `dir` is the genuine-bind-failure control: 'expected at most 1
    argument, got 2' IS argument-count wording, so the adapter falls
    back and locks 1-arg."""
    import pytest

    from callysto_spark.app import _as_foreach_batch

    adapted = _as_foreach_batch(getattr)
    with pytest.raises(TypeError, match="attribute name must be string"):
        adapted("df", 7)

    adapted = _as_foreach_batch(dir)
    assert adapted("df", 0) == dir("df")  # fell back to 1-arg
    assert adapted("df", 1) == dir("df")  # locked: no re-probe


def test_agent_sink_receives_batch_id_for_exactly_once(spark, tmp_path, sf_dir):
    """The exactly-once wrappers are Callable[[DataFrame, int], None] —
    batch_id is their replay-dedup key. Wiring idempotent(...) as a
    table_agent sink must deliver it (dropping it would TypeError, or
    worse, silently void the idempotency contract)."""
    from callysto_spark.sinks.exactly_once import idempotent

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    out_dir = str(tmp_path / "out")
    marker_dir = str(tmp_path / "markers")
    seen_ids: list[int] = []

    def write(df, batch_id):
        seen_ids.append(batch_id)
        df.write.mode("append").parquet(out_dir)

    a = App("test_eos_sink", spark=spark, checkpoint_root=str(tmp_path / "ckpt"))
    src = SourceSpec.parquet_stream(
        str(stream_dir),
        schema="event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    stream = src.load(spark).withColumn(
        "parity", F.when(F.col("event_id") % 2 == 0, "even").otherwise("odd")
    )
    table = a.table("eos_counts", key_schema="parity string", value_schema="cnt long")
    table.output_schema = "parity string, cnt long"

    @a.table_agent("eos_agent", stream, table, sink=idempotent(write, marker_dir))
    def eos_agent(key, pdf, state):
        prev = state.get()
        cnt = (prev[0] if prev else 0) + len(pdf)
        state.set(cnt)
        return pd.DataFrame({"parity": [key[0]], "cnt": [cnt]})

    a.run(await_termination=True, timeout=120)
    a.stop()
    assert seen_ids, "sink never invoked"
    markers = sorted(os.listdir(marker_dir))
    assert markers == [f"batch-{i}.done" for i in sorted(set(seen_ids))], (
        "idempotent() must see the real batch ids"
    )
    assert spark.read.parquet(out_dir).count() > 0


def test_memory_sink_stateful_agent_survives_rerun(spark, tmp_path, sf_dir):
    """Stateful agents WITHOUT a sink use the memory format, which
    refuses checkpoint recovery — a persistent checkpointLocation made
    every rerun throw AnalysisException. Reruns must start clean
    instead (the memory sink's documented contract: test surface, no
    durability)."""
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")

    def make_app():
        a = App("test_mem_rerun", spark=spark, checkpoint_root=str(tmp_path / "ckpt"))
        src = SourceSpec.parquet_stream(
            str(stream_dir),
            schema="event_id long, ts long, user_id long, event_type string, value double, props string",
        )
        stream = src.load(spark).withColumn(
            "parity", F.when(F.col("event_id") % 2 == 0, "even").otherwise("odd")
        )
        table = a.table("mem_counts", key_schema="parity string", value_schema="cnt long")
        table.output_schema = "parity string, cnt long"

        @a.table_agent("mem_agent", stream, table)  # no sink → memory
        def mem_agent(key, pdf, state):
            prev = state.get()
            cnt = (prev[0] if prev else 0) + len(pdf)
            state.set(cnt)
            return pd.DataFrame({"parity": [key[0]], "cnt": [cnt]})

        return a

    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for _ in range(2):  # second run used to die on checkpoint recovery
        a = make_app()
        a.run(await_termination=True, timeout=120)
        got = {
            r["parity"]: r["cnt"]
            for r in spark.sql("SELECT * FROM test_mem_rerun_mem_agent").collect()
        }
        a.stop()
        assert got == {"even": n // 2, "odd": n // 2}, "fresh state each run"


def test_auto_restart_survives_crash_and_run_returns(app, spark, tmp_path, sf_dir):
    """L9 crash-restart, executed end to end: an agent whose foreachBatch
    raises once must (a) NOT propagate out of run(await_termination=True)
    while supervision is on — awaitTermination() re-raises crashed-query
    exceptions, so an unsupervised await would abort the app even as the
    monitor restarts it — and (b) be restarted from its checkpoint so the
    batch is reprocessed and state lands."""
    import shutil

    from callysto_spark.sources import SourceSpec

    stream_dir = tmp_path / "s"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    src = SourceSpec.parquet_stream(
        str(stream_dir),
        schema="event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    crashes = {"n": 0}

    @app.agent("flaky", src)
    def flaky(df, ctx):
        if crashes["n"] == 0:
            crashes["n"] += 1
            raise RuntimeError("boom (injected once)")
        ctx.state["rows"] = ctx.state.get("rows", 0) + df.count()

    app.enable_auto_restart(poll_seconds=0.2, max_restarts=3)
    app.run(await_termination=True, timeout=120)  # must NOT raise
    assert crashes["n"] == 1
    assert app.state.get("rows", 0) > 0, "restarted agent must reprocess the batch"
    assert app.failures and app.failures[0][0] == "flaky"
    assert "boom" in app.failures[0][1]


def test_auto_restart_slow_start_holds_run_open(app, spark, tmp_path, sf_dir):
    """The supervised-await gating under a SLOW restart: starting a
    streaming query can take multi-second synchronous work inside
    _start_agent, during which no query is active. run()'s poll loop
    must count an in-flight restart (_restarting > 0) as activity —
    otherwise it concludes 'all idle' past the grace window and returns
    while the replacement query is still being built, tearing down
    around a half-started agent. Injects a 2-second delay into the
    RESTART invocation of _start_agent (grace is 0.6s) and requires the
    reprocessed batch to have landed by the time run() returns."""
    import shutil
    import time

    from callysto_spark.sources import SourceSpec

    stream_dir = tmp_path / "s"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    src = SourceSpec.parquet_stream(
        str(stream_dir),
        schema="event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    crashes = {"n": 0}

    @app.agent("slowflaky", src)
    def slowflaky(df, ctx):
        if crashes["n"] == 0:
            crashes["n"] += 1
            raise RuntimeError("boom (injected once)")
        ctx.state["rows"] = ctx.state.get("rows", 0) + df.count()

    real_start = app._start_agent
    starts = {"n": 0}

    def slow_start(agent):
        starts["n"] += 1
        if starts["n"] > 1:  # delay only the restart path, not initial start
            time.sleep(2.0)
        return real_start(agent)

    app._start_agent = slow_start
    app.enable_auto_restart(poll_seconds=0.3, max_restarts=3)
    app.run(await_termination=True, timeout=120)
    assert crashes["n"] == 1
    assert starts["n"] >= 2, "monitor never attempted the restart"
    assert app.state.get("rows", 0) > 0, (
        "run() returned before the delayed restart delivered the batch — "
        "the in-flight-restart gate failed"
    )


def test_enable_auto_restart_idempotent(app):
    """Calling enable_auto_restart twice must not spawn a second
    monitor thread: duplicate monitors race on the same crashed query
    (double-restart) and keep separate restart budgets, and their
    unlocked interleavings are exactly the lost-count hazard the
    restart lock exists to prevent."""
    n0 = len(app._threads)
    app.enable_auto_restart(poll_seconds=0.5)
    app.enable_auto_restart(poll_seconds=0.5)
    assert len(app._threads) == n0 + 1, "second call must be a no-op"
    assert app._supervised


def test_stop_agent_wins_over_restart_and_rearms(app, spark, tmp_path, sf_dir):
    """A stop_agent() racing a crash must not be resurrected by the
    monitor (_stopped_agents is checked before restart), and an explicit
    run_agent() re-arms supervision for that agent."""
    import shutil

    from callysto_spark.sources import SourceSpec

    stream_dir = tmp_path / "s"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    src = SourceSpec.parquet_stream(
        str(stream_dir),
        schema="event_id long, ts long, user_id long, event_type string, value double, props string",
    )

    @app.agent("once", src)
    def once(df, ctx):
        ctx.state["rows"] = ctx.state.get("rows", 0) + df.count()

    app.run(await_termination=True, timeout=120)
    app.stop_agent("once")
    assert "once" in app._stopped_agents
    app.run_agent("once")  # explicit start re-arms
    assert "once" not in app._stopped_agents
    app.stop_agent("once")
    app.stop_agent("once")  # idempotent: second stop must not raise


def test_aggregating_flow_update_mode(app, spark, tmp_path, sf_dir):
    """A flow whose transform contains a streaming aggregation needs
    output_mode='update' — append mode rejects unwatermarked streaming
    aggs at start, so the declarative flow surface must expose the knob."""
    import shutil

    from pyspark.sql import functions as F

    from callysto_spark.sources import SourceSpec

    stream_dir = tmp_path / "s"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "a.parquet")
    src = SourceSpec.parquet_stream(
        str(stream_dir),
        schema="event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    seen: list = []
    app.flow(
        "counts",
        src,
        transform=lambda df: df.groupBy("event_type").agg(F.count("*").alias("n")),
        sink=lambda batch: seen.append(batch.count()),
        output_mode="update",
    )
    app.run(await_termination=True, timeout=120)
    assert seen and seen[0] > 0
