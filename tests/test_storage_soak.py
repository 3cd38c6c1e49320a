"""Single-session storage soak over the FULL query registry (r12
verdict item 6).

A long-lived session running many registry queries (the driver's
correctness walk, the rotation harness, a real user's notebook) must
not accumulate persisted datasets: every operator-internal persist /
localCheckpoint is either released before its operator returns or
registered with ``release_transient_persists`` and reclaimed at the
next registry-query boundary (``queries/__init__.py`` wrapper). A leak
here is invisible at sf0.001 and fatal at 100x corpus residency — the
executor storage pool fills with dead shingle tables and CC label
checkpoints until real working sets spill.

Two probes, both JVM-side truth rather than Python bookkeeping:
- ``sc.getPersistentRDDs`` — RDD-level persists (localCheckpoint
  blocks: connected_components' label/star checkpoints);
- ``sharedState().cacheManager()`` emptiness — Dataset-level persists
  (transient_persist: dedup shingle/banded tables, global_rank).

The assertion is RETURN-TO-BASELINE after each query's boundary sweep,
not absolute-zero: the session fixture is shared with other tests that
may legitimately hold caches when this test starts.
"""

from __future__ import annotations

from callysto_spark.operators.util import release_transient_persists
from callysto_spark.queries import load_all



import pytest

pytestmark = pytest.mark.slow  # gated: see pytest.ini / conftest (r16 verify-budget fix)

def _storage_counts(spark) -> tuple[int, bool]:
    """(persistent-RDD count, Dataset cache-manager empty?) — JVM truth."""
    n_rdds = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    cache_empty = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    return n_rdds, cache_empty


def test_registry_soak_storage_returns_to_baseline(spark, sf_dir):
    registry = load_all()
    # establish the baseline AFTER a sweep: whatever other tests left
    # cached is theirs; this test guards against NEW accumulation
    release_transient_persists()
    base_rdds, base_cache_empty = _storage_counts(spark)

    leaks: list[str] = []
    for name, q in registry.items():
        # consume the result the way the driver does (full action),
        # then run the boundary sweep the next registry call would run
        q.fn(spark, sf_dir).count()
        release_transient_persists()
        n_rdds, cache_empty = _storage_counts(spark)
        if n_rdds > base_rdds or (base_cache_empty and not cache_empty):
            leaks.append(
                f"{name}: persistent RDDs {base_rdds} -> {n_rdds}, "
                f"cacheManager empty {base_cache_empty} -> {cache_empty}"
            )
            # re-baseline so one leaky query doesn't mask later ones
            base_rdds, base_cache_empty = n_rdds, cache_empty
    assert not leaks, (
        "storage did not return to baseline after the boundary sweep for: "
        + "; ".join(leaks)
    )


def test_release_local_checkpoint_contract(spark):
    """Pin the helper's discrimination: it frees a localCheckpoint's
    RDD-level blocks (which Dataset.unpersist() provably does not —
    the defect the soak test caught) and declines plain Dataset
    persists (returning False; the sweep runs unpersist()
    unconditionally either way — see test_sweep_releases_both_layers)."""
    from callysto_spark.operators.util import release_local_checkpoint

    sc = spark.sparkContext

    def n_rdds():
        return sc._jsc.sc().getPersistentRDDs().size()

    base = n_rdds()
    ck = spark.range(100).localCheckpoint(eager=True)
    assert n_rdds() == base + 1
    # the defect: Dataset.unpersist() leaves the checkpoint blocks
    ck.unpersist()
    assert n_rdds() == base + 1
    # the fix: RDD-level release through the LogicalRDD
    assert release_local_checkpoint(ck) is True
    assert n_rdds() == base
    # a plain Dataset persist is NOT a LogicalRDD: helper declines,
    # CacheManager release still works
    cached = spark.range(100).persist()
    cached.count()
    assert release_local_checkpoint(cached) is False
    assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    cached.unpersist()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_sweep_releases_both_layers(spark):
    """A tracked Dataset-persist whose analyzed plan is a bare
    LogicalRDD (persist of a localCheckpoint result) holds storage at
    BOTH layers: the checkpoint's RDD blocks and the CacheManager
    entry. The sweep must release both — the pre-r14 plan-shape
    routing skipped ``df.unpersist()`` whenever the RDD-level release
    succeeded, silently leaking the CacheManager entry (r13 ADVICE
    finding 2). No current operator builds this shape; the sweep is a
    general utility and must stay correct for the next caller that
    does."""
    from callysto_spark.operators.util import (
        release_transient_persists,
        track_transient,
    )

    sc = spark.sparkContext

    def n_rdds():
        return sc._jsc.sc().getPersistentRDDs().size()

    def cache_empty():
        return spark._jsparkSession.sharedState().cacheManager().isEmpty()

    release_transient_persists()
    base = n_rdds()
    base_cache_empty = cache_empty()

    df = spark.range(100).localCheckpoint(eager=True).persist()
    df.count()
    track_transient(df)
    assert n_rdds() > base  # checkpoint blocks (+ cached-query RDD) held
    assert not cache_empty()  # CacheManager entry held

    release_transient_persists()
    assert n_rdds() == base, "RDD-level checkpoint blocks leaked"
    if base_cache_empty:
        assert cache_empty(), "CacheManager entry leaked (the r13 ADVICE defect)"


def test_streaming_agent_restart_cycles_storage_soak(spark, tmp_path):
    """Streaming-surface storage soak (r13 verdict item 5): the r13
    soak covered the BATCH operator surface; the streaming path has its
    own lifecycles — state-store files, checkpoint dirs, memtopic logs
    — none of which the registry walk touches. Run repeated
    table-agent start/process/stop cycles in ONE session and assert:

    - JVM storage (persistent RDDs, CacheManager) returns to baseline
      after every app stop — a stateful query must not pin blocks past
      its own lifecycle;
    - the checkpoint dir grows by a BOUNDED, per-cycle-constant file
      count (offset/commit logs + one state delta per partition per
      batch — Spark RETAINS these by design under
      minBatchesToRetain, so absolute return-to-baseline is the wrong
      assertion; unbounded or accelerating growth is the leak mode
      that matters at 100 TB, where a restart loop that leaks temp
      files per cycle fills the checkpoint volume);
    - no temp/in-progress files (".tmp", ".crc" orphans outside the
      retained logs) survive a clean stop.

    Reference analog: the recovery loop (runtime/recovery.rs:51-99) —
    the reference rebuilds tables from the changelog on every restart
    and must equally not accumulate recovery state across cycles.
    """
    import json

    import pandas as pd

    from callysto_spark.app import App
    from callysto_spark.sources import SourceSpec
    from callysto_spark.sources.memtopic import produce

    broker = str(tmp_path / "broker")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    import os as _os

    _os.makedirs(out)

    def ckpt_file_census() -> tuple[int, list[str]]:
        n = 0
        tmps: list[str] = []
        for root, _dirs, files in _os.walk(ckpt):
            for f in files:
                n += 1
                if f.endswith(".tmp") or ".temporary" in f:
                    tmps.append(_os.path.join(root, f))
        return n, tmps

    release_transient_persists()
    base_rdds, base_cache_empty = _storage_counts(spark)

    produced = 0
    counts: list[int] = []
    CYCLES = 4
    for cycle in range(CYCLES):
        msgs = [
            (f"k{i % 5}", json.dumps({"i": i}))
            for i in range(produced, produced + 200)
        ]
        produce(broker, "stream_soak", msgs, n_partitions=4)
        produced += 200

        a = App("stream_soak", spark=spark, checkpoint_root=ckpt)
        src = SourceSpec.memtopic("stream_soak", broker, partitions=4)
        stream = src.load(spark).selectExpr(
            "key", "CAST(get_json_object(value, '$.i') AS LONG) AS i"
        )
        table = a.table(
            "soak_counts", key_schema="key string", value_schema="cnt long"
        )
        table.output_schema = "key string, cnt long"

        def sink(df, batch_id):
            df.write.mode("overwrite").parquet(f"{out}/b{cycle}_{batch_id}")

        @a.table_agent("soak_agent", stream, table, sink=sink)
        def soak_agent(key, pdf, state):
            prev = state.get()
            cnt = (prev[0] if prev else 0) + len(pdf)
            state.set(cnt)
            return pd.DataFrame({"key": [key[0]], "cnt": [cnt]})

        a.run(await_termination=True, timeout=120)
        a.stop()

        n_rdds, cache_empty = _storage_counts(spark)
        assert n_rdds == base_rdds, (
            f"cycle {cycle}: persistent RDDs leaked {base_rdds} -> {n_rdds}"
        )
        if base_cache_empty:
            assert cache_empty, f"cycle {cycle}: CacheManager entries leaked"
        n_files, tmps = ckpt_file_census()
        assert not tmps, f"cycle {cycle}: temp files survived stop: {tmps[:5]}"
        counts.append(n_files)

    # bounded, non-accelerating checkpoint growth: cycles 2..N add the
    # same retained-log/state-delta footprint as cycle 1 -> 2 (state
    # snapshot maintenance may add a handful of .snapshot files in any
    # one cycle, hence the small absolute slack, but growth must not
    # compound)
    deltas = [b - a for a, b in zip(counts, counts[1:])]
    assert deltas, "soak ran a single cycle — nothing proven"
    slack = 40  # one snapshot per state partition, worst case
    assert max(deltas) <= deltas[0] + slack, (
        f"checkpoint growth accelerates across cycles: counts={counts}"
    )
    # final sanity: the state actually carried across cycles (this is a
    # soak of a WORKING pipeline, not of an agent that never ran)
    import pyarrow.dataset as pads

    last = sorted(_os.listdir(out))[-1]
    tab = pads.dataset(_os.path.join(out, last)).to_table()
    got = dict(zip(tab.column("key").to_pylist(), tab.column("cnt").to_pylist()))
    assert sum(got.values()) == produced, f"state lost across cycles: {got}"
