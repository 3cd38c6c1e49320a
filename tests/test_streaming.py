"""Streaming semantics (SURVEY §5 strategy 2): deterministic
availableNow replay over staged files — event-time windows, watermarks +
late data, dedup-within-watermark, session windows vs the batch
sessionizer."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from callysto_spark.operators import sessionize
from callysto_spark.streaming import windows as W

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _stage(spark, tmp_path, name, rows, schema="event_id long, user_id long, ts timestamp, value double"):
    """Stage micro-batches as FLAT parquet files (FileStreamSource does
    not recurse into the dirs df.write.parquet creates), with strictly
    increasing mtimes so file order == batch order."""
    import os
    import shutil
    import time

    d = tmp_path / name
    d.mkdir()
    for i, batch in enumerate(rows):
        scratch = tmp_path / f"__scratch_{name}_{i}"
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(str(scratch))
        part = next(scratch.glob("part-*.parquet"))
        target = d / f"f{i}.parquet"
        shutil.move(str(part), str(target))
        shutil.rmtree(scratch)
        os.utime(target, (time.time() + i * 10, time.time() + i * 10))
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    )


def _run_to_memory(df, name, tmp_path, output_mode="append"):
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_tumbling_window_watermark_drops_late(spark, tmp_path):
    """Append-mode windowed agg with watermark: a second micro-batch
    arriving far behind the watermark is dropped (late-data policy)."""
    on_time = [
        (1, 1, BASE + dt.timedelta(minutes=m), 1.0) for m in (0, 1, 2, 30, 31, 200)
    ]
    # Spark's watermark is best-effort within a batch: a late row arriving
    # in the SAME batch that evicts its window still merges. The bump
    # batch forces eviction first, so the late batch is genuinely dropped.
    bump = [(50, 1, BASE + dt.timedelta(minutes=201), 1.0)]
    late = [(99, 1, BASE + dt.timedelta(minutes=3), 1.0)]  # far behind watermark
    stream = _stage(spark, tmp_path, "late", [on_time, bump, late])
    stream, win = W.tumbling(stream, "ts", "10 minutes", watermark="10 minutes")
    agg = stream.groupBy(win.alias("w")).agg(F.count("*").alias("n")).select(
        F.col("w.start").alias("ws"), "n"
    )
    _run_to_memory(agg, "late_out", tmp_path)
    got = {r["ws"]: r["n"] for r in spark.table("late_out").collect()}
    # window [0,10) closed with 3 on-time events; the late event (min 3)
    # arrived after watermark passed → NOT counted
    assert got[BASE] == 3
    assert got[BASE + dt.timedelta(minutes=30)] == 2


def test_dedup_within_watermark(spark, tmp_path):
    rows1 = [(1, 1, BASE, 1.0), (1, 1, BASE + dt.timedelta(seconds=30), 1.0), (2, 1, BASE + dt.timedelta(minutes=1), 1.0)]
    rows2 = [(1, 1, BASE + dt.timedelta(minutes=2), 1.0), (3, 1, BASE + dt.timedelta(minutes=3), 1.0)]
    stream = _stage(spark, tmp_path, "dedup", [rows1, rows2])
    out = W.dedup_within_watermark(stream, ["event_id"], "ts", "10 minutes")
    _run_to_memory(out, "dedup_out", tmp_path)
    ids = sorted(r["event_id"] for r in spark.table("dedup_out").collect())
    assert ids == [1, 2, 3]  # duplicate event_id=1 rows suppressed


def test_session_window_matches_batch_sessionizer(spark, tmp_path, sf_dir):
    """Native streaming session_window session COUNT per user equals the
    batch gap-sessionizer's (same 30-min gap semantics)."""
    from callysto_spark.tables import load

    events = load(spark, sf_dir, "events")["events"]
    batch_sessions = (
        sessionize(events, "user_id", "ts", gap_seconds=1800)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    expected = {r["user_id"]: r["n_sessions"] for r in batch_sessions.collect()}

    # stage: batch 1 = the real events; batch 2 = one sentinel per user
    # 2 h after the max ts, so the watermark passes every real session
    # and append mode emits them all (sentinel sessions stay in state).
    real = [
        (r["event_id"], r["user_id"], r["ts"], r["value"])
        for r in events.select("event_id", "user_id", "ts", "value").collect()
    ]
    max_ts = max(r[2] for r in real)
    users = sorted({r[1] for r in real})
    sentinels = [
        (10_000_000 + u, u, max_ts + dt.timedelta(hours=2), 0.0) for u in users
    ]
    stream = _stage(spark, tmp_path, "sess", [real, sentinels])
    stream, win = W.session(stream, "ts", "30 minutes", watermark="0 seconds")
    agg = stream.groupBy("user_id", win.alias("w")).agg(F.count("*").alias("n"))
    _run_to_memory(agg, "sess_out", tmp_path)
    got = (
        spark.table("sess_out")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .collect()
    )
    assert {r["user_id"]: r["n_sessions"] for r in got} == expected


def test_stream_stream_join_with_time_bound(spark, tmp_path):
    """Stream-stream inner join with watermarks + time-range condition
    (the interval-join shape): every purchase joins clicks from the
    preceding hour; result must equal the batch join."""
    purchases = [
        (100 + i, 1, BASE + dt.timedelta(minutes=10 * i), 5.0) for i in range(6)
    ]
    clicks = [(200 + i, 1, BASE + dt.timedelta(minutes=7 * i), 0.0) for i in range(8)]
    p_stream = _stage(spark, tmp_path, "ssj_p", [purchases])
    c_stream = _stage(spark, tmp_path, "ssj_c", [clicks])

    p = p_stream.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = c_stream.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    _run_to_memory(joined, "ssj_out", tmp_path)
    got = sorted((r["p_id"], r["c_id"]) for r in spark.table("ssj_out").collect())

    batch_p = spark.createDataFrame(purchases, "event_id long, user_id long, ts timestamp, value double")
    batch_c = spark.createDataFrame(clicks, "event_id long, user_id long, ts timestamp, value double")
    expect = sorted(
        (r["p"], r["c"])
        for r in batch_p.alias("p")
        .join(
            batch_c.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") <= F.col("p.ts"))
            & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(F.col("p.event_id").alias("p"), F.col("c.event_id").alias("c"))
        .collect()
    )
    assert got == expect and len(got) > 0


def test_stream_static_join(spark, tmp_path, sf_dir):
    """Stream-static join: streaming events enriched with the static
    customer dim (broadcast at plan time — no state, no watermark)."""
    from callysto_spark.tables import load

    cust = load(spark, sf_dir, "customer")["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    rows = [(i, i % 5 + 1, BASE + dt.timedelta(minutes=i), 1.0) for i in range(20)]
    stream = _stage(spark, tmp_path, "ss_static", [rows])
    joined = stream.join(F.broadcast(cust), "user_id").select("event_id", "user_id", "c_mktsegment")
    _run_to_memory(joined, "ss_static_out", tmp_path)
    got = spark.table("ss_static_out")
    assert got.count() == 20
    assert got.filter(F.col("c_mktsegment").isNull()).count() == 0


def test_running_aggregate_update_mode(spark, tmp_path):
    """D7 declarative running aggregate: groupBy().count() in update
    mode accumulates across micro-batches (the reference's per-instance
    atomic counter, distributed)."""
    rows1 = [(i, i % 2, BASE + dt.timedelta(seconds=i), 1.0) for i in range(10)]
    rows2 = [(100 + i, i % 2, BASE + dt.timedelta(minutes=1, seconds=i), 1.0) for i in range(6)]
    stream = _stage(spark, tmp_path, "runagg", [rows1, rows2])
    agg = stream.groupBy("user_id").count()
    _run_to_memory(agg, "runagg_out", tmp_path, output_mode="update")
    # update mode re-emits per batch; the LAST emission per key is the
    # running total over both batches
    latest = (
        spark.table("runagg_out")
        .groupBy("user_id")
        .agg(F.max("count").alias("n"))
        .collect()
    )
    assert {r["user_id"]: r["n"] for r in latest} == {0: 8, 1: 8}


def test_minhash_on_stream_matches_batch(spark, tmp_path):
    """Batch/stream unification for the dedup pipeline: minhash
    signatures are a fully narrow map (in-row shingles, in-row
    permutation minima — no shuffle, no window), so the SAME operator
    runs unchanged on a readStream DataFrame and must produce exactly
    the batch signatures."""
    from callysto_spark.operators.dedup import minhash_signatures

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with other tokens entirely"),
        (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    d = tmp_path / "mh_docs"
    d.mkdir()
    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "mh_scratch"))
    import shutil

    for f in (tmp_path / "mh_scratch").iterdir():
        if f.name.endswith(".parquet"):
            shutil.copy(f, d / "0000.parquet")

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(d))
    sig_stream = minhash_signatures(stream, "doc_id", "text", num_hashes=16, n=3)
    assert sig_stream.isStreaming
    q = (
        sig_stream.writeStream.format("memory")
        .queryName("mh_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc"]: list(r["signature"]) for r in spark.table("mh_stream_out").collect()}
    want = {
        r["doc"]: list(r["signature"])
        for r in minhash_signatures(batch_df, "doc_id", "text", num_hashes=16, n=3).collect()
    }
    assert got == want
    assert got[1] == got[4], "identical docs must share a signature"
    assert got[1] != got[3]


def test_streaming_near_dup_recipe_matches_batch_pipeline(spark, tmp_path, sf_dir):
    """The documented streaming near-dup recipe (r8 verdict item 5),
    end-to-end: minhash signatures are streaming-legal (fully narrow —
    in-row shingles and permutation minima, no shuffle), but the
    two-pass bucket-cap prefilter (groupBy + semi-join) is batch-only
    by construction. The 100 TB shape is therefore:

      1. signatures computed IN-STREAM as documents arrive, appended to
         a durable signature table (parquet sink, availableNow trigger
         here standing in for the periodic micro-batch drain);
      2. a PERIODIC BATCH job over the stored signature table: LSH
         banding with max_bucket_freq → exact-Jaccard verification on
         candidates → connected components → survivor set.

    Parity contract: the streamed-signature path must produce the
    IDENTICAL survivor set to the all-batch pipeline on the same
    corpus. Reference analog: a Callysto user hand-rolls exactly this
    split inside agent closures — per-message feature extraction in the
    agent, periodic table-wide reconciliation
    (/root/reference/callysto/src/types/agent.rs:120-143)."""
    import shutil

    from callysto_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        verify_candidate_pairs,
    )
    from callysto_spark.operators.graph import connected_components

    # Corpus: the sf documents table plus planted one-token-appended
    # twins for every doc_id < 20 — real near-dups for the recipe to find.
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    twins = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" planted")).alias("text"),
    )
    corpus = d.unionByName(twins)

    stage = tmp_path / "nd_stage"
    stage.mkdir()
    corpus.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "nd_scratch"))
    for i, f in enumerate(sorted((tmp_path / "nd_scratch").iterdir())):
        if f.name.endswith(".parquet"):
            shutil.copy(f, stage / f"{i:04d}.parquet")

    # 1. in-stream signatures -> durable parquet signature table
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    sig_stream = minhash_signatures(stream, "doc_id", "text", num_hashes=64, n=4)
    assert sig_stream.isStreaming
    sig_path = tmp_path / "nd_sigs"
    q = (
        sig_stream.writeStream.format("parquet")
        .option("path", str(sig_path))
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # 2. periodic batch job over the STORED signature table
    def survivors_from(sigs):
        cands = minhash_lsh_candidates(
            sigs, bands=16, rows_per_band=4, max_bucket_freq=64
        )
        verified = verify_candidate_pairs(corpus, cands, "doc_id", "text", n=4, threshold=0.6)
        comps = connected_components(verified.select("doc_a", "doc_b"), "doc_a", "doc_b")
        dropped = comps.filter(F.col("vertex") != F.col("component")).select(
            F.col("vertex").alias("doc_id")
        )
        return {r["doc_id"] for r in corpus.join(dropped, "doc_id", "left_anti").select("doc_id").collect()}

    streamed = survivors_from(spark.read.parquet(str(sig_path)))
    batch = survivors_from(minhash_signatures(corpus, "doc_id", "text", num_hashes=64, n=4))
    assert streamed == batch
    # the recipe actually dropped near-dups: every planted twin pair
    # lost exactly one member
    n_corpus = corpus.count()
    assert len(streamed) < n_corpus
    # a doc and its planted twin never BOTH survive
    both = [i for i in range(20) if i in streamed and i + 100000 in streamed]
    assert not both, f"twin pairs with both members surviving: {both}"

    # Incremental contract — the recipe's actual operating mode is
    # PERIODIC drains: a second availableNow run over the same dir plus
    # newly arrived files must append ONLY the new docs' signatures
    # (checkpoint offsets skip the already-drained files; reprocessing
    # the corpus each drain would be quadratic over a pipeline's life).
    late = corpus.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"), F.col("text")
    )
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "nd_scratch2"))
    for f in sorted((tmp_path / "nd_scratch2").iterdir()):
        if f.name.endswith(".parquet"):
            shutil.copy(f, stage / "9999.parquet")
    n_before = spark.read.parquet(str(sig_path)).count()
    q2 = (
        minhash_signatures(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stage)),
            "doc_id",
            "text",
            num_hashes=64,
            n=4,
        )
        .writeStream.format("parquet")
        .option("path", str(sig_path))
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    sig_after = spark.read.parquet(str(sig_path))
    assert sig_after.count() == n_before + 5, "second drain must append exactly the new docs"
    new_ids = {r["doc"] for r in sig_after.filter(F.col("doc") >= 200000).collect()}
    assert new_ids == {200000 + i for i in range(5)}


def test_sessionize_accepts_ntz_and_ltz_timestamps(spark):
    """The operator must produce identical sessions whether ``ts`` is
    TIMESTAMP (LTZ) or TIMESTAMP_NTZ — driver testdata has shipped both
    encodings across rounds, and TIMESTAMP_NTZ has no direct long cast."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=5)),
        (1, base + dt.timedelta(minutes=90)),  # new session (gap > 30 min)
        (2, base),
    ]
    expected = {(1, base): 1, (1, base + dt.timedelta(minutes=5)): 1,
                (1, base + dt.timedelta(minutes=90)): 2, (2, base): 1}
    for spark_type in ("timestamp", "timestamp_ntz"):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp").withColumn(
            "ts", F.col("ts").cast(spark_type)
        )
        assert dict(df.dtypes)["ts"] == spark_type
        out = sessionize(df, "user_id", "ts", gap_seconds=1800)
        got = {(r["user_id"], r["ts"].replace(tzinfo=None)): r["session_id"]
               for r in out.collect()}
        assert got == expected, f"wrong sessions for {spark_type}"


def test_streaming_near_dup_recipe_survives_kill_restart(spark, tmp_path, sf_dir):
    """Chaos drill for the streaming near-dup recipe (r9 verdict item
    4): kill the signature stream MID-CORPUS (after the first
    micro-batch of a file-per-trigger drain, with most of the corpus
    still unread), restart from the same checkpoint, finish the drain,
    then run the periodic batch LSH/verify/components stage — the
    survivor set must equal the all-batch pipeline's exactly, with no
    signature lost or duplicated across the restart boundary. The
    parquet sink's _spark_metadata commit log + checkpoint offsets are
    what make the boundary exactly-once; this drives them the way
    tests/test_durability.py drives the stateful-table changelog
    (reference analog: /root/reference/callysto/src/runtime/recovery.rs:51-99)."""
    import shutil
    import time

    from callysto_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        verify_candidate_pairs,
    )
    from callysto_spark.operators.graph import connected_components

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    twins = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" planted")).alias("text"),
    )
    corpus = d.unionByName(twins)
    n_corpus = corpus.count()

    # stage as 8 files so one trigger = ~1/8 of the corpus
    stage = tmp_path / "cr_stage"
    stage.mkdir()
    corpus.repartition(8).write.mode("overwrite").parquet(str(tmp_path / "cr_scratch"))
    n_files = 0
    for f in sorted((tmp_path / "cr_scratch").iterdir()):
        if f.name.endswith(".parquet"):
            shutil.copy(f, stage / f"{n_files:04d}.parquet")
            n_files += 1
    assert n_files == 8

    sig_path, ckpt = tmp_path / "cr_sigs", tmp_path / "cr_ckpt"

    def start(trigger):
        return (
            minhash_signatures(
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(stage)),
                "doc_id",
                "text",
                num_hashes=64,
                n=4,
            )
            .writeStream.format("parquet")
            .option("path", str(sig_path))
            .option("checkpointLocation", str(ckpt))
            .trigger(**trigger)
            .start()
        )

    # 1. first incarnation: long processing-time trigger => exactly one
    # micro-batch (one file) commits before we kill it
    q = start({"processingTime": "120 seconds"})
    deadline = time.time() + 120
    drained = 0
    while time.time() < deadline:
        try:
            drained = spark.read.parquet(str(sig_path)).count()
        except Exception:  # sink dir not created yet
            drained = 0
        if drained > 0:
            break
        time.sleep(0.25)
    q.stop()  # kill mid-corpus
    assert 0 < drained < n_corpus, (
        f"kill must land mid-corpus: {drained}/{n_corpus} signatures drained"
    )

    # 2. restart from the SAME checkpoint; drain the remaining files
    q2 = start({"availableNow": True})
    q2.awaitTermination(180)

    # exactly-once across the boundary: every doc signed once
    sigs = spark.read.parquet(str(sig_path))
    assert sigs.count() == n_corpus, "signatures lost or duplicated across restart"
    assert sigs.select("doc").distinct().count() == n_corpus
    batch_sigs = minhash_signatures(corpus, "doc_id", "text", num_hashes=64, n=4)
    got = {r["doc"]: list(r["signature"]) for r in sigs.collect()}
    want = {r["doc"]: list(r["signature"]) for r in batch_sigs.collect()}
    assert got == want

    # 3. periodic batch stage over the restart-spanning signature table
    def survivors_from(s):
        cands = minhash_lsh_candidates(s, bands=16, rows_per_band=4, max_bucket_freq=64)
        verified = verify_candidate_pairs(corpus, cands, "doc_id", "text", n=4, threshold=0.6)
        comps = connected_components(verified.select("doc_a", "doc_b"), "doc_a", "doc_b")
        dropped = comps.filter(F.col("vertex") != F.col("component")).select(
            F.col("vertex").alias("doc_id")
        )
        return {
            r["doc_id"]
            for r in corpus.join(dropped, "doc_id", "left_anti").select("doc_id").collect()
        }

    assert survivors_from(sigs) == survivors_from(batch_sigs)
