"""Attribute kmv_shingle_distinct's scale-up tail to its plan phases.

The r9 SCALING.md curve left one committed tail trending superlinear:
kmv_shingle_distinct read a 30x->100x tail exponent of 1.061 — measured
in a window whose 1-minute loadavg was 14.4-14.5 on a 32-core box (the
other three pipelines' points shared the contention). Before touching
the operator, this probe answers WHICH phase grows, on a clean window:

- ``scan_shingle``  — parquet scan + in-row 4-gram shingle explode
  (narrow; the linear floor every variant pays);
- ``distinct_only`` — scan + md5_60 spec hash + global DISTINCT of the
  shingle hashes (adds the one real exchange: partial agg -> shuffle ->
  final agg, linear rows in/out);
- ``full_kmv``      — the registry pipeline: distinct + the bounded
  top-k (per-partition Sort + WindowGroupLimit Partial, then the
  single-group final merge) + estimator agg.

The deltas isolate the suspects the r9 verdict named. The top-k phase
(full_kmv - distinct_only) is PREDICTED to grow LINEARLY: its
per-partition top-256 pass must scan every distinct hash (O(n) scan
with an O(k) heap — that scan IS the prune). What must stay constant
is the single-group FINAL merge, whose input is k rows per map
partition (256 x 32 at any corpus size with the fixed local[32]
partition count). Concentration therefore shows up as the top-k
delta's own 30x->100x growth exponent exceeding linear, not as the
delta merely growing. Spill metrics (memory/disk bytes) are captured
per variant because hash-agg spill onset between 30x and 100x is the
one mechanism that could bend the distinct exchange superlinear at
exactly the tail segment.

Usage:
    python tools/kmv_tail_probe.py [--scales 10,30,100] [--update-md]

Emits one JSON line; --update-md rewrites the "## KMV tail probe"
marker section of SCALING.md (preserved by scaling_bench's full-curve
rewrites, same mechanism as the IVF/stop-shingle probes).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import scaling_bench as sb  # noqa: E402

KMV_MARKER = sb.KMV_MARKER


def variants(spark, data_dir: str):
    from callysto_spark.operators.dedup import shingle_rows, string_hash
    from callysto_spark.operators.sketches import kmv_distinct

    def base():
        d = spark.read.parquet(f"{data_dir}/documents.parquet")
        return shingle_rows(d, "doc_id", "text", n=4).select(
            F.lit("all").alias("scope"), "g"
        )

    def scan_shingle():
        return base()

    def distinct_only():
        # exactly kmv_distinct's first half (sketches.py): spec hash,
        # global distinct — then a count so the exchange's output is
        # consumed without any window/sort machinery
        dh = base().select("scope", string_hash(F.col("g"), "md5_60").alias("__h")).distinct()
        return dh.groupBy("scope").agg(F.count(F.lit(1)).alias("n_distinct"))

    def full_kmv():
        return kmv_distinct(base(), ["scope"], F.col("g"), k=256)

    return {
        "scan_shingle": scan_shingle,
        "distinct_only": distinct_only,
        "full_kmv": full_kmv,
    }


def _spill_stats(stages: list[dict], min_stage: int, n_execs: int) -> tuple[float, float]:
    mem = disk = 0.0
    for st in stages:
        if st.get("stageId", -1) < min_stage:
            continue
        mem += st.get("memoryBytesSpilled", 0) or 0
        disk += st.get("diskBytesSpilled", 0) or 0
    mb = 1024 * 1024
    return mem / max(n_execs, 1) / mb, disk / max(n_execs, 1) / mb


def time_variant(spark, build, n_runs: int):
    """scaling_bench.time_pipeline plus spill capture (same settle,
    same warm-run / min-of-n discipline so numbers are comparable with
    the committed SCALING.md curve)."""
    from callysto_spark.operators.util import release_transient_persists

    def run():
        release_transient_persists()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        return df

    sb._settle(spark)
    prior = sb._completed_stages(spark)
    watermark = max((st.get("stageId", -1) for st in prior), default=-1) + 1
    df = run()
    rows = df.count()
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    release_transient_persists()
    stages = sb._completed_stages(spark)
    shuffle_mb, peak_task_mb, _cpu_s = sb._shuffle_stats(stages, watermark, n_runs + 2)
    spill_mem_mb, spill_disk_mb = _spill_stats(stages, watermark, n_runs + 2)
    return {
        "t": round(best, 3),
        "rows": rows,
        "shuffle_mb": round(shuffle_mb, 1),
        "peak_task_mb": round(peak_task_mb, 2),
        "spill_mem_mb": round(spill_mem_mb, 1),
        "spill_disk_mb": round(spill_disk_mb, 1),
        "load1": round(os.getloadavg()[0], 1),
    }


def tail_exponent(points: dict[int, float], lo: int, hi: int) -> float | None:
    if lo not in points or hi not in points or points[lo] <= 0:
        return None
    return round(math.log(points[hi] / points[lo]) / math.log(hi / lo), 3)


def _md_section(probe: dict, cpus: int, n_runs: int) -> str:
    scales = probe["scales"]
    pts = probe["points"]
    names = ["scan_shingle", "distinct_only", "full_kmv"]
    hdr = "| variant | " + " | ".join(f"t @{s}x (s)" for s in scales) + " | tail exp | spill @max (MB mem/disk) | load @max |"
    sep = "|---|" + "---|" * (len(scales) + 3)
    rows = []
    for name in names:
        cells = [f"{pts[str(s)][name]['t']}" for s in scales]
        mx = pts[str(scales[-1])][name]
        rows.append(
            f"| {name} | " + " | ".join(cells)
            + f" | {probe['tails'][name]} | {mx['spill_mem_mb']}/{mx['spill_disk_mb']} | {mx['load1']} |"
        )
    d_hdr = "| delta | " + " | ".join(f"@{s}x (s)" for s in scales) + " |"
    d_sep = "|---|" + "---|" * len(scales)
    d_rows = []
    for label, a, b in (
        ("distinct exchange (distinct_only - scan)", "distinct_only", "scan_shingle"),
        ("bounded topk (TakeOrderedAndProject) + final merge (full - distinct_only)", "full_kmv", "distinct_only"),
    ):
        cells = [f"{round(pts[str(s)][a]['t'] - pts[str(s)][b]['t'], 3)}" for s in scales]
        d_rows.append(f"| {label} | " + " | ".join(cells) + " |")
    lines = [
        KMV_MARKER,
        "",
        f"`python tools/kmv_tail_probe.py --scales {','.join(map(str, scales))}` "
        f"(local[{cpus}], min-of-{n_runs}, same corpus generator and timing",
        "discipline as the main curve). Phase attribution for the one r9 curve",
        "that read superlinear (tail 1.061 under loadavg 14.4-14.5):",
        "",
        hdr,
        sep,
        *rows,
        "",
        d_hdr,
        d_sep,
        *d_rows,
        "",
        probe["finding"],
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    scales = [10, 30, 100]
    if "--scales" in sys.argv:
        scales = [int(s) for s in sys.argv[sys.argv.index("--scales") + 1].split(",")]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
    base_docs = int(os.environ.get("SPARK_GRAFT_SCALE_BASE_DOCS", "5000"))
    md_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")

    if "--from-json" in sys.argv:
        # replay mode: recompute tails/deltas/finding (the INTERPRETIVE
        # layer) from a recorded run's points — measurements are never
        # altered; used when the finding logic improves after an
        # expensive measurement window already closed
        src = sys.argv[sys.argv.index("--from-json") + 1]
        with open(src) as f:
            rec = json.load(f)
        points = rec["points"]
        scales = rec["scales"]
        # prefer the RECORDED run's settings for the MD header: stamping
        # the replay env's cpus/n_runs would mislabel a run measured
        # under different SPARK_GRAFT_* values (legacy recordings
        # without these fields keep the env defaults)
        cpus = int(rec.get("cpus", cpus))
        n_runs = int(rec.get("n_runs", n_runs))
    else:
        from callysto_spark.session import get_spark

        spark = get_spark("callysto-kmv-probe", cpus=cpus, extra_conf={"spark.ui.enabled": "true"})
        root = tempfile.mkdtemp(prefix="callysto_kmv_probe_")
        points = {}
        try:
            for s in scales:
                d = f"{root}/x{s}"
                sb.gen_documents(spark, base_docs * s, d)
                points[str(s)] = {}
                for name, build in variants(spark, d).items():
                    points[str(s)][name] = time_variant(spark, build, n_runs)
                    print(f"# {name} @ {s}x: {json.dumps(points[str(s)][name])}", file=sys.stderr)
                shutil.rmtree(d, ignore_errors=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
            spark.stop()

    if len(scales) < 2:
        raise SystemExit("need at least two scales to fit a tail exponent")
    lo, hi = scales[-2], scales[-1]
    tails = {
        name: tail_exponent({s: points[str(s)][name]["t"] for s in scales}, lo, hi)
        for name in points[str(scales[0])]
    }
    full_tail = tails.get("full_kmv")
    merge_delta = {
        s: round(points[str(s)]["full_kmv"]["t"] - points[str(s)]["distinct_only"]["t"], 3)
        for s in scales
    }
    delta_tail = tail_exponent({s: max(merge_delta[s], 1e-3) for s in scales}, lo, hi)
    # linear delta growth = the per-partition top-k SCAN (the prune
    # itself); concentration = the delta growing beyond linear. Two
    # guards: 1.15 allows exponent noise, and a 0.3s/5%-of-total floor
    # refuses to attribute growth from deltas the host's between-run
    # variance swamps (a slow-window rerun read a 0.17s delta swing as
    # exponent 1.49 while the TOTAL tail stayed 0.994 — subtraction of
    # two min-of-3 walls is meaningless below the floor). The floor
    # applies to BOTH endpoints: an exponent over an under-floor
    # BASELINE is equally meaningless (r11: a 0.23s lo delta — in a
    # window where full_kmv measured FASTER than its own subset at 10x,
    # proving between-variant variance ~0.4s — read as exponent 1.95
    # while the TOTAL tail stayed 0.948).
    def _floor(s):
        return max(0.3, 0.05 * points[str(s)]["full_kmv"]["t"])

    measurable = merge_delta[hi] >= _floor(hi) and merge_delta[lo] >= _floor(lo)
    concentrating = measurable and delta_tail is not None and delta_tail > 1.15
    if not measurable:
        delta_note = (
            " — below the measurement floor (host between-run variance exceeds "
            "the delta); the TOTAL tail governs"
        )
    elif concentrating:
        delta_note = (
            " — SUPERLINEAR: the bounded top-k is concentrating; fix before "
            "trusting the curve."
        )
    else:
        delta_note = (
            " — at-or-under linear, i.e. the per-partition top-k scan (the "
            "prune itself), with the fixed 8192-row final merge invisible"
        )
    finding = (
        f"Finding: full_kmv tail ({lo}x->{hi}x) = {full_tail}; the topk-phase delta "
        f"(full - distinct_only) moved {merge_delta[lo]}s -> {merge_delta[hi]}s "
        f"(exponent {delta_tail})" + delta_note
        + (". The committed 1.061 reading is attributable to the r9 window's "
           "14.4 loadavg, not to the single-group merge (whose input is plan-"
           "bounded at k rows/partition — pinned by "
           "tests/test_sketches.py::test_kmv_global_group_plan_bounded)."
           if full_tail is not None and full_tail <= 1.0 else ".")
    )
    probe = {
        "scales": scales,
        "points": points,
        "tails": tails,
        "merge_delta": {str(k): v for k, v in merge_delta.items()},
        "finding": finding,
        # measurement-time settings, so --from-json replays label the
        # MD section with the run's own discipline, not the replay env's
        "cpus": cpus,
        "n_runs": n_runs,
    }
    print(json.dumps({"metric": "kmv_tail_probe", **probe}))
    if "--update-md" in sys.argv:
        sb._replace_section(md_path, KMV_MARKER, _md_section(probe, cpus, n_runs))


if __name__ == "__main__":
    main()
