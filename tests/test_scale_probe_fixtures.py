"""The r13 capped-Jaccard tail corroboration, pinned (r12 verdict
item 7).

The committed r12 curve read the doc_ngram_jaccard_capped 30x->100x
tail at 1.063 — inside the 1.25 gate but the only tail above 1.0.
Two further r13 windows (`python scaling_bench.py --scales 10,30,100`,
archived verbatim here) settle the attribution:

- the DETERMINISTIC physical quantities — total shuffle MB, peak
  single-task shuffle MB, and output rows per point — are
  byte-identical across both windows AND to the committed r11/r12
  curves (the plan did not move);
- the wall-clock tails straddle 1.0 (0.222 in a window whose 30x
  point was externally contended at loadavg 16.1; 1.082 in a window
  whose 100x point ran at loadavg 20) — window load, not growth.

This test replays the archived records so the reasoning stays
reproducible: if a future engine change moves the shuffle table,
the byte-identity assertions fail and the attribution must be
re-established on fresh windows.
"""

from __future__ import annotations

import json
from pathlib import Path

FIX = Path(__file__).parent / "fixtures"

# the committed SCALING.md table's deterministic columns for
# doc_ngram_jaccard_capped at the probe scales (stable since r11)
CAPPED_SHUFFLE_MB = {"10": 121.3, "30": 356.8, "100": 1195.1}
CAPPED_PEAK_MB = {"10": 4.13, "30": 12.06, "100": 40.26}
CAPPED_ROWS = {"10": 225049, "30": 661500, "100": 2158851}


def _load(name: str) -> dict:
    return json.loads((FIX / name).read_text())


def test_both_windows_plan_quantities_byte_identical_to_committed_curve():
    for fx in ("scale_probe_r13_win1.json", "scale_probe_r13_win2.json"):
        d = _load(fx)["pipelines"]["doc_ngram_jaccard_capped"]
        assert d["shuffle_mb"] == CAPPED_SHUFFLE_MB, fx
        assert d["peak_task_shuffle_mb"] == CAPPED_PEAK_MB, fx
        assert d["rows"] == CAPPED_ROWS, fx


def test_tails_gate_clean_and_straddle_one():
    tails = [
        _load(fx)["pipelines"]["doc_ngram_jaccard_capped"]["tail_exponent"]
        for fx in ("scale_probe_r13_win1.json", "scale_probe_r13_win2.json")
    ]
    assert all(t <= 1.25 for t in tails), tails  # the standing gate
    # one window under 1.0, one over: noise around linear, not a trend
    assert min(tails) < 1.0 < max(tails), tails


def test_every_pipeline_gates_clean_in_both_windows():
    for fx in ("scale_probe_r13_win1.json", "scale_probe_r13_win2.json"):
        rec = _load(fx)
        assert not rec.get("errors"), fx
        for name, d in rec["pipelines"].items():
            assert d["tail_exponent"] <= 1.25, (fx, name, d["tail_exponent"])


# ---------------------------------------------------------------------------
# r14 (r13 verdict item 7): two further windows, the second carrying the
# NEW cpu_s column — executor CPU per execution from the same REST stage
# metrics as the shuffle columns. The capped tail read 1.124 and 1.041
# wall in these windows (five consecutive windows now straddle 1.0 on
# byte-identical shuffle/peak/row columns), and the cpu column settles
# the attribution mechanically: the 30x->100x CPU-work exponent is
# 0.983 — the WORK is sub-linear; the residual wall tail is waiting
# (a 15s point integrates every external burst its 3 runs cross while
# a 4s point dodges them via min-of-n). Caveat, stated: cpu_s averages
# over warm+count+timed executions, so scale-independent JIT CPU
# slightly inflates the smaller point — a few percent at these scales,
# not enough to flip the reading.


def test_r14_windows_plan_quantities_byte_identical_to_committed_curve():
    for fx in ("scale_probe_r14_win1.json", "scale_probe_r14_win2.json"):
        d = _load(fx)["pipelines"]["doc_ngram_jaccard_capped"]
        assert d["shuffle_mb"] == CAPPED_SHUFFLE_MB, fx
        assert d["peak_task_shuffle_mb"] == CAPPED_PEAK_MB, fx
        assert d["rows"] == CAPPED_ROWS, fx


def test_r14_cpu_column_attributes_capped_tail_to_waiting_not_work():
    d = _load("scale_probe_r14_win2.json")["pipelines"]["doc_ngram_jaccard_capped"]
    assert d["tail_exponent"] <= 1.25  # the standing wall gate
    # the attribution: CPU work between the two largest scales is
    # sub-linear even where the wall tail sits above 1.0
    assert d["cpu_tail_exponent"] <= 1.0, d["cpu_tail_exponent"]
    assert d["cpu_s"]["100"] / d["cpu_s"]["10"] < 10.0  # sub-linear over the decade


def test_r14_every_pipeline_gates_clean_in_both_windows():
    for fx in ("scale_probe_r14_win1.json", "scale_probe_r14_win2.json"):
        rec = _load(fx)
        assert not rec.get("errors"), fx
        for name, d in rec["pipelines"].items():
            assert d["tail_exponent"] <= 1.25, (fx, name, d["tail_exponent"])
