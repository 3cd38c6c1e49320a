"""bench.classify_trials — the ingest trial admission logic (r12).

Pure-python (no Spark): the classification decides which readings enter
the committed ingest median, so its edge behavior must be pinned —
especially the symmetric norm-outlier floor added for r11 verdict item
5 (the r11 committed run admitted a 466 MB/s trial into an 854 MB/s
median under clean-looking window probes).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def trial(mbps, bracket=0.09, io=900.0, batch_ratio=1.2):
    return {"mbps": mbps, "bracket": bracket, "io": io, "batch_ratio": batch_ratio}


IDLE, BEST_IO = 0.085, 900.0


def classify(attempts):
    n = bench.classify_trials(attempts, IDLE, BEST_IO)
    return n, {id(a): a["reason"] for a in attempts}


def test_window_probe_reasons():
    a_cpu = trial(800.0, bracket=0.2)          # 2.35x idle > 1.5x
    a_io = trial(800.0, io=300.0)              # < best/2
    a_batch = trial(800.0, batch_ratio=3.5)    # > 3.0
    a_ok = trial(800.0)
    attempts = [a_cpu, a_io, a_batch, a_ok]
    n = bench.classify_trials(attempts, IDLE, BEST_IO)
    assert n == 1
    assert (a_cpu["reason"], a_io["reason"], a_batch["reason"], a_ok["reason"]) == (
        "cpu_bracket", "io_probe", "batch_ratio", None
    )
    # the probe ladder reports the FIRST failing check
    a_both = trial(800.0, bracket=0.2, io=100.0)
    bench.classify_trials([a_both], IDLE, BEST_IO)
    assert a_both["reason"] == "cpu_bracket"


def test_r11_slow_outlier_is_discarded():
    """The exact r11 committed-run shape: a 466 MB/s trial with clean
    window probes inside an ~854 MB/s clean cluster (0.55x the median,
    under the 0.6x floor) must be discarded as norm_outlier."""
    cluster = [trial(m) for m in (853.8, 922.4, 801.3, 1025.1)]
    outlier = trial(466.2)
    attempts = cluster + [outlier]
    n = bench.classify_trials(attempts, IDLE, BEST_IO)
    assert n == 4
    assert outlier["reason"] == "norm_outlier"
    assert all(a["clean"] for a in cluster)


def test_fast_outlier_is_discarded_symmetrically():
    # a too-fast fluke (page-cache artifact, mis-timed batch) is as
    # untrustworthy as a too-slow one: > median/0.6 goes too
    cluster = [trial(m) for m in (800.0, 820.0, 790.0, 810.0)]
    fast = trial(1500.0)  # 1.86x the median
    attempts = cluster + [fast]
    n = bench.classify_trials(attempts, IDLE, BEST_IO)
    assert n == 4
    assert fast["reason"] == "norm_outlier"


def test_outlier_floor_needs_three_clean_trials():
    # with only 2 clean trials there is no trustworthy median to
    # measure an outlier against — both stay admitted
    attempts = [trial(800.0), trial(450.0)]
    n = bench.classify_trials(attempts, IDLE, BEST_IO)
    assert n == 2
    assert all(a["reason"] is None for a in attempts)


def test_borderline_trial_inside_the_floor_is_admitted():
    # 0.69x the cluster median (the r12 self-recorded run's 757.9 vs
    # 1063.8-ish cluster): above the 0.6x floor — admitted; the
    # normalized-spread noisy bar is the honesty backstop there
    cluster = [trial(m) for m in (1124.7, 1269.4, 944.1, 1063.8)]
    borderline = trial(757.9)
    n = bench.classify_trials(cluster + [borderline], IDLE, BEST_IO)
    assert n == 5
    assert borderline["reason"] is None


def test_skewed_brackets_normalize_before_the_floor():
    """A slow reading under a proportionally slow bracket is host
    drift, not an outlier: 500 MB/s at a 1.8x bracket normalizes to
    ~900 and must be admitted once brackets are non-flat."""
    attempts = [
        trial(900.0, bracket=0.09),
        trial(880.0, bracket=0.09),
        trial(910.0, bracket=0.09),
        trial(500.0, bracket=0.162),  # 1.8x bracket; norm ~ 500*0.162/0.09ref
    ]
    # idle 0.11 keeps the 0.162 bracket under the 1.5x cpu probe so the
    # trial reaches the norm-outlier layer (the path under test)
    n = bench.classify_trials(attempts, 0.11, BEST_IO)
    assert attempts[3]["clean"], attempts[3]["reason"]
    assert n == 4


def test_reclassification_is_idempotent_and_recoverable():
    # classify_trials runs once per attempt with tightening refs: a
    # trial discarded under an early median may re-enter under a
    # later one (pure function of the current sample set)
    a, b, c = trial(800.0), trial(805.0), trial(450.0)
    bench.classify_trials([a, b, c], IDLE, BEST_IO)
    assert c["reason"] == "norm_outlier"
    # two more mid-range readings drag the median down; 450 re-enters
    d, e = trial(600.0), trial(620.0)
    n = bench.classify_trials([a, b, c, d, e], IDLE, BEST_IO)
    assert c["clean"] and n == 5
