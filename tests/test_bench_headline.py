"""bench.py's final-stdout-line contract (r11 verdict items 1-2).

The driver records only the TAIL (~2 KB) of bench.py's stdout.
BENCH_r11.json was lost to exactly this: the final JSON line grew past
the capture window with diagnostics and the driver recorded a mid-line
fragment (`parsed: null`). These tests pin the guard that prevents a
recurrence: the headline line stays hard-bounded under
HEADLINE_MAX_BYTES for representative and adversarial records, and the
slimming never drops a field tools/bench_compare.py's --gate needs.

Pure-python: no SparkSession is created (bench.py's heavy work lives
in main(); split_headline/emit are data-only).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import bench  # noqa: E402
import bench_compare  # noqa: E402

# the 12 real bench-headline query names — sizes must be computed
# against the actual name lengths, not toy q1/q2 stand-ins
NAMES = [
    "doc_dedup_exact",
    "doc_ngram_jaccard_capped",
    "doc_pipeline_clean_corpus",
    "doc_token_stats",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "events_asof_purchase_click",
    "events_sessionize",
    "part_type_topk",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "supplier_daily_running",
]

# every field tools/bench_compare.py `compare()` + its --gate path
# read from an artifact; a slimming that drops one of these silently
# un-gates the corresponding check
GATE_FIELDS = (
    "value",
    "queries",
    "cpu_canary_s",
    "cpu_canary_end_s",
    "cpu_canary_mt_s",
    "cpu_canary_mt_end_s",
    "cpu_canary_mt_threads",
    "io_canary_write_mbps",
    "query_canary_mt_s",
    "ingest_mbps",
)


def representative_record() -> dict:
    """A full out-dict shaped like the r11 run that overflowed the
    driver capture — every diagnostic field bench.py main() sets."""
    return {
        "metric": "headline_queries_total",
        "value": 5.281,
        "unit": "sec",
        "queries": {n: 0.283 for n in NAMES},
        "sf": 0.1,
        "loadavg_1m": 1.2,
        "loadavg_at_gate": 0.4,
        "cpu_canary_s": 0.297,
        "cpu_canary_end_s": 0.301,
        "cpu_canary_mt_s": 0.085,
        "cpu_canary_mt_end_s": 0.092,
        "cpu_canary_mt_threads": 32,
        "io_canary_write_mbps": 1011.5,
        "io_canary_read_mbps": 7673.5,
        "warm_runs": {n: 12 for n in NAMES},
        "query_session_won": {n: 2 for n in NAMES},
        "session_totals": [5.933, 5.281],
        "query_canary_mt_s": {n: [0.085, 0.092] for n in NAMES},
        "ingest_mbps": 853.8,
        "ingest_mbps_best": 1025.1,
        "ingest_mbps_norm": 860.0,
        "ingest_mbps_trials": [853.8, 1025.1, 922.4, 466.2, 801.3],
        "ingest_mbps_trials_norm": [853.8, 1010.2, 915.0, 470.1, 805.8],
        "ingest_trial_canaries_s": [0.09, 0.091, 0.088, 0.093, 0.09],
        "ingest_trial_io_probes_mbps": [900, 912, 887, 905, 899],
        "ingest_trial_batch_ratios": [1.2, 1.1, 1.3, 1.2, 1.1],
        "ingest_spread_pct": 12.0,
        "ingest_raw_spread_pct": 54.5,
        "ingest_discarded_trials": [
            {"mbps": 47.3, "bracket_s": 0.776, "io_probe_mbps": 100,
             "batch_ratio": 1.1, "reason": "cpu_bracket"},
            {"mbps": 466.2, "bracket_s": 0.09, "io_probe_mbps": 899,
             "batch_ratio": 1.2, "reason": "norm_outlier"},
        ],
        "watch_ledger": ["q1_pricing_summary", "emb_ivf_topk"],
    }


def line_of(headline: dict) -> str:
    return json.dumps(headline, separators=(",", ":"))


def test_headline_fits_driver_capture():
    headline, detail = bench.split_headline(representative_record())
    line = line_of(headline)
    # the driver captures ~2 KB of tail; the line plus its newline must
    # leave margin for any trailing driver framing
    assert len(line) < bench.HEADLINE_MAX_BYTES, len(line)
    assert bench.HEADLINE_MAX_BYTES <= 2000
    # nothing was trimmed on the representative shape
    assert "headline_trimmed" not in headline
    # detail is a superset: the full record survives in the sidecar
    for k in representative_record():
        assert k in detail


def test_headline_carries_every_gate_field():
    # the key list itself must cover the gate's reads...
    for k in GATE_FIELDS:
        assert k in bench.HEADLINE_KEYS, f"{k} missing from HEADLINE_KEYS"
    # ...and the representative record must carry them through
    headline, _ = bench.split_headline(representative_record())
    for k in GATE_FIELDS:
        assert k in headline, f"{k} dropped by split_headline"
    # honesty flags survive when set
    rec = representative_record()
    rec.update({"load_contaminated": True, "ingest_noisy": True,
                "ingest_window_exhausted": True, "ingest_short_sample": True})
    headline, _ = bench.split_headline(rec)
    for k in ("load_contaminated", "ingest_noisy",
              "ingest_window_exhausted", "ingest_short_sample"):
        assert headline.get(k) is True


def test_partial_run_trims_error_text_not_gate_fields():
    rec = representative_record()
    rec["errors"] = {n: "AnalysisException: " + "x" * 280 for n in NAMES[:6]}
    rec["partial"] = True
    rec["n_failed"] = 6
    headline, detail = bench.split_headline(rec)
    assert len(line_of(headline)) < bench.HEADLINE_MAX_BYTES
    # error text shortened in the headline, full in the detail
    assert all(len(v) <= 80 for v in headline["errors"].values())
    assert any(len(v) > 80 for v in detail["errors"].values())
    for k in GATE_FIELDS:
        assert k in headline


def test_overflow_drops_errors_before_gate_functional_brackets():
    """r12 ADVICE: the ladder used to drop the gate-functional
    per-query brackets before the purely-informational errors dict.
    An overflow that the errors dict alone explains must now keep the
    brackets (normalization fidelity) and drop errors (full text lives
    in the detail sidecar; partial/n_failed still say it's broken)."""
    rec = representative_record()
    # modest bracket payload, huge error payload: dropping errors alone
    # brings the line under the bound
    rec["errors"] = {
        f"q{i:02d}": "AnalysisException" + "Y" * 75 for i in range(25)
    }
    rec["partial"] = True
    rec["n_failed"] = 25
    headline, detail = bench.split_headline(rec)
    assert len(line_of(headline)) < bench.HEADLINE_MAX_BYTES
    assert "errors" not in headline
    assert "errors" in headline["headline_trimmed"]
    assert "query_canary_mt_s" in headline  # gate-functional, kept
    assert detail["errors"]  # full text survives in the sidecar record
    for k in ("partial", "n_failed", "queries", "value"):
        assert k in headline


def test_extreme_overflow_drops_brackets_last_and_records_it():
    """Adversarial shape: many long-named queries + long errors. The
    trim ladder must (1) shorten error text, (2) drop the errors dict,
    then (3) drop the per-query brackets — and say so — before the
    line can overflow. bench_compare falls back to run-wide canaries
    without brackets, so the gate survives, coarser."""
    rec = representative_record()
    names = [f"extremely_long_query_name_number_{i:02d}_padding" for i in range(20)]
    rec["queries"] = {n: 0.283 for n in names}
    rec["query_canary_mt_s"] = {n: [0.085, 0.092] for n in names}
    rec["errors"] = {n: "AnalysisException: " + "y" * 200 for n in names[:10]}
    rec["partial"] = True
    rec["n_failed"] = 10
    headline, _ = bench.split_headline(rec)
    assert len(line_of(headline)) < bench.HEADLINE_MAX_BYTES
    assert "query_canary_mt_s" not in headline
    # ladder order: errors (non-gate) go before brackets (gate-functional)
    t = headline["headline_trimmed"]
    assert t.index("errors") < t.index("query_canary_mt_s")
    # the run-wide canaries (the fallback normalization) must survive,
    # and the brokenness flags outlive any trimmed error text
    for k in ("cpu_canary_s", "cpu_canary_mt_s", "queries", "value",
              "partial", "n_failed"):
        assert k in headline


def test_last_resort_minimal_headline_is_unconditionally_bounded():
    """If every ladder step is exhausted and the line still overflows,
    split_headline must collapse to the minimal gate-essential subset
    rather than return an oversized line the driver would truncate
    into an unparseable fragment (the r11 loss mode)."""
    rec = representative_record()
    # inflate a headline field the ladder never touched before the
    # last resort: a pathological ingest_discarded shape can't (it's
    # detail-only), so grow the canary fields via absurd float lists
    rec["io_canary_write_mbps"] = [123.456789012345] * 400
    headline, _ = bench.split_headline(rec)
    line = line_of(headline)
    assert len(line) < bench.HEADLINE_MAX_BYTES
    assert "non_gate_fields" in headline["headline_trimmed"]
    parsed = json.loads(line)
    assert parsed["queries"] and parsed["value"] and parsed["metric"]
    # the cross-round slow-creep ledger survives the last resort (r14
    # ADVICE: a trimmed-to-minimal artifact without watch_ledger reads
    # as pre-r14 to compare(), silently breaking the creep chain for
    # the following round)
    assert parsed["watch_ledger"] == ["q1_pricing_summary", "emb_ivf_topk"]


def test_emit_writes_sidecar_and_returns_bounded_line(tmp_path, monkeypatch):
    sidecar = tmp_path / "BENCH_DETAIL.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(sidecar))
    line = bench.emit(representative_record())
    assert len(line) < bench.HEADLINE_MAX_BYTES
    parsed = json.loads(line)
    assert parsed["queries"] and parsed["value"]
    # the sidecar holds the FULL record, loadable by bench_compare
    detail = bench_compare.load(str(sidecar))
    assert detail["warm_runs"] and detail["ingest_discarded_trials"]
    assert detail["queries"] == parsed["queries"]


def test_headline_pair_round_trips_through_the_gate():
    """The slimmed artifacts must be everything the standing gate
    needs: a same-code headline pair compares with no gate errors and
    no regressions."""
    old_h, _ = bench.split_headline(representative_record())
    rec = representative_record()
    rec["value"] = 5.4
    rec["queries"] = {n: round(v * 1.02, 3) for n, v in rec["queries"].items()}
    new_h, _ = bench.split_headline(rec)
    lines, worse, errors, watch = bench_compare.compare(old_h, new_h, threshold=1.25)
    assert not errors and not worse and not watch
    # bracket normalization engaged (the brackets survived slimming)
    assert any("per-query mt brackets" in ln for ln in lines)


def test_driver_tail_capture_simulation():
    """Simulate the driver: keep only the last 2048 bytes of a stdout
    stream that ends with the headline line — the line must still
    parse. This is the exact failure mode that lost BENCH_r11."""
    headline, _ = bench.split_headline(representative_record())
    stdout = "# some earlier stderr-like noise\n" * 50 + line_of(headline) + "\n"
    tail = stdout[-2048:]
    last = tail.strip().rsplit("\n", 1)[-1]
    assert json.loads(last)["metric"] == "headline_queries_total"


def test_trim_marker_cannot_push_headline_over_bound():
    """r13 ADVICE finding 3: the headline_trimmed marker is appended
    AFTER the size ladder, so a headline that passed a ladder step just
    under HEADLINE_MAX_BYTES could exceed it once the ~40-75-byte
    marker landed. The ladder now trims against a budget that reserves
    the worst-case marker — sweep padded error payloads across the
    boundary and assert the final line NEVER exceeds the bound."""
    saw_trim = False
    for n_errs in range(1, 20):
        for pad in range(0, 120, 11):
            rec = representative_record()
            rec["errors"] = {
                f"q_failed_{i:02d}": ("SomeException: " + "x" * pad)
                for i in range(n_errs)
            }
            rec["partial"] = True
            rec["n_failed"] = n_errs
            headline, _ = bench.split_headline(rec)
            line = line_of(headline)
            assert len(line) <= bench.HEADLINE_MAX_BYTES, (
                f"{len(line)} bytes at n_errs={n_errs} pad={pad}: "
                f"trimmed={headline.get('headline_trimmed')}"
            )
            if "headline_trimmed" in headline:
                saw_trim = True
    assert saw_trim, "sweep never exercised the trim ladder"
