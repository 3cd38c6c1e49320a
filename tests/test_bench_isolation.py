"""The bench must never lose a round's signal to one broken query
(round 3 shipped rc=1 with zero numbers). Runs bench.py as the driver
does, with one query's failure injected, and asserts the JSON line
still arrives with every other timing."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_survives_single_query_failure():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_INGEST_MSGS="0",
        SPARK_GRAFT_BENCH_FAIL="q3_shipping_priority",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["queries"]["q3_shipping_priority"] is None
    assert "q3_shipping_priority" in out["errors"]
    others = {k: v for k, v in out["queries"].items() if k != "q3_shipping_priority"}
    assert others and all(isinstance(v, float) for v in others.values()), others
    assert out["value"] > 0
    # a partial round must self-identify: its total sums only surviving
    # queries and is NOT comparable to a clean round's total
    assert out["partial"] is True
    assert out["n_failed"] == 1
