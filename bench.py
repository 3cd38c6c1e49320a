#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

from callysto_spark.queries import load_all
from callysto_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry = load_all()
    names = [n for n, q in sorted(registry.items()) if q.bench]
    if "--all" in sys.argv:
        names = sorted(registry)
    spark = get_spark("callysto-bench", cpus=cpus)
    # warm the JVM + parquet footers once, outside the timed region
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def run(df) -> None:
        # noop sink, NOT count(): count() lets Catalyst prune every
        # unreferenced column, optimizing away the very aggregate
        # expressions being measured; the noop sink consumes full rows.
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        # steady-state measurement: first execution pays whole-stage
        # codegen JIT (~10s of generated-class compilation per complex
        # plan — irrelevant at 100 TB where it amortizes to noise);
        # run once to warm, clear any operator-level cache, then time.
        run(registry[name].fn(spark, sf_dir))
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        run(df)
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
