"""Interleaved same-session A/B: SHINGLE_IMPL jvm vs arrow.

Both variants alternate inside ONE Spark session; per-variant min over
all runs (host-noise discipline: cross-session A/Bs are confounded by
the C2 JIT lottery below ~40% effects).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import callysto_spark.operators.dedup as D
from callysto_spark.operators.util import release_transient_persists
from callysto_spark.queries import load_all
from callysto_spark.session import get_spark

NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["doc_ngram_jaccard_capped"]
ROUNDS = int(os.environ.get("AB_ROUNDS", "8"))
WARMS = int(os.environ.get("AB_WARMS", "5"))

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reg = load_all()
spark = get_spark("ab-shingle", cpus=32)
spark.read.parquet(f"{sf}/lineitem.parquet").count()

def run(name):
    df = reg[name].fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    release_transient_persists()

import gc
def settle():
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)

for name in NAMES:
    # warm BOTH variants fully first (JIT plateau for each code path)
    for impl in ("jvm", "arrow"):
        D.SHINGLE_IMPL = impl
        for _ in range(WARMS):
            run(name)
    results = {"jvm": [], "arrow": []}
    for r in range(ROUNDS):
        for impl in ("jvm", "arrow") if r % 2 == 0 else ("arrow", "jvm"):
            D.SHINGLE_IMPL = impl
            settle()
            spark.sparkContext.setJobDescription(f"ab {name} {impl} r{r}")
            t0 = time.perf_counter()
            run(name)
            results[impl].append(time.perf_counter() - t0)
    j, a = min(results["jvm"]), min(results["arrow"])
    print(f"{name}: jvm min={j:.3f}s arrow min={a:.3f}s delta={(a/j-1)*100:+.1f}%")
    print(f"  jvm   {[round(x,3) for x in results['jvm']]}")
    print(f"  arrow {[round(x,3) for x in results['arrow']]}")
spark.stop()
