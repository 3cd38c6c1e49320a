"""Does ensure_parallelism on the fact scan help TPC-H at 32 cores (sf0.1)?"""
import os, sys, time, gc
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from callysto_spark.session import get_spark
from callysto_spark.queries import load_all
from callysto_spark.tables import load
from callysto_spark.operators.util import ensure_parallelism, release_transient_persists
import callysto_spark.tables as T

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
reg = load_all()
spark = get_spark("ab-repart", cpus=cpus)
spark.read.parquet(f"{sf}/lineitem.parquet").count()

FACTS = {"lineitem", "orders", "events", "customer", "part"}
_orig_load = T.load

def patched_load(spark_, sf_dir, *names):
    out = _orig_load(spark_, sf_dir, *names)
    return {k: (ensure_parallelism(v) if k in FACTS else v) for k, v in out.items()}

NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["q1_pricing_summary", "q3_shipping_priority", "q5_supplier_volume", "part_type_topk", "supplier_daily_running", "events_sessionize", "events_asof_purchase_click"]

import callysto_spark.queries.tpch as tpch
import callysto_spark.queries.tpch2 as tpch2
import callysto_spark.queries.tpch3 as tpch3
import callysto_spark.queries.tpch4 as tpch4
import callysto_spark.queries.events as events
MODULES = [tpch, tpch2, tpch3, tpch4, events]

def set_impl(mode):
    f = patched_load if mode == "repart" else _orig_load
    for m in MODULES:
        if hasattr(m, "load"):
            m.load = f

def run(name):
    df = reg[name].fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    release_transient_persists()

for name in NAMES:
    for mode in ("plain", "repart"):
        set_impl(mode)
        for _ in range(5):
            run(name)
    res = {"plain": [], "repart": []}
    for r in range(8):
        for mode in ("plain", "repart") if r % 2 == 0 else ("repart", "plain"):
            set_impl(mode)
            gc.collect(); spark.sparkContext._jvm.System.gc(); time.sleep(0.2)
            t0 = time.perf_counter(); run(name); res[mode].append(time.perf_counter() - t0)
    p, q = min(res["plain"]), min(res["repart"])
    print(f"{name}: plain={p:.3f} repart={q:.3f} delta={(q/p-1)*100:+.1f}%  "
          f"plain={[round(x,2) for x in res['plain']]} repart={[round(x,2) for x in res['repart']]}")
set_impl("plain")
spark.stop()
