"""Item 5: maxPartitionBytes 128MB vs 512MB vs 1GB at sf1 — same-session
interleaved (runtime SQL conf), scan-heavy rows, with scan task counts.
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from callysto_spark.operators.util import release_transient_persists
from callysto_spark.queries import load_all
from callysto_spark.session import get_spark

sf = "/tmp/sf1"
NAMES = ["doc_token_stats", "doc_pipeline_clean_corpus", "q1_pricing_summary"]
SETTINGS = ["134217728", "536870912", "1073741824"]
reg = load_all()
spark = get_spark("ab-mpb", cpus=32)
spark.read.parquet(f"{sf}/lineitem.parquet").count()

def run(name):
    df = reg[name].fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    release_transient_persists()

# scan task counts per setting (the binding check)
for s in SETTINGS:
    spark.conf.set("spark.sql.files.maxPartitionBytes", s)
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    print(f"maxPartitionBytes={int(s)//1048576}MB: lineitem scan partitions="
          f"{li.rdd.getNumPartitions()} documents={docs.rdd.getNumPartitions()}")

for name in NAMES:
    for s in SETTINGS:
        spark.conf.set("spark.sql.files.maxPartitionBytes", s)
        for _ in range(3):
            run(name)
    res = {s: [] for s in SETTINGS}
    for r in range(6):
        order = SETTINGS if r % 2 == 0 else SETTINGS[::-1]
        for s in order:
            spark.conf.set("spark.sql.files.maxPartitionBytes", s)
            gc.collect(); spark.sparkContext._jvm.System.gc(); time.sleep(0.2)
            t0 = time.perf_counter(); run(name); res[s].append(time.perf_counter() - t0)
    print(name + ": " + "  ".join(
        f"{int(s)//1048576}MB min={min(v):.3f}" for s, v in res.items()))
spark.stop()
