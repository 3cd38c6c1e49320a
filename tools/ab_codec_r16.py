"""One arm of the shuffle-codec A/B (lz4 vs zstd) at sf1.

Run alternately:  python ab_codec.py lz4 | zstd  (3 rounds each).
Records min wall over RUNS per query + total shuffle write MB (REST).
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
from callysto_spark.operators.util import release_transient_persists
from callysto_spark.queries import load_all
from callysto_spark.session import get_spark

codec = sys.argv[1]
NAMES = ["doc_ngram_jaccard_capped", "doc_near_dup_components"]
RUNS = int(os.environ.get("AB_RUNS", "5"))
WARMS = int(os.environ.get("AB_WARMS", "4"))
sf = "/tmp/sf1"

reg = load_all()
spark = get_spark(
    "ab-codec",
    cpus=32,
    extra_conf={"spark.io.compression.codec": codec, "spark.ui.enabled": "true"},
)
assert spark.conf.get("spark.io.compression.codec") == codec
spark.read.parquet(f"{sf}/lineitem.parquet").count()

def stages():
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)

def run(name):
    df = reg[name].fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    release_transient_persists()

import gc
out = {}
for name in NAMES:
    for _ in range(WARMS):
        run(name)
    pre = sum(s.get("shuffleWriteBytes", 0) for s in stages())
    best = float("inf")
    t_all0 = time.perf_counter()
    for _ in range(RUNS):
        gc.collect(); spark.sparkContext._jvm.System.gc(); time.sleep(0.2)
        t0 = time.perf_counter(); run(name); best = min(best, time.perf_counter() - t0)
    post = sum(s.get("shuffleWriteBytes", 0) for s in stages())
    out[name] = {
        "min_s": round(best, 3),
        "shuffle_mb_per_run": round((post - pre) / RUNS / 1048576, 2),
    }
print(json.dumps({"codec": codec, **out}))
spark.stop()
