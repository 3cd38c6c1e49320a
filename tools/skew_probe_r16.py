"""Item 8 evidence, take 2: AQE skew-join split firing on a planted
hot-key JOIN at sf1 (events-shaped), with and without skew handling.
Thresholds lowered to test scale (documented in the artifact): the
production 256MB/5x binds only at real corpus scale.
"""
import io
import json
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from callysto_spark.session import get_spark
from callysto_spark.queries import load_all

OUT = "/root/repo/plans/r16"
sf = "/tmp/sf1"
spark = get_spark("skew-probe2", cpus=32, extra_conf={"spark.ui.enabled": "true"})

def stages(min_id=-1):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE&withSummaries=true&quantiles=0.5,1.0"
    with urllib.request.urlopen(url, timeout=10) as r:
        return [s for s in json.load(r) if s["stageId"] > min_id]

def max_stage_id():
    return max((s["stageId"] for s in stages()), default=-1)

# planted: sf1 events with 50% of rows remapped to user 0, padded so the
# hot partition carries real bytes through the shuffle
e = spark.read.parquet(f"{sf}/events.parquet")
planted = e.select(
    F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, F.lit(0))
    .otherwise(F.col("user_id")).alias("user_id"),
    F.sha2(F.col("event_id").cast("string"), 512).alias("pad"),
)
planted.write.mode("overwrite").parquet("/tmp/skew_planted2")
pl = spark.read.parquet("/tmp/skew_planted2")
n = pl.count()
# a genuine dim table (from parquet, not derived in-plan: an intermediate
# HashAggregate between the shuffle stage and the join defeats
# OptimizeSkewedJoin's SMJ(sort+shuffle, sort+shuffle) pattern match —
# bisected in this round, recorded in the artifact header)
pl.select("user_id").distinct().withColumn("seg", F.pmod("user_id", F.lit(7))) \
    .write.mode("overwrite").parquet("/tmp/skew_users_dim")
users = spark.read.parquet("/tmp/skew_users_dim")

conf = spark.conf
conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB")
conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

report = [
    f"# AQE skew-join evidence at sf1 ({n} events rows, 50% planted onto user 0,",
    "# 64-byte sha pads; broadcast disabled so the join takes the shuffled path",
    "# it has at 100 TB; skew thresholds lowered to test scale: 2MB/factor 2,",
    "# advisory 1MB — production keeps the 256MB/5x defaults which bind only at",
    "# real scale). Right side is a parquet dim table: a distinct()-derived",
    "# right side plans HashAggregate between shuffle stage and join, which",
    "# defeats OptimizeSkewedJoin's pattern match (bisected: range/parquet",
    "# right -> split fires; distinct-derived right -> it does not).",
]

def run_join(label, skew_on):
    conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    j = pl.join(users, "user_id")
    base = max_stage_id()
    t0 = time.perf_counter()
    n_out = len(j.collect())  # drive THIS DataFrame's QueryExecution so the
    wall = time.perf_counter() - t0  # final adaptive plan is inspectable
    plan = j._jdf.queryExecution().executedPlan().toString()
    report.append(f"  (rows out: {n_out})")
    report.append(f"\n## {label}: wall {wall:.3f}s  skew-marker in final plan: {'skew=true' in plan}")
    for s in stages(base):
        summ = s.get("taskMetricsDistributions") or {}
        rd = (summ.get("shuffleReadMetrics") or {}).get("readBytes") or [0, 0]
        dur = summ.get("executorRunTime") or [0, 0]
        if rd and max(rd) > 0:
            report.append(
                f"  stage {s['stageId']}: tasks={s['numCompleteTasks']} "
                f"shuffle_read p50/max = {rd[0]/1048576:.2f}/{rd[-1]/1048576:.2f} MB "
                f"(max/median {rd[-1]/max(rd[0],1):.1f}x)  "
                f"task_time p50/max = {dur[0]/1000:.2f}/{dur[-1]/1000:.2f}s"
            )
    return plan

plan_off = run_join("skewJoin DISABLED (the straggler shape)", False)
plan_on = run_join("skewJoin ENABLED (AQE splits the hot partition)", True)

with open(f"{OUT}/aqe_skew_join_sf1_plan.txt", "w") as f:
    f.write("\n".join(report) + "\n\n=== final adaptive plan, skewJoin enabled ===\n"
            + plan_on + "\n\n=== final adaptive plan, skewJoin disabled ===\n" + plan_off)
print("\n".join(report))
spark.stop()
