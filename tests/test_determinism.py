"""Partition-topology invariance: every registry query must produce
bit-identical results regardless of the session's partitioning knobs.

The driver runs queries on its OWN plain session, whose
``spark.sql.shuffle.partitions`` (200 by default) and scan-split sizing
differ from the test session's. A query whose output depends on the
reduce topology — unrounded float accumulation, an under-specified
top-k tie-break, ``monotonically_increasing_id`` leaking into output —
passes the fixed-partitioning oracle harness yet hash-mismatches on the
driver. This sweep executes each query under two deliberately different
topologies (7-partition shuffles vs 200-partition shuffles with scan
splits forced tiny) and compares normalized rows exactly, so the
registry's determinism rules (see callysto_spark/queries docstring) are
enforced by test rather than by convention.
"""

from __future__ import annotations

import pytest

from callysto_spark.queries import load_all
from tests.test_oracle import normalize

REGISTRY = load_all()

# (shuffle.partitions, files.maxPartitionBytes): coprime shuffle widths
# and a 128 KB scan split to vary BOTH map-side and reduce-side
# topology between the two runs.
_TOPOLOGIES = (("7", "134217728"), ("200", "131072"))


def _run(spark, name, sf_dir):
    rows = [tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect()]
    cols = list(REGISTRY[name].fn(spark, sf_dir).columns)
    return normalize(cols, rows)


def test_nondet_auditor_catches_dual_consumed_range_exchange(spark):
    """Self-test on the exact bug class sf1 caught in global_rank: a
    repartitionByRange (+ spark_partition_id) subtree consumed by two
    branches compiles two exchanges with independently SAMPLED
    boundaries — the auditor must flag it, and must stop flagging once
    a persist pins one materialization (cache substitution turns the
    shared subtree into an InMemoryRelation leaf)."""
    from pyspark.sql import functions as F

    from callysto_spark.plans import nondet_dual_consumption

    base = spark.range(1000).withColumn("x", (F.col("id") * 37) % 1001)
    ranged = base.repartitionByRange(8, "x").withColumn("pid", F.spark_partition_id())
    bad = ranged.groupBy("pid").count().join(ranged.select("pid", "x"), "pid")
    flags = nondet_dual_consumption(bad)
    assert flags and any("RepartitionByExpression" in f for f in flags), flags

    p = ranged.persist()
    try:
        good = p.groupBy("pid").count().join(p.select("pid", "x"), "pid")
        assert nondet_dual_consumption(good) == []
    finally:
        p.unpersist()

    # single consumption of a nondeterminism source is fine by design
    assert nondet_dual_consumption(ranged.groupBy("pid").count()) == []


def test_registry_no_dual_consumed_nondeterminism(spark, sf_dir):
    """Every registry query's optimized plan, every run: no
    nondeterministic subtree (range-sampled exchange, rand salt,
    partition id, Sample) may feed more than one consumer without an
    intervening persist. This encodes the one-time round-6 package
    audit (commit 6879344) as a standing gate — it would have caught
    the global_rank boundary-drift bug before the sf1 run did."""
    from callysto_spark.plans import nondet_dual_consumption

    failures = {}
    for name in sorted(REGISTRY):
        flags = nondet_dual_consumption(REGISTRY[name].fn(spark, sf_dir))
        if flags:
            failures[name] = flags
    assert not failures, (
        f"nondeterministic subtrees consumed by >1 branch (persist the "
        f"shared table or make the source single-consumer): {failures}"
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_partition_topology_invariance(name, spark, sf_dir):
    saved = {
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
    }
    results = []
    try:
        for shuffle, split in _TOPOLOGIES:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle)
            spark.conf.set("spark.sql.files.maxPartitionBytes", split)
            results.append(_run(spark, name, sf_dir))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    (c1, r1), (c2, r2) = results
    assert c1 == c2, f"{name}: column order differs across topologies"
    assert len(r1) == len(r2), (
        f"{name}: row count {len(r1)} vs {len(r2)} across topologies"
    )
    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(r1, r2)) if a != b]
    assert not diffs, (
        f"{name}: {len(diffs)} rows differ between shuffle topologies "
        f"(output depends on partitioning); first 3: {diffs[:3]}"
    )
