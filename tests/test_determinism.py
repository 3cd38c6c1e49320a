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
