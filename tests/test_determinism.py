"""Order-independence contracts: the determinism rules (scaled-integer
sums, floor-rounding, total-order tie-breaks) must make results
BIT-IDENTICAL under different partitionings — the property that lets
the same query hash-match DuckDB from a 32-thread laptop to a
1000-executor cluster."""

from __future__ import annotations

import pytest

from callysto_spark.queries import load_all

REGISTRY = load_all()

# float-accumulation-heavy queries — the ones partitioning would break
# without the fixed-point-sum discipline
CASES = ["q1_pricing_summary", "events_sessionize", "doc_pipeline_clean_corpus", "q8_market_share"]


@pytest.mark.parametrize("name", CASES)
def test_results_invariant_under_partitioning(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        base = sorted(map(str, REGISTRY[name].fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        alt = sorted(map(str, REGISTRY[name].fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt, f"{name}: result depends on partitioning"
