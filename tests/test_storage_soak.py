"""Single-session storage soak over the FULL query registry (r12
verdict item 6).

A long-lived session running many registry queries (the driver's
correctness walk, the rotation harness, a real user's notebook) must
not accumulate persisted datasets: every operator-internal persist /
localCheckpoint is either released before its operator returns or
registered with ``release_transient_persists`` and reclaimed at the
next registry-query boundary (``queries/__init__.py`` wrapper). A leak
here is invisible at sf0.001 and fatal at 100x corpus residency — the
executor storage pool fills with dead shingle tables and CC label
checkpoints until real working sets spill.

Two probes, both JVM-side truth rather than Python bookkeeping:
- ``sc.getPersistentRDDs`` — RDD-level persists (localCheckpoint
  blocks: connected_components' label/star checkpoints);
- ``sharedState().cacheManager()`` emptiness — Dataset-level persists
  (transient_persist: dedup shingle/banded tables, global_rank).

The assertion is RETURN-TO-BASELINE after each query's boundary sweep,
not absolute-zero: the session fixture is shared with other tests that
may legitimately hold caches when this test starts.
"""

from __future__ import annotations

from callysto_spark.operators.util import release_transient_persists
from callysto_spark.queries import load_all


def _storage_counts(spark) -> tuple[int, bool]:
    """(persistent-RDD count, Dataset cache-manager empty?) — JVM truth."""
    n_rdds = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    cache_empty = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    return n_rdds, cache_empty


def test_registry_soak_storage_returns_to_baseline(spark, sf_dir):
    registry = load_all()
    # establish the baseline AFTER a sweep: whatever other tests left
    # cached is theirs; this test guards against NEW accumulation
    release_transient_persists()
    base_rdds, base_cache_empty = _storage_counts(spark)

    leaks: list[str] = []
    for name, q in registry.items():
        # consume the result the way the driver does (full action),
        # then run the boundary sweep the next registry call would run
        q.fn(spark, sf_dir).count()
        release_transient_persists()
        n_rdds, cache_empty = _storage_counts(spark)
        if n_rdds > base_rdds or (base_cache_empty and not cache_empty):
            leaks.append(
                f"{name}: persistent RDDs {base_rdds} -> {n_rdds}, "
                f"cacheManager empty {base_cache_empty} -> {cache_empty}"
            )
            # re-baseline so one leaky query doesn't mask later ones
            base_rdds, base_cache_empty = n_rdds, cache_empty
    assert not leaks, (
        "storage did not return to baseline after the boundary sweep for: "
        + "; ".join(leaks)
    )


def test_release_local_checkpoint_contract(spark):
    """Pin the helper's discrimination: it frees a localCheckpoint's
    RDD-level blocks (which Dataset.unpersist() provably does not —
    the defect the soak test caught) and declines plain Dataset
    persists (returning False so the sweep falls through to
    unpersist())."""
    from callysto_spark.operators.util import release_local_checkpoint

    sc = spark.sparkContext

    def n_rdds():
        return sc._jsc.sc().getPersistentRDDs().size()

    base = n_rdds()
    ck = spark.range(100).localCheckpoint(eager=True)
    assert n_rdds() == base + 1
    # the defect: Dataset.unpersist() leaves the checkpoint blocks
    ck.unpersist()
    assert n_rdds() == base + 1
    # the fix: RDD-level release through the LogicalRDD
    assert release_local_checkpoint(ck) is True
    assert n_rdds() == base
    # a plain Dataset persist is NOT a LogicalRDD: helper declines,
    # CacheManager release still works
    cached = spark.range(100).persist()
    cached.count()
    assert release_local_checkpoint(cached) is False
    assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    cached.unpersist()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
