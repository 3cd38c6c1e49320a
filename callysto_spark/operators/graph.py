"""Connected components: cluster near-duplicate pairs into groups.

The step after every pair-producing dedup operator (Jaccard, MinHash-
LSH, SimHash, embedding blocking): near-dup PAIRS become near-dup
GROUPS, and each group keeps one canonical survivor. An iterative
algorithm — Spark has no recursive CTE — implemented as min-label
propagation: every vertex repeatedly adopts the smallest label among
itself and its neighbors until a fixpoint.

Scale shape: the driver loop is CONTROL FLOW only (one tiny convergence
probe per iteration); each iteration's data path is one shuffled
join + min-aggregation over the edge list, all distributed. Every round
``localCheckpoint(eager=True)`` materializes the new labels and
TRUNCATES lineage, so the logical plan stays depth-1 no matter how many
rounds run — without it, analysis time and DAG size grow superlinearly
with iteration count (each round nests another join). On a real cluster
swap ``localCheckpoint`` for reliable ``checkpoint()`` against the
checkpoint dir if executor loss during the loop must be survivable.

Rounds needed = graph diameter (near-dup clusters are shallow — a
handful of rounds); the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond") is the refinement for
adversarial high-diameter graphs.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(src, dst) undirected edges → (vertex, component), component =
    the minimum vertex id in the connected component (deterministic).

    Isolated vertices don't appear in edges and so don't appear in the
    output (callers union them back if needed).

    Warns (``RuntimeWarning``) if the propagation has not reached a
    fixpoint within ``max_iterations`` — the returned labeling is then a
    refinement (components may still be split), and downstream survivor
    selection would keep too many documents. Raise ``max_iterations`` or
    use a star-contraction variant for high-diameter graphs.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("v")).distinct().withColumn("label", F.col("v"))
    prev: DataFrame | None = None  # previous round's checkpointed labels
    changed = 0
    for _ in range(max_iterations):
        # Each vertex adopts min(own label, neighbors' labels). The change
        # flag is computed inline (labels only ever decrease), so the
        # convergence probe is a cheap scan of the just-materialized cache
        # instead of a second old-vs-new self-join.
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy(F.col("a").alias("nv"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["v"] == F.col("nv"), "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
                (F.col("nlabel").isNotNull() & (F.col("nlabel") < F.col("label"))).alias("chg"),
            )
            .localCheckpoint(eager=True)  # materialize + truncate lineage
        )
        changed = new_labels.where("chg").limit(1).count()
        if prev is not None:
            # new_labels' lineage was truncated, so releasing the previous
            # checkpoint cannot orphan any downstream recompute path.
            prev.unpersist()
        prev = new_labels
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    sym.unpersist()
    # The final labels' checkpoint cache intentionally outlives this call:
    # the caller's action consumes it, and a truncated-lineage checkpoint
    # cannot recompute if released early — so it is NOT registered with
    # release_transient_persists(). Cost: one small (vertex, label)
    # cached dataset per invocation, reclaimed on session stop.
    if changed:
        warnings.warn(
            f"connected_components did not converge within {max_iterations} "
            "iterations; returned components may still be split. Increase "
            "max_iterations (rounds needed = graph diameter) or use a "
            "large-star/small-star contraction for high-diameter graphs.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))
