"""Connected components: cluster near-duplicate pairs into groups.

The step after every pair-producing dedup operator (Jaccard, MinHash-
LSH, SimHash, embedding blocking): near-dup PAIRS become near-dup
GROUPS, and each group keeps one canonical survivor. An iterative
algorithm — Spark has no recursive CTE — implemented as min-label
propagation: every vertex repeatedly adopts the smallest label among
itself and its neighbors until a fixpoint.

Scale shape: the driver loop is CONTROL FLOW only (one convergence
count per iteration); each iteration's data path is one shuffled
join + min-aggregation over the edge list, all distributed. Rounds
needed = graph diameter (near-dup clusters are shallow — a handful of
rounds); the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce") is the refinement for adversarial diameters.
"""

from __future__ import annotations

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
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("v")).distinct().withColumn("label", F.col("v"))
    for _ in range(max_iterations):
        # each vertex adopts min(own label, neighbors' labels)
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
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()  # no-op on the unpersisted initial labels
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))
