"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the blocked variant is
the scale path (restrict the pair space by a blocking key — a coarse
quantizer cell, an LSH bucket, or any partition column). Dot products
run as JVM higher-order functions (zip_with + aggregate): sequential
fold ⇒ bit-deterministic, and fully codegen'd — no Python, no Arrow
crossing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from callysto_spark.operators.relational import top_k_per_group


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    The query side is tiny by construction ⇒ broadcast; the corpus scan
    is embarrassingly parallel (narrow), and the only shuffle is the
    final per-query top-k (k rows per partition per query after partial
    ranking). Ties break on neighbor id, making results total-ordered.
    """
    from callysto_spark.operators.util import ensure_parallelism

    q = corpus.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = ensure_parallelism(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
        keep_rank=True,
    )


def ivf_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Assign each vector to its nearest centroid cell (IVF coarse
    quantization). Centroids are a driver-side list (id, vector) —
    broadcast as literals into one narrow projection; ties break on the
    lower centroid id. No shuffle: assignment is embarrassingly parallel.

    Centroid selection is pluggable (k-means on a sample, PQ, …); any
    deterministic list works — the search path only needs *some*
    partition of the space.
    """
    cells = []
    for cid, cv in centroids:
        carr = F.array(*[F.lit(float(x)) for x in cv])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cells.append(F.struct(d.alias("dist"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*cells))
    return corpus.select(
        F.col(id_col), F.col(vec_col), best.getField("cid").alias("cell")
    )


def ivf_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
) -> DataFrame:
    """IVF-pruned top-k cosine: search only the query's coarse cell.

    The scale path for ANN at 100 TB: the corpus is partitioned by cell
    (in storage: partitionBy(cell)), a query probes 1..nprobe cells, so
    the scan is |corpus|/n_cells instead of |corpus|. Exactness is
    traded for the usual IVF recall; emb_cosine_topk is the exact
    baseline to measure recall against.
    """
    assigned = ivf_assign(corpus, id_col, vec_col, centroids)
    q = assigned.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col("cell").alias("qcell")
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), F.col("cell")
    )
    scored = (
        c.join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
        keep_rank=True,
    )


def cosine_pairs_blocked(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """All embedding pairs with cosine ≥ threshold, restricted to pairs
    sharing ``block_col`` (the IVF-style blocking key). The self-join
    shuffles on the block key only; within-block pair count is what the
    blocking scheme controls.
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col(block_col).alias("blk")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col(block_col).alias("blk")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("blk", "id_a", "id_b", "cosine_sim")
    )
