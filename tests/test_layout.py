"""Storage layout: partition pruning + bucketed join without shuffle —
the plan-level proof of the 100 TB layout story."""

from __future__ import annotations

from pyspark.sql import functions as F

from callysto_spark.operators.layout import bucketed_table, partitioned_write
from callysto_spark.plans import exchange_count, physical_plan
from callysto_spark.tables import load


def test_partition_pruning(spark, tmp_path, sf_dir):
    o = load(spark, sf_dir, "orders")["orders"]
    out = str(tmp_path / "orders_by_status")
    partitioned_write(o, out, ["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = physical_plan(back)
    # the predicate lands in PartitionFilters → directory pruning, no IO
    # on other partitions
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:800]
    assert back.count() == spark.read.parquet(out).filter("o_orderstatus = 'F'").count()


def test_ivf_index_partition_pruned_probe(spark, tmp_path, sf_dir):
    """The stored-ANN path: ivf_write partitions the corpus by cell;
    a probe's cell filter must land in PartitionFilters (directory
    pruning — only probed cells are read), and stored results must
    match the in-memory ivf_topk exactly."""
    import re

    from callysto_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_stored,
        ivf_write,
        kmeans_centroids,
    )

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    cents = kmeans_centroids(e, "vec_id", "embedding", k=8, iters=3, sample=512)
    path = str(tmp_path / "ivf_index")
    ivf_write(e, "vec_id", "embedding", cents, path)

    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") < 3).collect()
    ]
    stored = ivf_topk_stored(
        spark, path, "vec_id", "embedding", queries, cents, k=10, nprobe=2
    )
    plan = physical_plan(stored)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:800]

    mem = ivf_topk(e, "vec_id", "embedding", [0, 1, 2], cents, k=10, nprobe=2)
    as_set = lambda df: {(r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()}
    assert as_set(stored) == as_set(mem)


def test_bucketed_join_no_shuffle(spark, sf_dir):
    t = load(spark, sf_dir, "orders", "customer")
    bucketed_table(t["orders"].select("o_orderkey", "o_custkey", "o_totalprice"), "b_orders", ["o_custkey"], 8)
    bucketed_table(t["customer"].select("c_custkey", "c_mktsegment"), "b_customer", ["c_custkey"], 8)
    bo, bc = spark.table("b_orders"), spark.table("b_customer")
    joined = bo.join(bc.hint("merge"), bo.o_custkey == bc.c_custkey)
    # co-bucketed sort-merge join: no Exchange on either side
    assert exchange_count(joined) == 0, physical_plan(joined)[:800]
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_ivf_index_append_serves_union_from_frozen_centroids(spark, tmp_path, sf_dir):
    """Incremental index maintenance (r9 verdict item 5): ivf_write
    with mode='append' must place a second batch's vectors in the SAME
    cell= directories the frozen centroids dictate (no new cells, no
    re-assignment of batch 1), and ivf_topk_stored must serve the
    union — equal to an in-memory ivf_topk over the concatenated
    corpus — with partition pruning intact."""
    import os
    import re

    from callysto_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_topk_stored,
        ivf_write,
        kmeans_centroids,
    )

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    first = e.filter(F.col("vec_id") % 2 == 0)
    second = e.filter(F.col("vec_id") % 2 == 1)
    # centroids fitted on batch 1 only, then FROZEN — the append
    # contract: batch 2 is assigned against these, not a re-fit
    cents = kmeans_centroids(first, "vec_id", "embedding", k=8, iters=3, sample=512)
    path = str(tmp_path / "ivf_index")
    ivf_write(first, "vec_id", "embedding", cents, path)
    dirs_before = {d for d in os.listdir(path) if d.startswith("cell=")}
    ivf_write(second, "vec_id", "embedding", cents, path, mode="append")
    dirs_after = {d for d in os.listdir(path) if d.startswith("cell=")}
    # appended files may populate a cell batch 1 left empty, but every
    # directory must be one of the frozen centroids' cells
    frozen_cells = {f"cell={cid}" for cid, _ in cents}
    assert dirs_before <= dirs_after <= frozen_cells

    # each appended vector landed in the directory its frozen-centroid
    # assignment dictates
    stored = spark.read.parquet(path)
    expected = ivf_assign(e, "vec_id", "embedding", cents)
    mism = (
        stored.select("vec_id", F.col("cell").alias("stored_cell"))
        .join(expected.select("vec_id", "cell"), "vec_id", "full_outer")
        .filter(
            F.col("stored_cell").isNull()
            | F.col("cell").isNull()
            | (F.col("stored_cell") != F.col("cell"))
        )
    )
    assert mism.count() == 0

    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in e.filter(F.col("vec_id") < 3).collect()
    ]
    served = ivf_topk_stored(spark, path, "vec_id", "embedding", queries, cents, k=10, nprobe=2)
    plan = physical_plan(served)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:800]
    mem = ivf_topk(e, "vec_id", "embedding", [0, 1, 2], cents, k=10, nprobe=2)
    as_set = lambda df: {(r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()}
    assert as_set(served) == as_set(mem)


def test_ivf_index_stats_flags_drifted_append(spark, tmp_path, sf_dir):
    """ivf_index_stats is the monitoring callable behind ivf_write's
    centroid-drift policy (r10 verdict item 5): a healthy fitted index
    reads near-balanced and unflagged; a deliberately drifted append
    (every new vector a near-copy of ONE stored vector, so frozen
    assignment piles the whole batch into that vector's cell) must
    flip rebuild_recommended via the skew figure. Also pins the cost
    contract: the stats scan reads NO data columns (ReadSchema empty —
    cell comes from directory names), so the health check stays
    metadata-priced on a 100 TB index."""
    import re

    from callysto_spark.operators.similarity import (
        ivf_index_stats,
        ivf_write,
        kmeans_centroids,
    )

    e = load(spark, sf_dir, "embeddings")["embeddings"]
    cents = kmeans_centroids(e, "vec_id", "embedding", k=8, iters=3, sample=512)
    path = str(tmp_path / "ivf_index")
    ivf_write(e, "vec_id", "embedding", cents, path)
    healthy = ivf_index_stats(spark, path, n_cells=len(cents))
    assert healthy["rows"] == e.count()
    assert healthy["n_cells_observed"] == len(healthy["cells"]) <= len(cents)
    assert healthy["skew"] >= 1.0

    # drifted batch: one stored vector replicated 4x the corpus size
    # with fresh ids — frozen-centroid assignment sends ALL of it to
    # that vector's cell
    n = e.count()
    seed = e.limit(1).select("embedding")
    drifted = (
        spark.range(n * 4)
        .select((F.col("id") + 1_000_000).alias("vec_id"))
        .crossJoin(F.broadcast(seed))
        .select("vec_id", F.col("embedding").alias("embedding"), F.lit("drift").alias("label"))
    )
    ivf_write(drifted, "vec_id", "embedding", cents, path, mode="append")
    after = ivf_index_stats(spark, path, n_cells=len(cents))
    assert after["rows"] == n * 5
    assert after["skew"] > healthy["skew"]
    assert after["skew"] > 4.0
    assert after["rebuild_recommended"] is True

    # cost contract: zero data columns in the scan
    counted = spark.read.parquet(path).groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    plan = physical_plan(counted)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None and m.group(1) == "", plan[:800]
