"""Upsert/SCD2 merge emulation + IVF recall vs exact search."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.merge import merge_scd2, merge_upsert
from page_rank_mapreduce_java_spark.similarity.ann import brute_force_topk, ivf_topk


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id LONG, name STRING, v DOUBLE"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (9, "new", 90.0)], "id LONG, name STRING, v DOUBLE"
    )
    got = {r.id: (r.name, r.v) for r in merge_upsert(target, updates, "id").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 9: ("new", 90.0)}


def test_merge_scd2_history_and_current_flag(spark):
    target = spark.createDataFrame([(1, 100, "v1"), (2, 100, "x1")], "id LONG, batch LONG, val STRING")
    updates = spark.createDataFrame([(1, 200, "v2")], "id LONG, batch LONG, val STRING")
    rows = merge_scd2(target, updates, "id", "batch").collect()
    cur = {(r.id, r.val): r.is_current for r in rows}
    assert cur == {(1, "v1"): 0, (1, "v2"): 1, (2, "x1"): 1}
    assert len(rows) == 3  # full history retained


def test_ivf_recall_against_exact(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(e, q, k=10)
    approx = ivf_topk(e, q, k=10, n_probe=4, n_centroids=16)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # IVF with 4/16 probes must find a meaningful share of true neighbors,
    # and by construction can never exceed exact search.
    assert 0.3 <= recall <= 1.0
    assert len(approx_set) <= len(exact_set)


def test_kmeans_training_moves_centroids(spark, sf_dir):
    """Lloyd iterations must actually update the quantizer: trained
    centroids differ from the first-k seed vectors, stay finite, and
    every cluster id survives (empty clusters keep their previous
    centroid, so k never shrinks)."""
    from page_rank_mapreduce_java_spark.similarity.ann import kmeans_train

    e = load_table(spark, "embeddings", sf_dir)
    seed = {r.centroid_id: list(r.cvec) for r in kmeans_train(e, k=8, iters=0).collect()}
    trained = {r.centroid_id: list(r.cvec) for r in kmeans_train(e, k=8, iters=2).collect()}
    assert set(trained) == set(seed)
    assert any(trained[c] != seed[c] for c in trained)
    assert all(all(abs(x) < 1e6 for x in v) for v in trained.values())


def test_recall_sweep_matches_per_level_recompute(spark, sf_dir):
    """Focused pin on the r13 fused-levels rewrite of
    q_ann_ivf_recall_sweep: the single (n_probe, query_id) window over
    level-replicated candidates must reproduce, for every probe level,
    exactly the (hits, base, recall_ppm) of the r12 shape — an
    independent per-level filter + per-query window + semi-join, built
    here literally."""
    from functools import reduce

    from pyspark.sql.window import Window

    from page_rank_mapreduce_java_spark.functions.vectors import cosine
    from page_rank_mapreduce_java_spark.similarity.ann import (
        ivf_assign,
        kmeans_train,
    )
    from page_rank_mapreduce_java_spark.similarity.queries import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
        N_QUERY_VECS,
        RECALL_PROBES,
        TOP_K,
        q_ann_ivf_recall_sweep,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    brute = brute_force_topk(e, q, k=TOP_K).select("query_id", "neighbor_id")
    cent = kmeans_train(e, k=IVF_CENTROIDS, iters=KMEANS_ITERS)
    assign = ivf_assign(e, cent)
    qv = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qvec"), F.col("cvec"))), F.asc("centroid_id")
    )
    probes = (
        qv.join(F.broadcast(cent), F.lit(True))
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= max(RECALL_PROBES))
        .select("query_id", "qvec", "centroid_id", "prn")
    )
    members = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nvec")
    ).join(assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
    cand = probes.join(members, "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    parts = []
    for np_ in RECALL_PROBES:  # the r12 per-level replay, verbatim
        wr = Window.partitionBy("query_id").orderBy(
            F.desc(cosine(F.col("qvec"), F.col("nvec"))), F.asc("neighbor_id")
        )
        top = (
            cand.filter(F.col("prn") <= np_)
            .withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        parts.append(
            top.join(brute, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(F.lit(np_).cast("long").alias("n_probe"), "hits")
        )
    expected = {
        r.n_probe: r.hits
        for r in reduce(lambda x, y: x.unionByName(y), parts).collect()
    }
    base = brute.count()
    got = {
        r.n_probe: r for r in q_ann_ivf_recall_sweep(spark, sf_dir).collect()
    }
    assert set(got) == set(RECALL_PROBES)
    prev_hits = -1
    for np_ in RECALL_PROBES:
        row = got[np_]
        assert row.hits == expected[np_], f"n_probe={np_}"
        assert row.base == base
        assert row.recall_ppm == row.hits * 1_000_000 // base
        assert row.hits >= prev_hits  # levels are nested: monotone
        prev_hits = row.hits
