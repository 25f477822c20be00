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
