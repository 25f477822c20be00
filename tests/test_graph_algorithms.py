"""Connected components + BFS semantics on hand-built graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.graph.algorithms import (
    _symmetrize,
    bfs_distances,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def test_cc_two_components(spark):
    # component {1,2,3} and {10,11}; direction must not matter
    e = _edges(spark, [(1, 2), (3, 2), (10, 11)])
    got = {r.id: r.component for r in connected_components(e, max_iterations=5).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_propagation_depth(spark):
    # a path 1-2-3-4-5: min label needs 4 rounds to reach the far end
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r.id: r.component for r in connected_components(e, max_iterations=4).collect()}
    assert set(got.values()) == {1}
    # with too few rounds the far end hasn't converged yet — documents the
    # max_iterations/diameter contract
    partial = {r.id: r.component for r in connected_components(e, max_iterations=1).collect()}
    assert partial[5] == 4 and partial[1] == 1


def test_cc_early_stop_matches_fixed_rounds(spark):
    # early exit at fixpoint must give identical labels to the fixed
    # round budget (fixpoints are stable under further propagation)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (12, 11)])
    fixed = sorted(map(tuple, connected_components(e, max_iterations=8).collect()))
    early = sorted(
        map(tuple, connected_components(e, max_iterations=8, stop_early=True).collect())
    )
    assert early == fixed


def test_bfs_directed_vs_symmetrized(spark):
    e = _edges(spark, [(1, 2), (2, 3), (4, 3)])
    srcs = spark.createDataFrame([(1,)], "id LONG")
    directed = {r.id: r.dist for r in bfs_distances(e, srcs, max_hops=3).collect()}
    assert directed == {1: 0, 2: 1, 3: 2, 4: -1}  # 4 unreachable downstream
    undirected = {
        r.id: r.dist for r in bfs_distances(_symmetrize(e), srcs, max_hops=3).collect()
    }
    assert undirected == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_multiple_sources_take_min(spark):
    e = _edges(spark, [(1, 2), (2, 3), (9, 3)])
    srcs = spark.createDataFrame([(1,), (9,)], "id LONG")
    got = {r.id: r.dist for r in bfs_distances(e, srcs, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 9: 0}


def test_sssp_unit_weights_equals_bfs(spark):
    from page_rank_mapreduce_java_spark.graph.algorithms import (
        bfs_distances,
        sssp_weighted,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (0, 10)],
        "src LONG, dst LONG",
    )
    sources = spark.createDataFrame([(0,)], "src LONG")
    bfs = {(r.id, r.dist) for r in bfs_distances(edges, sources, max_hops=4).collect()}
    w1 = edges.withColumn("w", F.lit(1))
    got = {(r.id, r.dist) for r in sssp_weighted(w1, sources, rounds=4).collect()}
    assert got == bfs


def test_sssp_prefers_cheaper_longer_path(spark):
    from page_rank_mapreduce_java_spark.graph.algorithms import sssp_weighted

    # 0 -> 3 direct costs 10; 0 -> 1 -> 2 -> 3 costs 3.
    edges = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)],
        "src LONG, dst LONG, w LONG",
    )
    sources = spark.createDataFrame([(0,)], "src LONG")
    got = {(r.id, r.dist) for r in sssp_weighted(edges, sources, rounds=4).collect()}
    assert (3, 3) in got and (2, 2) in got and (1, 1) in got and (0, 0) in got
