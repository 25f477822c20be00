"""Triangle counting and k-core semantics on literal graphs with
hand-computed answers (the oracle gate covers the corpus-scale queries;
these pin the operator math itself)."""

from __future__ import annotations

from page_rank_mapreduce_java_spark.graph.motifs import kcore, triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangles_k4(spark):
    # K4: every one of the 4 nodes sits in C(3,2) = 3 triangles.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r.id: r.triangles for r in triangle_counts(_edges(spark, k4)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_with_pendant_and_square(spark):
    # Triangle 0-1-2, pendant 3 off node 0, and square 4-5-6-7 (no diagonal:
    # a 4-cycle has no triangles).
    pairs = [(0, 1), (0, 2), (1, 2), (0, 3), (4, 5), (5, 6), (6, 7), (4, 7)]
    got = {r.id: r.triangles for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0}


def test_triangles_skewed_hub(spark):
    # Star hub 0 with 20 leaves plus one leaf-leaf edge: exactly 1 triangle.
    pairs = [(0, i) for i in range(1, 21)] + [(1, 2)]
    got = {r.id: r.triangles for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got[0] == 1 and got[1] == 1 and got[2] == 1
    assert all(got[i] == 0 for i in range(3, 21))


def test_kcore_peels_pendants_transitively(spark):
    # Chain 3-4-5 hangs off triangle 0-1-2: with k=2, peeling removes 5,
    # then 4, then 3 (transitive — needs >1 round); the triangle survives
    # with in-core degree 2.
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5)]
    got = {r.id: r.core_degree for r in kcore(_edges(spark, pairs), k=2, rounds=6).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_empty_when_k_exceeds_graph(spark):
    pairs = [(0, 1), (1, 2), (0, 2)]
    assert kcore(_edges(spark, pairs), k=3, rounds=3).count() == 0
