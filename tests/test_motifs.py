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


def _sym(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_common_neighbors_uncapped(spark):
    from page_rank_mapreduce_java_spark.graph.queries import common_neighbor_counts

    # Path 1-2-3 plus wedge center 4 shared by 1 and 3.
    got = {
        (r.u, r.v): r.n_common
        for r in common_neighbor_counts(
            _sym(spark, [(1, 2), (2, 3), (1, 4), (3, 4)]), deg_cap=None
        ).collect()
    }
    # 1 and 3 share centers 2 AND 4; 2 and 4 share endpoints 1 and 3.
    assert got == {(1, 3): 2, (2, 4): 2}


def test_common_neighbors_degree_cap_drops_hub_wedges(spark):
    """Hub-heavy graph: center 0 touches 10 leaves (degree 10 > cap), an
    honest wedge center 20 touches leaves 1 and 2 (degree 2 <= cap). With
    the cap, every pair whose only shared neighbor is the hub disappears;
    the honest wedge survives with the same count the uncapped run gives
    it."""
    from page_rank_mapreduce_java_spark.graph.queries import common_neighbor_counts

    pairs = [(0, i) for i in range(1, 11)] + [(20, 1), (20, 2)]
    sym = _sym(spark, pairs)

    uncapped = {
        (r.u, r.v): r.n_common
        for r in common_neighbor_counts(sym, deg_cap=None).collect()
    }
    capped = {
        (r.u, r.v): r.n_common
        for r in common_neighbor_counts(sym, deg_cap=5).collect()
    }
    # Uncapped: all C(10,2)=45 leaf pairs share the hub; (1,2) also share 20.
    assert uncapped[(1, 2)] == 2 and uncapped[(3, 4)] == 1 and len(uncapped) >= 45
    # Capped at 5: hub (deg 10) is no longer a wedge CENTER, so the 45
    # hub-mediated leaf pairs vanish; surviving wedges run through
    # low-degree centers only — (1,2) via center 20, and (0,20) via
    # centers 1 and 2 (the hub may still be an endpoint, just never the
    # fan-out point that blows up Σ deg²).
    assert capped == {(1, 2): 1, (0, 20): 2}
