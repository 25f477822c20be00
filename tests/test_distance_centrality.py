"""Semantics tests for the labeled-BFS distance-centrality family:
brute-force BFS in Python over the collected edge relation."""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F


def _sym_adj(spark, sf_dir):
    from page_rank_mapreduce_java_spark.graph.queries import derived_edges

    edges = derived_edges(spark, sf_dir).collect()
    adj: dict[int, set[int]] = {}
    for e in edges:
        adj.setdefault(e.src, set()).add(e.dst)
        adj.setdefault(e.dst, set()).add(e.src)
    return adj


def _bfs_levels(adj, src, max_depth):
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if dist[u] >= max_depth:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_labeled_bfs_family_matches_python_bfs(spark, sf_dir):
    from page_rank_mapreduce_java_spark.graph.queries import (
        BFS_HOPS,
        BFS_SOURCE_MAX,
        HARM_SCALE,
        q_graph_avg_path_length,
        q_graph_eccentricity,
        q_harmonic_centrality,
    )

    adj = _sym_adj(spark, sf_dir)
    sources = [s for s in adj if s <= BFS_SOURCE_MAX]
    per_src = {s: _bfs_levels(adj, s, BFS_HOPS) for s in sources}

    harm: dict[int, int] = {v: 0 for v in adj}
    ecc: dict[int, tuple[int, int]] = {}
    n_pairs = sum_levels = 0
    for s, dist in per_src.items():
        reached = [(v, d) for v, d in dist.items() if d >= 1]
        ecc[s] = (max(d for _, d in reached), len(reached))
        for v, d in reached:
            harm[v] += HARM_SCALE // d
            n_pairs += 1
            sum_levels += d

    got_h = {r.id: r.harm12 for r in q_harmonic_centrality(spark, sf_dir).collect()}
    assert got_h == harm

    got_e = {
        r.s: (r.ecc, r.n_reached)
        for r in q_graph_eccentricity(spark, sf_dir).collect()
    }
    assert got_e == ecc

    got_a = q_graph_avg_path_length(spark, sf_dir).collect()[0]
    assert (got_a.n_pairs, got_a.sum_levels) == (n_pairs, sum_levels)
    assert got_a.avg_milli == round(sum_levels / n_pairs * 1e3)


def test_levels_cache_is_per_application(spark, sf_dir):
    """Two calls reuse the memoized levels DataFrame (one BFS run)."""
    from page_rank_mapreduce_java_spark.graph.queries import (
        _LEVELS_CACHE,
        _corpus_levels,
    )

    _LEVELS_CACHE.clear()
    a = _corpus_levels(spark, sf_dir)
    b = _corpus_levels(spark, sf_dir)
    assert a is b
    assert len(_LEVELS_CACHE) == 1
