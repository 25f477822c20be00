"""Stress centrality (graph/centrality.py): exact parity with a naive
pure-Python Brandes-style two-phase count on random graphs, plus
partition invariance (the DuckDB oracle parity runs through
tools/check_oracle.py)."""

from __future__ import annotations

import random
from collections import defaultdict, deque

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.graph.centrality import (
    stress_centrality_sampled,
)


def naive_stress(sym_edges, sources, max_depth):
    """Per-source level BFS: sigma forward, continuation counts g
    backward, stress = Σ_s sigma·g over interior (level ≥ 1) nodes."""
    adj = defaultdict(set)
    nodes = set()
    for u, v in sym_edges:
        adj[u].add(v)
        nodes.add(u)
        nodes.add(v)
    stress = {n: 0 for n in nodes}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == max_depth:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        g = {v: 0 for v in dist}
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    g[v] += 1 + g[w]
        for v in dist:
            if dist[v] >= 1:
                stress[v] += sigma[v] * g[v]
    return stress


def _random_sym_graph(rng, n=14, m=30):
    edges = set()
    for _ in range(m):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((u, v))
            edges.add((v, u))
    return sorted(edges)


def test_stress_matches_naive_on_random_graphs(spark):
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        edges = _random_sym_graph(rng)
        srcs = sorted({u for u, _ in edges})[:3]
        sym = spark.createDataFrame(edges, "src LONG, dst LONG")
        sources = spark.createDataFrame([(s,) for s in srcs], "src LONG")
        got = {
            r.id: r.stress
            for r in stress_centrality_sampled(sym, sources, max_depth=4).collect()
        }
        want = naive_stress(edges, srcs, max_depth=4)
        assert got == want, f"seed {seed}"


def test_stress_invariant_under_partitioning(spark):
    rng = random.Random(3)
    edges = _random_sym_graph(rng, n=20, m=50)
    srcs = sorted({u for u, _ in edges})[:2]
    sources = spark.createDataFrame([(s,) for s in srcs], "src LONG")
    results = []
    for parts in (1, 7):
        sym = spark.createDataFrame(edges, "src LONG, dst LONG").repartition(
            parts
        )
        results.append(
            sorted(
                map(
                    tuple,
                    stress_centrality_sampled(
                        sym, sources, max_depth=3
                    ).collect(),
                )
            )
        )
    assert results[0] == results[1]


def test_stress_on_path_graph(spark):
    """Path a-b-c-d from source a: b is interior to (a,c) and (a,d)
    paths (stress 2), c to (a,d) (stress 1), endpoints 0."""
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    sym = spark.createDataFrame(edges, "src LONG, dst LONG")
    sources = spark.createDataFrame([(1,)], "src LONG")
    got = {
        r.id: r.stress
        for r in stress_centrality_sampled(sym, sources, max_depth=4).collect()
    }
    assert got == {1: 0, 2: 2, 3: 1, 4: 0}
