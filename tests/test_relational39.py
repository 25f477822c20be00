"""Batch-39 additions: the deterministic heavy-hitters sketch family and
sampled fixed-point betweenness. Value-level correctness is oracle-gated
(tools/check_oracle.py at three SFs + shuffle.partitions 3/17 + the 10x
scale dir); these tests pin independent pure-Python re-derivations (the
sharded top-m merge; Brandes' two-phase accumulation with the integer-
division rounding contract), the sketch guarantees, and the plan shapes
that matter at 100 TB."""

from __future__ import annotations

import random
from collections import Counter, defaultdict, deque

from page_rank_mapreduce_java_spark.graph.centrality import (
    betweenness_sampled,
)
from page_rank_mapreduce_java_spark.operators.relational39 import (
    HH_LANG_TOPK,
    HH_PER_SHARD,
    HH_SHARDS,
    HH_TOPK,
    _tokens,
    q_sketch_heavy_hitters_audit,
    q_sketch_heavy_hitters_by_lang,
    q_sketch_heavy_hitters_topk,
)


def _collected_base(spark, sf_dir):
    return [
        (r.lang, r.shard, r.token)
        for r in _tokens(spark, sf_dir).collect()
    ]


def _python_sketch(base):
    """Re-derive the sharded top-m merge: per-shard exact counts, top
    HH_PER_SHARD by (count DESC, token), merged per-token sums."""
    per_shard = Counter((s, t) for _, s, t in base)
    by_shard = defaultdict(list)
    for (s, t), c in per_shard.items():
        by_shard[s].append((t, c))
    est, n_shards = Counter(), Counter()
    for s, items in by_shard.items():
        items.sort(key=lambda tc: (-tc[1], tc[0]))
        for t, c in items[:HH_PER_SHARD]:
            est[t] += c
            n_shards[t] += 1
    return est, n_shards, by_shard


def test_heavy_hitters_topk_matches_python_rederivation(spark, sf_dir):
    base = _collected_base(spark, sf_dir)
    est, n_shards, _ = _python_sketch(base)
    want = sorted(est.items(), key=lambda tc: (-tc[1], tc[0]))[:HH_TOPK]
    got = q_sketch_heavy_hitters_topk(spark, sf_dir).collect()
    assert [(r.token, r.est_count, r.n_shards) for r in got] == [
        (t, c, n_shards[t]) for t, c in want
    ]


def test_heavy_hitters_audit_invariants_and_rederivation(spark, sf_dir):
    """The two sketch guarantees, checked independently of the SQL
    oracle: est(key) ≤ f(key) for EVERY key (the estimate is a sum of
    exact partials), and the audit row's measured undercount respects
    the measured cap."""
    base = _collected_base(spark, sf_dir)
    est, _, by_shard = _python_sketch(base)
    exact = Counter(t for _, _, t in base)
    assert all(est[t] <= exact[t] for t in est)
    cap = 0
    for items in by_shard.values():
        items.sort(key=lambda tc: (-tc[1], tc[0]))
        if len(items) >= HH_PER_SHARD:
            cap += items[HH_PER_SHARD - 1][1]
    assert all(exact[t] - est[t] <= cap for t in exact)

    row = q_sketch_heavy_hitters_audit(spark, sf_dir).collect()[0]
    assert row.k == HH_TOPK
    assert 0 <= row.n_found_of_exact_topk <= HH_TOPK
    assert 0 <= row.n_underestimated <= HH_TOPK
    assert 0 <= row.max_underestimate <= row.total_cap
    assert row.total_cap == cap


def test_heavy_hitters_by_lang_structure(spark, sf_dir):
    rows = q_sketch_heavy_hitters_by_lang(spark, sf_dir).collect()
    assert rows
    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r.lang].append((r.est_count, r.token))
    for lang, items in per_lang.items():
        assert 1 <= len(items) <= HH_LANG_TOPK, lang
        # ordered by est DESC, token ASC within each lang
        assert items == sorted(items, key=lambda ec: (-ec[0], ec[1])), lang


# --- betweenness -----------------------------------------------------------------


def naive_betweenness_fp(sym_edges, sources, max_depth, scale):
    """Brandes two-phase with the fixed-point contract: one integer
    division per DAG edge, δ_fp(v) = Σ_w (σv·(scale+δ_fp(w))) // σw,
    accumulated deepest-level-first; bc = Σ_s δ_fp over interior."""
    adj = defaultdict(set)
    nodes = set()
    for u, v in sym_edges:
        adj[u].add(v)
        nodes.add(u)
        nodes.add(v)
    bc = {n: 0 for n in nodes}
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
        delta = {v: 0 for v in dist}
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += (sigma[v] * (scale + delta[w])) // sigma[w]
        for v in dist:
            if dist[v] >= 1:
                bc[v] += delta[v]
    return bc


def test_betweenness_diamond_exact():
    """On the diamond 1-2-4, 1-3-4, 4-5 from source 1 the ratios are
    exact halves: δ(4)=1, δ(2)=δ(3)=1 (σ=1 over σ=2 of (1+1)), δ(5)=0 —
    the integer division loses nothing, so fp values are exact."""
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    sym = edges + [(b, a) for a, b in edges]
    bc = naive_betweenness_fp(sym, [1], max_depth=4, scale=10_000)
    assert bc[2] == 10_000 and bc[3] == 10_000
    assert bc[4] == 10_000  # (2·(10000+0))//2 from w=5
    assert bc[5] == 0 and bc[1] == 0


def test_betweenness_matches_naive_on_random_graphs(spark):
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        edges = set()
        for _ in range(30):
            u, v = rng.randrange(14), rng.randrange(14)
            if u != v:
                edges.add((u, v))
                edges.add((v, u))
        edges = sorted(edges)
        srcs = sorted({u for u, _ in edges})[:3]
        sym = spark.createDataFrame(edges, "src LONG, dst LONG")
        sources = spark.createDataFrame([(s,) for s in srcs], "src LONG")
        got = {
            r.id: r.betweenness_fp
            for r in betweenness_sampled(
                sym, sources, max_depth=4, scale=10_000
            ).collect()
        }
        want = naive_betweenness_fp(edges, srcs, max_depth=4, scale=10_000)
        assert got == want, f"seed {seed}"


def test_betweenness_fp_rounding_is_per_edge(spark):
    """A triangle fan where σ ratios are thirds: source 0 connects to
    1,2,3, all of which connect to 4. σ(4)=3; δ(1)=δ(2)=δ(3) =
    (1·scale)//3 — the floor happens per edge, so the naive and the
    DataFrame implementation must agree on the truncated value, not a
    float approximation of 1/3."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4), (3, 4)]
    sym = edges + [(b, a) for a, b in edges]
    df_edges = spark.createDataFrame(sorted(sym), "src LONG, dst LONG")
    sources = spark.createDataFrame([(0,)], "src LONG")
    got = {
        r.id: r.betweenness_fp
        for r in betweenness_sampled(
            df_edges, sources, max_depth=4, scale=10_000
        ).collect()
    }
    assert got[1] == got[2] == got[3] == (1 * 10_000) // 3  # 3333, not 3334
    assert got[4] == 0 and got[0] == 0


def test_batch39_plan_shapes(spark, sf_dir):
    """No cartesian products, no Python eval; the global top-K rides
    TakeOrderedAndProject (per-partition heap + driver merge)."""
    from page_rank_mapreduce_java_spark.plans.explain import (
        formatted_plan,
        uses_python_udf,
    )

    for fn in (
        q_sketch_heavy_hitters_topk,
        q_sketch_heavy_hitters_audit,
        q_sketch_heavy_hitters_by_lang,
    ):
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, fn.__name__
        assert not uses_python_udf(df), fn.__name__
    assert "TakeOrderedAndProject" in formatted_plan(
        q_sketch_heavy_hitters_topk(spark, sf_dir)
    )
