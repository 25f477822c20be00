"""Batch-40 additions: weighted heavy hitters. Value-level correctness
is oracle-gated (tools/check_oracle.py at three SFs + shuffle.partitions
3/17 + the 10x scale dir); these tests pin an independent pure-Python
re-derivation of the sharded weighted top-m merge, the weighted
Misra-Gries bound, and the plan shapes."""

from __future__ import annotations

from collections import Counter, defaultdict

from page_rank_mapreduce_java_spark.operators.relational40 import (
    WHH_PER_SHARD,
    WHH_TOPK,
    _weighted_base,
    q_sketch_heavy_hitters_weighted,
    q_sketch_heavy_hitters_weighted_audit,
)


def _python_weighted_sketch(base):
    """Re-derive: per-shard exact weight sums, top WHH_PER_SHARD by
    (weight DESC, key), merged per-key sums."""
    sums = Counter()
    for shard, key, w in base:
        sums[(shard, key)] += w
    by_shard = defaultdict(list)
    for (s, k), ws in sums.items():
        by_shard[s].append((k, ws))
    est, n_shards = Counter(), Counter()
    for s, items in by_shard.items():
        items.sort(key=lambda kw: (-kw[1], kw[0]))
        for k, ws in items[:WHH_PER_SHARD]:
            est[k] += ws
            n_shards[k] += 1
    return est, n_shards, by_shard


def test_weighted_topk_matches_python_rederivation(spark, sf_dir):
    base = [
        (r.shard, r.key, r.w)
        for r in _weighted_base(spark, sf_dir).collect()
    ]
    est, n_shards, _ = _python_weighted_sketch(base)
    want = sorted(est.items(), key=lambda kw: (-kw[1], kw[0]))[:WHH_TOPK]
    got = q_sketch_heavy_hitters_weighted(spark, sf_dir).collect()
    assert [(r.key, r.est_cents, r.n_shards) for r in got] == [
        (k, w, n_shards[k]) for k, w in want
    ]


def test_weighted_audit_invariants_and_rederivation(spark, sf_dir):
    base = [
        (r.shard, r.key, r.w)
        for r in _weighted_base(spark, sf_dir).collect()
    ]
    est, _, by_shard = _python_weighted_sketch(base)
    exact = Counter()
    for _, key, w in base:
        exact[key] += w
    assert all(est[k] <= exact[k] for k in est)
    cap = 0
    for items in by_shard.values():
        items.sort(key=lambda kw: (-kw[1], kw[0]))
        if len(items) >= WHH_PER_SHARD:
            cap += items[WHH_PER_SHARD - 1][1]
    assert all(exact[k] - est[k] <= cap for k in exact)

    row = q_sketch_heavy_hitters_weighted_audit(spark, sf_dir).collect()[0]
    assert row.k == WHH_TOPK
    assert 0 <= row.n_found_of_exact_topk <= WHH_TOPK
    assert 0 <= row.n_underestimated <= WHH_TOPK
    assert 0 <= row.max_underestimate_cents <= row.total_cap_cents
    assert row.total_cap_cents == cap


def test_batch40_plan_shapes(spark, sf_dir):
    from page_rank_mapreduce_java_spark.plans.explain import (
        formatted_plan,
        uses_python_udf,
    )

    for fn in (
        q_sketch_heavy_hitters_weighted,
        q_sketch_heavy_hitters_weighted_audit,
    ):
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, fn.__name__
        assert not uses_python_udf(df), fn.__name__
    assert "TakeOrderedAndProject" in formatted_plan(
        q_sketch_heavy_hitters_weighted(spark, sf_dir)
    )
