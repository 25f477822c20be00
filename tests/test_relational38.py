"""Batch-38 additions: the mergeable bottom-k quantile sketch family.
Value-level correctness is oracle-gated (tools/check_oracle.py at three
SFs + shuffle.partitions 3/17 + the 10x scale dir); these tests pin the
sketch's structural laws, an independent Python re-derivation of the
global sketch, and the plan shapes that matter at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.operators.relational38 import (
    MERGE_K,
    MONTH_K,
    SKETCH_K,
    _li_hash,
    q_sketch_quantile_bottomk,
    q_sketch_quantile_by_month,
    q_sketch_quantile_merge_audit,
)


def test_bottomk_sketch_matches_python_rederivation(spark, sf_dir):
    """Collect the (value, hash) base relation and re-derive the sketch
    in pure Python: sort by (hv, v), take k, read quantiles at
    (q*(n-1)) div 100 — the query's one-row output must match exactly.
    Pins the ordering, the limit boundary, and the rank formula
    independently of the SQL oracle."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents

    li = load_table(spark, "lineitem", sf_dir)
    base = [
        (r.v, r.hv)
        for r in li.select(
            cents("l_extendedprice").alias("v"), _li_hash().alias("hv")
        ).collect()
    ]
    samp = sorted(base, key=lambda t: (t[1], t[0]))[:SKETCH_K]
    vals = sorted(v for v, _ in samp)
    n = len(vals)
    expected = {
        f"p{q}_cents": vals[(q * (n - 1)) // 100] for q in (25, 50, 75, 90, 99)
    }
    row = q_sketch_quantile_bottomk(spark, sf_dir).collect()[0]
    assert row.k == SKETCH_K
    assert row.n_sample == n == min(SKETCH_K, len(base))
    for col, want in expected.items():
        assert getattr(row, col) == want, col
    # quantiles are monotone by construction
    ps = [row.p25_cents, row.p50_cents, row.p75_cents, row.p90_cents,
          row.p99_cents]
    assert ps == sorted(ps)


def test_merge_audit_proves_mergeability(spark, sf_dir):
    """bottom-k(union of per-group bottom-k) must equal the direct
    global bottom-k as a MULTISET: n_overlap = k and the medians agree
    — on real data, not by construction (the two legs scan lineitem
    independently)."""
    row = q_sketch_quantile_merge_audit(spark, sf_dir).collect()[0]
    assert row.k == MERGE_K
    assert row.n_merged == row.n_direct == MERGE_K
    assert row.n_overlap == MERGE_K
    assert row.p50_merged_cents == row.p50_direct_cents


def test_by_month_sketch_structure(spark, sf_dir):
    rows = q_sketch_quantile_by_month(spark, sf_dir).collect()
    assert rows, "orders must produce at least one month"
    months = [r.month for r in rows]
    assert months == sorted(months)  # ordered output
    for r in rows:
        assert len(r.month) == 7 and r.month[4] == "-"
        assert 1 <= r.n_sample <= MONTH_K
        assert r.p50_cents <= r.p90_cents


def test_batch38_plan_shapes(spark, sf_dir):
    """The global sketches must ride TakeOrderedAndProject (per-partition
    heap + driver merge — never a global sort or single-task window of
    the fact table); no Python, no cartesian products anywhere."""
    from page_rank_mapreduce_java_spark.plans.explain import (
        formatted_plan,
        uses_python_udf,
    )

    for fn in (
        q_sketch_quantile_bottomk,
        q_sketch_quantile_merge_audit,
        q_sketch_quantile_by_month,
    ):
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, fn.__name__
        assert not uses_python_udf(df), fn.__name__
    assert "TakeOrderedAndProject" in formatted_plan(
        q_sketch_quantile_bottomk(spark, sf_dir)
    )
    assert "TakeOrderedAndProject" in formatted_plan(
        q_sketch_quantile_merge_audit(spark, sf_dir)
    )
