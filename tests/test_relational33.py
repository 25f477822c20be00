"""Batch-33 additions: basket-size histogram, repeat rate by segment.
Value-level correctness is oracle-gated (tools/check_oracle.py at
sf0.001 + sf0.01 under shuffle.partitions 3/17/32); these tests pin
structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational33 import (
    q_customer_repeat_rate_by_segment,
    q_orders_basket_size_histogram,
)


def test_basket_histogram_matches_pair_bound(spark, sf_dir):
    """The histogram's Σ pair_contribution must equal the pairsize
    chassis's Σ basket² bound (triangular form) on the same relation —
    the two views of the same quantity."""
    from page_rank_mapreduce_java_spark.plans.pairsize import (
        sum_sq_group_bound,
    )

    rows = q_orders_basket_size_histogram(spark, sf_dir).collect()
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey")
    assert sum(r.n_orders * r.basket_size for r in rows) == li.count()
    bound = sum_sq_group_bound(li, ["l_orderkey"])
    # bound = Σ g²; triangular pairs = (Σ g² − Σ g) / 2
    n = li.count()
    assert sum(r.pair_contribution for r in rows) == (bound - n) // 2


def test_repeat_rate_partitions_customers(spark, sf_dir):
    rows = q_customer_repeat_rate_by_segment(spark, sf_dir).collect()
    assert rows
    ordering = (
        load_table(spark, "orders", sf_dir)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == ordering
    for r in rows:
        assert 0 <= r.n_repeat <= r.n_customers
        assert r.repeat_ppm == 1_000_000 * r.n_repeat // r.n_customers
