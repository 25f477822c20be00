"""Batch-32 additions: churn-risk census, centrality rank agreement.
Value-level correctness is oracle-gated (tools/check_oracle.py at
sf0.001 + sf0.01 under shuffle.partitions 3/17/32); these tests pin
structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational32 import (
    CHURN_MIN_ORDERS,
    q_customer_churn_risk_census,
    q_graph_centrality_rank_agreement,
)


def test_churn_census_scored_population(spark, sf_dir):
    r = q_customer_churn_risk_census(spark, sf_dir).head()
    eligible = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .count()
        .filter(F.col("count") >= CHURN_MIN_ORDERS)
        .count()
    )
    assert r.n_scored == eligible
    assert 0 <= r.n_at_risk <= r.n_scored
    assert r.at_risk_ppm == 1_000_000 * r.n_at_risk // r.n_scored


def test_rank_agreement_is_high_and_bounded(spark, sf_dir):
    """PageRank and Katz are both degree-flavored on this graph, so
    agreement must be strongly positive (the query exists to detect
    when it ISN'T) — and rho is a correlation in ppm."""
    r = q_graph_centrality_rank_agreement(spark, sf_dir).head()
    if r.rho_ppm == -2_000_000:
        # the documented zero-rank-variance sentinel: one metric is
        # constant across nodes (the tiny sf0.001 graph) — verify that
        # this is genuinely the degenerate case, not a silent failure
        from page_rank_mapreduce_java_spark.operators.relational25 import (
            q_graph_katz_centrality,
        )

        kz = q_graph_katz_centrality(spark, sf_dir)
        assert kz.select("katz_e8").distinct().count() == 1
    else:
        assert -1_000_000 <= r.rho_ppm <= 1_000_000
        assert r.rho_ppm > 500_000
    from page_rank_mapreduce_java_spark.graph.queries import (
        cooccurrence_edges,
    )

    e = cooccurrence_edges(spark, sf_dir)
    n_nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert r.n_nodes == n_nodes
