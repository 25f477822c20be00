"""Batch-26 additions: WCC size histogram, nation affinity lift,
winsorized mean, label-centroid distances, dedup token savings.
Value-level correctness is oracle-gated (tools/check_oracle.py at
sf0.001 + sf0.01 under shuffle.partitions 3/17/32); these tests pin
structural invariants and the exactness contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational26 import (
    q_dedup_savings_tokens,
    q_embedding_label_centroid_distances,
    q_graph_wcc_size_histogram,
    q_lineitem_winsorized_mean,
    q_nation_affinity_lift,
)


def test_wcc_histogram_accounts_for_every_node(spark, sf_dir):
    from page_rank_mapreduce_java_spark.graph.queries import derived_edges

    rows = q_graph_wcc_size_histogram(spark, sf_dir).collect()
    assert rows
    e = derived_edges(spark, sf_dir)
    n_nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert sum(r.n_nodes for r in rows) == n_nodes
    assert all(r.n_nodes == r.component_size * r.n_components for r in rows)


def test_affinity_lift_marginal_identity(spark, sf_dir):
    """EXPECTED-weighted mean lift is exactly 1e6: with
    e_ij = row_i·col_j/T, Σ e_ij·lift_ij = Σ rev_ij = T — the lift
    identity, up to ppm rounding per cell."""
    rows = q_nation_affinity_lift(spark, sf_dir).collect()
    assert len(rows) > 0
    row_m: dict[str, int] = {}
    col_m: dict[str, int] = {}
    for r in rows:
        row_m[r.supp_nation] = row_m.get(r.supp_nation, 0) + r.revenue_cents
        col_m[r.cust_nation] = col_m.get(r.cust_nation, 0) + r.revenue_cents
    tot = sum(r.revenue_cents for r in rows)
    weighted = (
        sum(
            (row_m[r.supp_nation] * col_m[r.cust_nation] / tot) * r.lift_ppm
            for r in rows
        )
        / tot
    )
    assert abs(weighted - 1_000_000) < 50
    assert all(r.lift_ppm > 0 for r in rows)


def test_winsorized_mean_between_clamps(spark, sf_dir):
    r = q_lineitem_winsorized_mean(spark, sf_dir).head()
    assert r.p01_cents <= r.winsorized_mean_cents <= r.p99_cents
    n = load_table(spark, "lineitem", sf_dir).count()
    assert r.n == n
    # clamping a right-skewed price distribution pulls the mean toward
    # the body, but never past the clamp points
    assert r.p01_cents < r.p99_cents


def test_label_distances_shape_and_symmetry_free(spark, sf_dir):
    rows = q_embedding_label_centroid_distances(spark, sf_dir).collect()
    labels = {
        r.label
        for r in load_table(spark, "embeddings", sf_dir)
        .select("label")
        .distinct()
        .collect()
    }
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    assert all(r.la < r.lb and r.dist_micro2 >= 0 for r in rows)


def test_dedup_savings_consistent_with_clusters(spark, sf_dir):
    from page_rank_mapreduce_java_spark.dedup.queries import q_dedup_clusters

    rows = q_dedup_savings_tokens(spark, sf_dir).collect()
    assert rows
    n_dropped = sum(r.n_dropped_docs for r in rows)
    dup_total = (
        q_dedup_clusters(spark, sf_dir).agg(F.sum("is_dup")).head()[0]
    )
    assert n_dropped == dup_total
    for r in rows:
        assert 0 <= r.tokens_dropped <= r.tokens_total
        assert r.saved_ppm == 1_000_000 * r.tokens_dropped // r.tokens_total
