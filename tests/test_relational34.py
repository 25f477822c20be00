"""Batch-34 addition: the k-core decomposition curve. Value-level
correctness is oracle-gated (tools/check_oracle.py at sf0.001 + sf0.01
under shuffle.partitions 3/17/32); these tests pin the decomposition's
structural laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.operators.relational34 import (
    KCORE_CURVE_MAX_K,
    q_graph_kcore_decomposition,
)


def test_kcore_curve_is_monotone_and_consistent(spark, sf_dir):
    rows = sorted(
        q_graph_kcore_decomposition(spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == list(range(1, KCORE_CURVE_MAX_K + 1))
    sizes = [r.core_size for r in rows]
    masses = [r.core_degree_sum for r in rows]
    # cores are nested: size and edge mass are non-increasing in k
    assert sizes == sorted(sizes, reverse=True)
    assert masses == sorted(masses, reverse=True)
    for r in rows:
        assert r.core_degree_sum % 2 == 0  # 2·|E(core)| exactly
        # every survivor has degree >= k inside the core
        assert r.core_degree_sum >= r.k * r.core_size
    # k=1 core is every non-isolated node of the co-occurrence graph
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
    assert rows[0].core_size == n_nodes
