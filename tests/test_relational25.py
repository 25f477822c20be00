"""Batch-25 additions: TextRank keywords (the reference PageRank
operator driving an LLM-pipeline task), integer-exact Katz centrality,
event arrival-order inversions, month-of-year index. Value-level
correctness is oracle-gated (tools/check_oracle.py at sf0.001 + sf0.01
under shuffle.partitions 3/17/32); these tests pin structural
invariants and the exactness contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational25 import (
    KATZ_ITERS,
    TEXTRANK_TOP_N,
    _word_edges,
    q_dq_event_order_inversions,
    q_graph_katz_centrality,
    q_orders_month_of_year_index,
    q_text_textrank_keywords,
)


def test_textrank_runs_the_reference_operator(spark, sf_dir):
    rows = q_text_textrank_keywords(spark, sf_dir).collect()
    assert 0 < len(rows) <= TEXTRANK_TOP_N
    ranks = [r.rank_e8 for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.rank_e8 > 0 for r in rows)
    # keywords are real corpus words
    vocab = {
        r.word
        for r in load_table(spark, "documents", sf_dir)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .distinct()
        .collect()
    }
    assert all(r.keyword in vocab for r in rows)


def test_word_edges_are_symmetric_weighted(spark, sf_dir):
    e = _word_edges(spark, sf_dir)
    n = e.count()
    assert n % 2 == 0 and n > 0
    # both directions carry identical weight
    fwd = e.filter(F.col("src") < F.col("dst"))
    rev = e.filter(F.col("src") > F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    assert fwd.exceptAll(rev).count() == 0


def test_katz_matches_exact_python_recursion(spark, sf_dir):
    """Replicate the scaled-integer recursion X_{i+1} = 20^{i+1} + Σ_in X_i
    in plain Python and assert exact equality — the partition-invariance
    contract is exactness, so no tolerance."""
    from page_rank_mapreduce_java_spark.graph.queries import cooccurrence_edges

    edges = [(r.src, r.dst) for r in cooccurrence_edges(spark, sf_dir).collect()]
    sym = edges + [(b, a) for a, b in edges]
    nodes = {s for s, _ in sym}
    inn: dict[int, list[int]] = {}
    for s, d in sym:
        inn.setdefault(d, []).append(s)
    x = {v: 1 for v in nodes}
    for i in range(1, KATZ_ITERS + 1):
        x = {
            v: 20**i + sum(x[u] for u in inn.get(v, []))
            for v in nodes
        }
    exp = {v: (25 * xv + 8) // 16 for v, xv in x.items()}
    got = {r.id: r.katz_e8 for r in q_graph_katz_centrality(spark, sf_dir).collect()}
    assert got == exp


def test_inversions_bounds(spark, sf_dir):
    r = q_dq_event_order_inversions(spark, sf_dir).head()
    assert 0 <= r.n_inversions <= r.n_pairs
    assert r.inversion_ppm == 1_000_000 * r.n_inversions // r.n_pairs
    assert (r.n_inversions == 0) == (r.max_backstep_ms == 0) or r.max_backstep_ms >= 0


def test_month_index_averages_to_unity(spark, sf_dir):
    rows = q_orders_month_of_year_index(spark, sf_dir).collect()
    assert 0 < len(rows) <= 12
    assert {r.month for r in rows} <= set(range(1, 13))
    # slot-weighted mean of the index is 1 by construction (up to ppm rounding)
    kt = sum(r.n_month_slots for r in rows)
    weighted = sum(r.idx_ppm * r.n_month_slots for r in rows) / kt
    assert abs(weighted - 1_000_000) < 5
