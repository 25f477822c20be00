"""Batch-20 additions: interpolated bigram NLL, temperature mixture,
CR4 concentration, forward as-of, MinHash threshold curve, Hurst R/S,
kNN label accuracy. Value-level correctness is oracle-gated
(tools/check_oracle.py); these tests pin structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.operators.relational20 import (
    CR_TOP_N,
    KNN_EVAL_N,
    MINHASH_THRESHOLDS,
    q_dedup_minhash_threshold_curve,
    q_embedding_knn_label_accuracy,
    q_events_hurst_rs,
    q_join_asof_forward,
    q_sample_temperature_mixture,
    q_supplier_concentration_cr4,
    q_text_bigram_nll_interp,
)


def test_bigram_interp_positive_and_covers_docs(spark, sf_dir):
    """Every multi-token doc scores, and interpolated NLL is positive
    (probabilities strictly < 1 under the mixed model)."""
    out = q_text_bigram_nll_interp(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.n_bigrams > 0
        assert r.nll_interp_micro > 0


def test_temperature_mixture_flattens(spark, sf_dir):
    """Quotas fill exactly (quota ≤ class size by construction) and the
    smallest language's share of the sample is at least its share of
    the corpus — the defining property of temperature < 1 sampling."""
    rows = q_sample_temperature_mixture(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept == r.quota
        assert r.quota <= r.n_docs
    tot_n = sum(r.n_docs for r in rows)
    tot_kept = sum(r.n_kept for r in rows)
    smallest = min(rows, key=lambda r: r.n_docs)
    assert (
        smallest.n_kept * tot_n >= smallest.n_docs * tot_kept
    ), "temperature sampling must not shrink the low-resource share"


def test_cr4_bounds(spark, sf_dir):
    """CR4 is a share in (0, 1e6] and at least the share any 4 average
    suppliers would hold."""
    rows = q_supplier_concentration_cr4(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.cr4_ppm <= 1_000_000
        if r.n_suppliers >= CR_TOP_N:
            assert r.cr4_ppm >= CR_TOP_N * 1_000_000 // r.n_suppliers - 1


def test_asof_forward_event_is_after_order(spark, sf_dir):
    """Every matched event's time is at or after the order date (the
    forward contract), and the corpus (events all postdate orders)
    yields a match for every order whose customer has events."""
    from page_rank_mapreduce_java_spark.catalog import load_table

    out = q_join_asof_forward(spark, sf_dir)
    e = load_table(spark, sf_dir=sf_dir, name="events").select(
        F.col("event_id").alias("next_event_id"), "ts"
    )
    o = load_table(spark, sf_dir=sf_dir, name="orders").select(
        "o_orderkey", "o_orderdate"
    )
    joined = out.join(e, "next_event_id").join(o, "o_orderkey")
    n_total = joined.count()
    assert n_total > 0
    n_bad = joined.filter(F.col("ts") < F.col("o_orderdate")).count()
    assert n_bad == 0


def test_threshold_curve_monotone(spark, sf_dir):
    """Raising the agreement threshold can only drop pairs."""
    rows = {
        r.min_slots: r.n_pairs
        for r in q_dedup_minhash_threshold_curve(spark, sf_dir).collect()
    }
    assert set(rows) == set(MINHASH_THRESHOLDS)
    ts = sorted(rows)
    for a, b in zip(ts, ts[1:]):
        assert rows[b] <= rows[a]


def test_hurst_single_row_and_growth(spark, sf_dir):
    """One output row; R/S grows with block size (any positive-H
    series); the H estimate lands in a sane band."""
    r = q_events_hurst_rs(spark, sf_dir).head()
    assert r.rs8_micro > 0
    assert r.rs32_micro > r.rs8_micro
    assert -500 <= r.hurst_milli <= 1500


def test_knn_accuracy_partitions_eval_set(spark, sf_dir):
    rows = q_embedding_knn_label_accuracy(spark, sf_dir).collect()
    assert sum(r.n_eval for r in rows) == KNN_EVAL_N
    for r in rows:
        assert 0 <= r.n_correct <= r.n_eval
        assert 0 <= r.accuracy_ppm <= 1_000_000
