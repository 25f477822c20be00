"""Batch-21 additions: trimmed mean, exact-dyadic Holt forecast, RAKE
keywords, centroid drift, apriori k=3, PQ distortion. Value-level
correctness is oracle-gated; these tests pin structural invariants."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.operators.relational21 import (
    HOLT_DEN,
    HOLT_LAGS,
    HOLT_NUM,
    RAKE_MAX_PHRASE,
    RAKE_TOP_N,
    TRIM_DEN,
    TRIPLE_MIN_SUPPORT,
    q_agg_trimmed_mean,
    q_ann_pq_distortion,
    q_basket_itemset3_support,
    q_embedding_centroid_drift,
    q_orders_holt_linear,
    q_text_rake_keywords,
)


def test_holt_coefficients_are_the_exact_recursion():
    """The inlined integer coefficients must equal the exact Fraction
    unroll of the α = β = 1/2 Holt recursion (the oracle-parity anchor:
    both engines evaluate THESE literals)."""
    a = be = Fraction(1, 2)
    k = HOLT_LAGS
    lc = [Fraction(0)] * k
    bc = [Fraction(0)] * k
    for _ in range(k):
        lp = [Fraction(0)] + lc[:-1]
        bp = [Fraction(0)] + bc[:-1]
        lc = [
            (a if j == 0 else Fraction(0)) + (1 - a) * (lp[j] + bp[j])
            for j in range(k)
        ]
        bc = [be * (lc[j] - lp[j]) + (1 - be) * bp[j] for j in range(k)]
    fc = [lc[j] + bc[j] for j in range(k)]
    assert [int(c * HOLT_DEN) for c in fc] == HOLT_NUM
    # truncated impulse mass: within 0.5% of a full convex blend
    assert 0.995 < sum(HOLT_NUM) / HOLT_DEN <= 1.0


def test_trimmed_mean_between_extremes(spark, sf_dir):
    r = q_agg_trimmed_mean(spark, sf_dir).head()
    assert r.n_kept == r.n_total - 2 * (r.n_total // TRIM_DEN)
    # trimming a right-skewed money distribution pulls the mean down,
    # but at minimum the value must lie inside the untrimmed range
    assert 0 < r.trimmed_mean_cents
    assert abs(r.trimmed_mean_cents - r.mean_cents) < r.mean_cents


def test_holt_tracks_level_series(spark, sf_dir):
    """On the corpus the one-step forecast must stay within an order of
    magnitude of the realized month (sanity of scale and sign)."""
    rows = q_orders_holt_linear(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.forecast_cents == r.forecast_x65536 // HOLT_DEN
    mid = [r for r in rows if r.revenue_cents > 0]
    assert mid
    ok = sum(
        1
        for r in mid
        if 0.1 * r.revenue_cents < r.forecast_cents < 10 * r.revenue_cents
    )
    assert ok >= len(mid) * 0.8


def test_rake_phrases_shape(spark, sf_dir):
    rows = q_text_rake_keywords(spark, sf_dir).collect()
    assert 0 < len(rows) <= RAKE_TOP_N
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r.n_words <= RAKE_MAX_PHRASE
        assert len(r.phrase.split(" ")) == r.n_words
        # a phrase's score is at least its word count in micro units
        # (each word's degree/freq >= 1)
        assert r.score_micro >= r.n_words * 1_000_000


def test_centroid_drift_nonnegative_and_complete(spark, sf_dir):
    from page_rank_mapreduce_java_spark.similarity.queries import (
        IVF_CENTROIDS,
    )

    rows = q_embedding_centroid_drift(spark, sf_dir).collect()
    assert len(rows) == IVF_CENTROIDS
    for r in rows:
        assert r.drift_micro >= 0


def test_itemset3_support_consistent_with_pairs(spark, sf_dir):
    """Every frequent triple implies its three sub-pairs are at least
    as frequent (the apriori downward-closure property) — spot-check
    against the pair query on the same corpus."""
    from page_rank_mapreduce_java_spark.operators.relational8 import (
        q_basket_pair_counts,
    )

    triples = q_basket_itemset3_support(spark, sf_dir)
    rows = triples.orderBy(F.desc("support"), "p1", "p2", "p3").limit(
        5
    ).collect()
    if not rows:
        return  # tiny SF may have no frequent triples — fine
    pairs = {
        (r.p1, r.p2): r.support
        for r in q_basket_pair_counts(spark, sf_dir).collect()
    }
    for t in rows:
        assert t.support >= TRIPLE_MIN_SUPPORT
        for a, b in ((t.p1, t.p2), (t.p1, t.p3), (t.p2, t.p3)):
            # pair support counted with the LOOSER basket cap can only
            # be >= the triple's support
            assert pairs.get((a, b), 0) >= t.support


def test_pq_distortion_shape(spark, sf_dir):
    from page_rank_mapreduce_java_spark.similarity.pq import PQ_M

    rows = q_ann_pq_distortion(spark, sf_dir).collect()
    assert len(rows) == PQ_M
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    for r in rows:
        assert r.n_vectors == n
        assert r.mean_distortion_micro >= 0
