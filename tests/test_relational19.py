"""Batch-19 additions: Kaplan-Meier survival, lift & gains, rolling
correlation, simplified silhouette, token fertility, class-balanced
sampling, rule confidence, price-consistency DQ, deterministic
bootstrap, LSH recall. Value-level correctness is driver/oracle-gated
(tools/check_oracle.py); these tests pin the structural invariants each
query's math must satisfy on any corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.operators.relational19 import (
    BOOT_B,
    LIFT_DECILES,
    LSH_RECALL_PLANES,
    RULE_MIN_SUPPORT,
    RULE_TOP_N,
    q_ann_lsh_recall,
    q_basket_rule_confidence,
    q_dq_price_consistency,
    q_embedding_silhouette,
    q_lineitem_rolling_corr,
    q_orders_bootstrap_ci_mean,
    q_orders_lift_gains_deciles,
    q_sample_class_balanced,
    q_survival_kaplan_meier,
    q_text_token_fertility,
)


def test_km_risk_set_monotone_and_conserved(spark, sf_dir):
    """n_risk strictly decreases over event weeks, cumulative
    log-survival is non-increasing, and no week's events exceed its
    risk set."""
    rows = q_survival_kaplan_meier(spark, sf_dir).orderBy("week").collect()
    assert rows, "corpus must produce at least one event week"
    last_risk = None
    last_cum = 0
    for r in rows:
        assert r.n_events > 0 and r.n_events <= r.n_risk
        if last_risk is not None:
            assert r.n_risk < last_risk
        last_risk = r.n_risk
        if r.cum_log_surv_micro is not None:
            assert r.cum_log_surv_micro <= last_cum
            last_cum = r.cum_log_surv_micro


def test_km_total_exits_bounded_by_subjects(spark, sf_dir):
    """Σ(events+censored) over ALL weeks ≤ total durations = orders
    count (each order contributes exactly one duration)."""
    out = q_survival_kaplan_meier(spark, sf_dir)
    exits = out.agg(
        F.sum(F.col("n_events") + F.col("n_censored"))
    ).head()[0]
    n_orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    )
    assert exits <= n_orders


def test_lift_gains_partition_and_terminal_gain(spark, sf_dir):
    """Deciles cover every order exactly once; cumulative gain ends at
    exactly 1e6 ppm; response rates are probabilities."""
    rows = q_orders_lift_gains_deciles(spark, sf_dir).orderBy("decile").collect()
    assert [r.decile for r in rows] == list(range(1, LIFT_DECILES + 1))
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n for r in rows) == n_orders
    assert rows[-1].cum_gain_ppm == 1_000_000
    gains = [r.cum_gain_ppm for r in rows]
    assert gains == sorted(gains)
    for r in rows:
        assert 0 <= r.response_ppm <= 1_000_000


def test_rolling_corr_bounded(spark, sf_dir):
    """Pearson r lives in [-1, 1] (milli), and every emitted frame saw
    exactly 7 active days (non-NULL sums by construction)."""
    rows = q_lineitem_rolling_corr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.r_milli is not None:
            assert -1000 <= r.r_milli <= 1000
        assert r.x_qty > 0


def test_silhouette_range_and_membership(spark, sf_dir):
    """Mean silhouettes live in [-1e6, 1e6] ppm and cluster memberships
    sum to the corpus size."""
    rows = q_embedding_silhouette(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == n
    for r in rows:
        assert -1_000_000 <= r.mean_silhouette_ppm <= 1_000_000


def test_token_fertility_consistent(spark, sf_dir):
    """Byte volume ≥ char volume (ASCII-or-wider), ratios positive, and
    doc counts sum to the corpus."""
    rows = q_text_token_fertility(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n
    for r in rows:
        assert r.n_bytes >= r.n_chars
        assert r.fertility_ppm > 0
        assert r.bytes_per_token_milli > 0


def test_class_balanced_equal_classes(spark, sf_dir):
    """Every class keeps exactly min-class-size rows."""
    rows = q_sample_class_balanced(spark, sf_dir).collect()
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    sizes = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    cap = min(sizes.values())
    assert len(rows) == len(sizes)
    for r in rows:
        assert r.n_kept == cap


def test_rule_confidence_bounds(spark, sf_dir):
    """Confidence is a probability (support(a,b) ≤ baskets(a)), support
    honors the floor, and the table is the deterministic top-N."""
    rows = q_basket_rule_confidence(spark, sf_dir).collect()
    assert 0 < len(rows) <= RULE_TOP_N
    for r in rows:
        assert r.support >= RULE_MIN_SUPPORT
        assert r.support <= r.n_antecedent
        assert 0 < r.confidence_ppm <= 1_000_000
    confs = [r.confidence_ppm for r in rows]
    assert confs == sorted(confs, reverse=True)


def test_price_consistency_rates(spark, sf_dir):
    rows = q_dq_price_consistency(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_violations <= r.n_lines
        assert 0 <= r.violation_ppm <= 1_000_000


def test_bootstrap_ci_orders(spark, sf_dir):
    """CI bounds are ordered and bracket a value near the full-sample
    mean (half-sample resamples of a 1.5k+ corpus can't drift far)."""
    r = q_orders_bootstrap_ci_mean(spark, sf_dir).head()
    assert r.n_resamples == BOOT_B
    assert r.ci_lo_cents <= r.ci_hi_cents
    # the mean of an n≥1500 corpus must land within the (wide) CI
    # inflated by 10% on each side
    span = max(r.ci_hi_cents - r.ci_lo_cents, 1)
    assert r.ci_lo_cents - span <= r.mean_cents <= r.ci_hi_cents + span


def test_lsh_recall_nested_buckets(spark, sf_dir):
    """Planes 0..3 are shared across plane counts, so higher-plane
    buckets REFINE lower-plane buckets: candidates and hits are
    non-increasing in n_planes; recall is a probability."""
    rows = {
        r.n_planes: r
        for r in q_ann_lsh_recall(spark, sf_dir).collect()
    }
    assert set(rows) == set(LSH_RECALL_PLANES)
    ordered = [rows[p] for p in sorted(rows)]
    for a, b in zip(ordered, ordered[1:]):
        assert b.n_candidates <= a.n_candidates
        assert b.hits <= a.hits
    for r in ordered:
        assert 0 <= r.recall_ppm <= 1_000_000
        assert r.base > 0


def test_silhouette_matches_python_recompute(spark, sf_dir):
    """Focused pin on the r12 in-place array scoring rewrite: the
    per-vector own-cluster/a/b selection (argmin (dist, centroid_id);
    b = min dist over other centroids) recomputed independently in pure
    Python with the same sequential-fold cosine must reproduce every
    cluster's n_members exactly and its mean silhouette to ±1 ppm
    (the ±1 allows only double→ppm rounding-mode slack, not a wrong
    selection — any own/b mix-up shifts cluster means by thousands)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from page_rank_mapreduce_java_spark.similarity.ann import kmeans_train
    from page_rank_mapreduce_java_spark.similarity.queries import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = {
        r.centroid_id: list(r.cvec)
        for r in kmeans_train(
            e, k=IVF_CENTROIDS, iters=KMEANS_ITERS
        ).collect()
    }

    def cos(a, b):  # sequential left-to-right folds, like F.aggregate
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for y in b:
            nb += float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    def round_half_up(x: float) -> int:
        # Spark's F.round is HALF_UP; Python round() is banker's. A
        # per-vector s landing on an exact half would otherwise diverge
        # by 1 and accumulate in the cluster sum (ADVICE r12).
        return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

    agg: dict[int, list] = {}
    for row in e.select("embedding").collect():
        d = sorted(
            (1.0 - cos(row.embedding, cv), cid) for cid, cv in cent.items()
        )
        (a, own), b = d[0], d[1][0]
        s = round_half_up((b - a) / max(a, b) * 1e6) if max(a, b) > 0 else 0
        n, t = agg.get(own, (0, 0))
        agg[own] = (n + 1, t + s)

    got = {
        r.centroid_id: (r.n_members, r.mean_silhouette_ppm)
        for r in __import__(
            "page_rank_mapreduce_java_spark.operators.relational19",
            fromlist=["q_embedding_silhouette"],
        ).q_embedding_silhouette(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for cid, (n, t) in agg.items():
        assert got[cid][0] == n, f"cluster {cid} n_members"
        assert abs(got[cid][1] - round(t / n)) <= 1, f"cluster {cid} mean"
