"""Round-7 additions, batch 1: inferential statistics (Welch t,
Mann-Whitney U, WOE/IV, two-regressor OLS), grouped percentiles, IQR
outlier audit, order backlog, YoY growth. Oracle parity is certified by
tools/check_oracle.py / the driver gate; these tests pin the INVARIANTS
the oracles can't express (conservation laws, estimator identities,
closed-form-vs-numpy agreement)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_welch_t_sign_and_df_bounds(spark, sf_dir):
    """t must carry the sign of (mean_R − mean_N); Welch–Satterthwaite
    df lies in [min(n_a,n_b)−1, n_a+n_b−2]."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_welch_ttest_price_flag,
    )

    r = q_welch_ttest_price_flag(spark, sf_dir).collect()[0]
    li = load_table(spark, "lineitem", sf_dir)
    means = {
        row.l_returnflag: row.m
        for row in li.filter(F.col("l_returnflag").isin("R", "N"))
        .groupBy("l_returnflag")
        .agg(F.avg("l_extendedprice").alias("m"))
        .collect()
    }
    diff = means["R"] - means["N"]
    assert (r.t_micro > 0) == (diff > 0)
    assert (min(r.n_a, r.n_b) - 1) * 1000 <= r.df_milli
    assert r.df_milli <= (r.n_a + r.n_b - 2) * 1000


def test_mannwhitney_u_identity(spark, sf_dir):
    """U_a + U_b = n_a·n_b (×2 in the integral encoding), and each U is
    within its range."""
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_mannwhitney_u_quantity,
    )

    r = q_mannwhitney_u_quantity(spark, sf_dir).collect()[0]
    assert r.u2_a + r.u2_b == 2 * r.n_a * r.n_b
    assert 0 <= r.u2_a <= 2 * r.n_a * r.n_b


def test_woe_iv_nonnegative_and_conserves(spark, sf_dir):
    """Each band's IV contribution is ≥ 0 (sign(pct_good − pct_bad) =
    sign(woe) by construction) and good/bad counts partition orders."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_woe_iv_price_bands,
    )

    rows = q_woe_iv_price_bands(spark, sf_dir).collect()
    n_orders = load_table(spark, "orders", sf_dir).count()
    assert sum(r.n_good + r.n_bad for r in rows) == n_orders
    for r in rows:
        if r.iv_micro is not None:
            assert r.iv_micro >= -1  # rounding slack on an exact-0 band


def test_ols2_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer closed form must agree with numpy's lstsq on the same
    integer-snapped design matrix (micro-cent betas, 1e-3 tolerance —
    both solve the identical normal equations)."""
    import numpy as np

    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_ols_price_qty_disc,
    )

    r = q_ols_price_qty_disc(spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, "lineitem", sf_dir)
        .select(
            F.col("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    A = np.array([[1.0, row.x1, row.x2] for row in rows])
    y = np.array([float(row.y) for row in rows])
    beta = np.linalg.lstsq(A, y, rcond=None)[0]
    assert abs(r.b0_micro / 1e6 - beta[0]) < max(1e-3 * abs(beta[0]), 1e-2)
    assert abs(r.b1_micro / 1e6 - beta[1]) < max(1e-3 * abs(beta[1]), 1e-2)
    assert abs(r.b2_micro / 1e6 - beta[2]) < max(1e-3 * abs(beta[2]), 1e-2)


def test_percentiles_by_nation_ordered(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_agg_percentiles_by_nation,
    )

    rows = q_agg_percentiles_by_nation(spark, sf_dir).collect()
    assert len(rows) == 25
    assert sum(r.n_cust for r in rows) == load_table(
        spark, "customer", sf_dir
    ).count()
    for r in rows:
        assert r.median_bal <= r.p90_bal


def test_iqr_outliers_bounded(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_dq_outlier_iqr_by_type,
    )

    rows = q_dq_outlier_iqr_by_type(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.q1 <= r.q3
        # Tukey fences at 1.5·IQR can flag at most 25% of a sample on
        # each side by Chebyshev-like bounds only loosely; pin the hard
        # invariant instead: outliers are a strict subset.
        assert 0 <= r.n_outliers < r.n


def test_backlog_conserves_open_minus_closed(spark, sf_dir):
    """The final prefix value equals (#orders) − (#orders with ≥1 line
    item), i.e. orders that never ship stay open forever; and the day
    column is unique."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_orders_open_backlog_daily,
    )

    rows = q_orders_open_backlog_daily(spark, sf_dir).collect()
    days = [r.day for r in rows]
    assert len(days) == len(set(days))
    last = max(rows, key=lambda r: r.day)
    n_orders = load_table(spark, "orders", sf_dir).count()
    n_shipped = (
        load_table(spark, "lineitem", sf_dir)
        .join(
            load_table(spark, "orders", sf_dir),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert last.open_orders == n_orders - n_shipped


def test_nation_share_sums_to_million(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_nation_revenue_share,
    )

    rows = q_nation_revenue_share(spark, sf_dir).collect()
    assert len(rows) == 25
    # Rounded ppm shares sum to 1e6 within per-row rounding slack.
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows)


def test_rolling_zscore_window_discipline(spark, sf_dir):
    """First 6 days never emit; any emitted z is finite and the day's
    count sits inside mean ± z·σ reconstruction by definition — pin
    the weaker invariant |z| bounded by √6·1e6 (a point in a 7-sample
    window is at most √(n−1) sample σs from the mean)."""
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _daily_counts,
    )
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_events_rolling_zscore7,
    )

    rows = q_events_rolling_zscore7(spark, sf_dir).collect()
    n_days = _daily_counts(spark, sf_dir).count()
    assert len(rows) == n_days - 6
    for r in rows:
        if r.z_micro is not None:
            assert abs(r.z_micro) <= 6**0.5 * 1e6 + 1


def test_dow_hour_heatmap_partitions_events(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_events_dow_hour_heatmap,
    )

    rows = q_events_dow_hour_heatmap(spark, sf_dir).collect()
    assert sum(r.cnt for r in rows) == load_table(
        spark, "events", sf_dir
    ).count()
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hour <= 23


def test_acf_multi_lags_and_range(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        _ACF_LAGS,
        q_events_acf_multi,
    )

    rows = {r.lag: r for r in q_events_acf_multi(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(_ACF_LAGS)
    for r in rows.values():
        assert -1_000_001 <= r.acf_ppm <= 1_000_001
        assert r.n > 0


def test_kmv_intersection_inclusion_exclusion(spark, sf_dir):
    """est(click)+est(view) ≥ est(union) is NOT guaranteed by the
    estimator, but the output must satisfy the reported identity, and
    each individual estimate must be within 30% of the exact distinct
    count at k=256 (3/√k ≈ 19% standard error)."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_sketch_kmv_intersection,
    )

    r = q_sketch_kmv_intersection(spark, sf_dir).collect()[0]
    assert r.est_intersection == r.est_click + r.est_view - r.est_union
    e = load_table(spark, "events", sf_dir)
    for typ, est in (("click", r.est_click), ("view", r.est_view)):
        exact = (
            e.filter(F.col("event_type") == typ)
            .select("user_id")
            .distinct()
            .count()
        )
        assert abs(est - exact) <= max(0.3 * exact, 5)


def test_range_bands_partition_orders(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_join_range_price_bands,
    )

    rows = q_join_range_price_bands(spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == load_table(
        spark, "orders", sf_dir
    ).count()


def test_two_hop_reach_dominates_degree(spark, sf_dir):
    """reach(u) ≥ deg(u) — direct neighbors always count — and reach
    < n_nodes."""
    from page_rank_mapreduce_java_spark.graph.linkpred import q_two_hop_reach
    from page_rank_mapreduce_java_spark.graph.queries import (
        cooccurrence_edges,
    )

    rows = q_two_hop_reach(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = {r.src: r.d for r in sym.groupBy("src").agg(
        F.count(F.lit(1)).alias("d")).collect()}
    n_nodes = len(deg)
    for r in rows:
        assert deg[r.node] <= r.reach < n_nodes


def test_mixing_matrix_conserves_edges(spark, sf_dir):
    from page_rank_mapreduce_java_spark.graph.linkpred import (
        q_degree_mixing_matrix,
    )
    from page_rank_mapreduce_java_spark.graph.queries import (
        cooccurrence_edges,
    )

    rows = q_degree_mixing_matrix(spark, sf_dir).collect()
    assert sum(r.n_edges for r in rows) == cooccurrence_edges(
        spark, sf_dir
    ).count()
    for r in rows:
        assert r.band_lo <= r.band_hi


def test_pmi_support_and_bound(spark, sf_dir):
    """PMI ≤ ln(N/max(n_a,n_b)·N/n_ab)… pin the hard bound: pmi ≤
    ln(N) (co-occurrence can't exceed either margin) and support ≥ 5."""
    import math

    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        PMI_MIN_CODOCS,
        q_text_pmi_top_pairs,
    )

    rows = q_text_pmi_top_pairs(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    n = load_table(spark, "documents", sf_dir).count()
    for r in rows:
        assert r.w1 < r.w2
        assert r.n_ab >= PMI_MIN_CODOCS
        assert r.pmi_micro <= math.log(n) * 1e6 + 1


def test_sentence_stats_cover_all_docs(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        q_text_sentence_stats,
    )

    rows = q_text_sentence_stats(spark, sf_dir).collect()
    total = load_table(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert r.n_sentences >= r.n_docs
        assert r.tok_per_sent_milli > 0 and r.chars_per_sent_milli > 0


def test_quantize_error_within_half_step(spark, sf_dir):
    """Affine 254-step quantization's max error is half a step:
    (hi−lo)/254/2, plus the nano-unit rounding grain."""
    from page_rank_mapreduce_java_spark.similarity.queries import (
        q_embedding_quantize_int8,
    )

    rows = q_embedding_quantize_int8(spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        half_step_nano = (r.hi_micro - r.lo_micro) * 1e3 / 254.0 / 2.0
        assert r.max_abs_err_nano <= half_step_nano + 2
        assert 0 <= r.max_abs_err_nano
        assert r.sum_abs_err_nano >= r.max_abs_err_nano


def test_norm_percentiles_monotone(spark, sf_dir):
    from page_rank_mapreduce_java_spark.similarity.queries import (
        q_embedding_norm_percentiles,
    )

    r = q_embedding_norm_percentiles(spark, sf_dir).collect()[0]
    assert 0 < r.p25 <= r.p50 <= r.p75 <= r.p99


def test_funnel_time_bound_monotone(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        q_events_funnel_time_bound,
    )

    r = q_events_funnel_time_bound(spark, sf_dir).collect()[0]
    assert r.n_view >= r.n_view_click >= r.n_full_funnel >= 0
    assert r.n_view > 0


def test_weighted_median_in_support(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        q_agg_weighted_median,
    )

    r = q_agg_weighted_median(spark, sf_dir).collect()[0]
    li = load_table(spark, "lineitem", sf_dir)
    lo, hi, tot = li.agg(
        F.min("l_quantity"), F.max("l_quantity"), F.sum(cents("l_extendedprice"))
    ).collect()[0]
    assert lo <= r.wmedian_qty <= hi
    assert r.total_weight_cents == tot


def test_user_cv_support_floor(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        CV_MIN_EVENTS,
        q_events_user_interevent_cv,
    )

    rows = q_events_user_interevent_cv(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert r.n_gaps >= CV_MIN_EVENTS
        assert r.cv_micro > 0


def test_anomaly_mad_flags_above_threshold(spark, sf_dir):
    """Every flagged day re-verifies against a python recomputation of
    median/MAD over the same integer day counts."""
    import statistics

    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _daily_counts,
    )
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        MAD_Z_THRESHOLD_MILLI,
        q_events_anomaly_mad,
    )

    daily = {r.day: r.c for r in _daily_counts(spark, sf_dir).collect()}
    med = statistics.median(daily.values())
    mad = statistics.median(abs(c - med) for c in daily.values())
    flagged = q_events_anomaly_mad(spark, sf_dir).collect()
    for r in flagged:
        assert daily[r.day] == r.c
        assert 0.6745 * abs(r.c - med) / mad * 1e3 > MAD_Z_THRESHOLD_MILLI - 1
    # and no day wildly above threshold is missed (slack for rounding)
    missed = [
        d for d, c in daily.items()
        if 0.6745 * abs(c - med) / mad * 1e3 > MAD_Z_THRESHOLD_MILLI + 1
        and d not in {r.day for r in flagged}
    ]
    assert not missed


def test_nation_flow_conserves_revenue(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        q_supplier_nation_flow,
    )

    rows = q_supplier_nation_flow(spark, sf_dir).collect()
    total = load_table(spark, "lineitem", sf_dir).agg(
        F.sum(cents("l_extendedprice"))
    ).collect()[0][0]
    assert sum(r.revenue_cents for r in rows) == total
    assert len(rows) <= 625


def test_interval_coverage_bounded_by_span(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        q_interval_coverage_days,
    )

    rows = q_interval_coverage_days(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    lo = o.agg(F.min(F.col("o_orderdate").cast("date"))).collect()[0][0]
    hi_ship = li.agg(F.max(F.col("l_shipdate").cast("date"))).collect()[0][0]
    hi_ord = o.agg(F.max(F.col("o_orderdate").cast("date"))).collect()[0][0]
    span = (max(hi_ship, hi_ord) - lo).days + 1
    for r in rows:
        assert 1 <= r.covered_days <= span


def test_migration_matrix_segments_valid(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        q_customer_migration_matrix,
    )

    rows = q_customer_migration_matrix(spark, sf_dir).collect()
    assert 0 < len(rows) <= 9
    for r in rows:
        assert r.seg_from in (1, 2, 3) and r.seg_to in (1, 2, 3)
        assert r.n_customers > 0


def test_abc_classes_partition_parts(spark, sf_dir):
    """A/B/C partition the part set; revenue shares respect the 80/95
    cuts (A's share ≤ 80% + one part's worth of slack by the inclusive
    convention; A ∪ B ≤ 95% + slack)."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        q_orders_abc_classification,
    )

    rows = {r.abc_class: r for r in
            q_orders_abc_classification(spark, sf_dir).collect()}
    li = load_table(spark, "lineitem", sf_dir)
    n_parts = li.select("l_partkey").distinct().count()
    tot = li.agg(F.sum(cents("l_extendedprice"))).collect()[0][0]
    assert sum(r.n_parts for r in rows.values()) == n_parts
    assert sum(r.revenue_cents for r in rows.values()) == tot
    if "A" in rows:
        assert rows["A"].revenue_cents <= 0.8 * tot
    if "A" in rows and "B" in rows:
        assert rows["A"].revenue_cents + rows["B"].revenue_cents <= 0.95 * tot


def test_asof_tolerance_is_subset_with_bounded_staleness(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational14 import (
        ASOF_TOLERANCE_SEC,
        q_join_asof_tolerance,
    )

    rows = q_join_asof_tolerance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.staleness_sec <= ASOF_TOLERANCE_SEC


def test_bpe_pairs_are_bigrams(spark, sf_dir):
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        q_text_bpe_merge_pairs,
    )

    rows = q_text_bpe_merge_pairs(spark, sf_dir).collect()
    assert len(rows) == 25
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r.pair) == 2


def test_feature_hash_partitions_tokens(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        FEATURE_HASH_BUCKETS,
        q_text_feature_hash_profile,
    )
    from page_rank_mapreduce_java_spark.functions.textfn import words

    rows = q_text_feature_hash_profile(spark, sf_dir).collect()
    d = load_table(spark, "documents", sf_dir)
    n_tokens = d.select(F.explode(words(F.col("text"))).alias("w")).count()
    assert sum(r.cnt for r in rows) == n_tokens
    for r in rows:
        assert 0 <= r.bucket < FEATURE_HASH_BUCKETS


def test_cross_source_overlap_conserves_pairs(spark, sf_dir):
    from page_rank_mapreduce_java_spark.dedup.queries import (
        q_dedup_cross_source_overlap,
        q_dedup_minhash_lsh_pairs,
    )

    rows = q_dedup_cross_source_overlap(spark, sf_dir).collect()
    n_pairs = q_dedup_minhash_lsh_pairs(spark, sf_dir).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_a <= r.source_b


def test_yoy_no_nulls_and_matches_month_domain(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational13 import (
        q_orders_yoy_monthly_growth,
    )

    rows = sorted(
        q_orders_yoy_monthly_growth(spark, sf_dir).collect(),
        key=lambda r: (r.year, r.month),
    )
    # Inner-join semantics: every emitted month has a same-month-last-year
    # counterpart, so yoy_ppm is never NULL.
    assert rows and all(r.yoy_ppm is not None for r in rows)
    months = {
        (r.year, r.month)
        for r in load_table(spark, "orders", sf_dir)
        .select(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .distinct()
        .collect()
    }
    expected = {(y, m) for (y, m) in months if (y - 1, m) in months}
    assert {(r.year, r.month) for r in rows} == expected


# --- batch 15 -----------------------------------------------------------------


def test_pit_scd2_partitions_orders_exactly_once(spark, sf_dir):
    """Every order resolves to exactly ONE version (the SCD2 validity
    ranges tile the timeline), so n_orders sums to the order count and
    0 <= n_v1 <= n_orders per year."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational15 import (
        q_join_pit_scd2_lookup,
    )

    rows = q_join_pit_scd2_lookup(spark, sf_dir).collect()
    n_orders = load_table(spark, "orders", sf_dir).count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert all(0 <= r.n_v1 <= r.n_orders for r in rows)


def test_retention_triangle_offset0_is_cohort_size(spark, sf_dir):
    """Offset 0 exists for every cohort (a user is active in their own
    first week), its n_users is the cohort's max across offsets, and
    the offset-0 counts sum to the distinct-user total."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational15 import (
        q_events_retention_triangle,
    )

    rows = q_events_retention_triangle(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.offset_weeks] = r.n_users
    assert by_cohort
    for offs in by_cohort.values():
        assert 0 in offs
        assert offs[0] == max(offs.values())
    total_users = (
        load_table(spark, "events", sf_dir).select("user_id").distinct().count()
    )
    assert sum(offs[0] for offs in by_cohort.values()) == total_users


def test_vocab_growth_cumulative_is_vocabulary(spark, sf_dir):
    """cum_types is non-decreasing, the last row equals the corpus
    vocabulary size, and bucket_tokens conserves the corpus token
    count."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.textfn import words
    from page_rank_mapreduce_java_spark.operators.relational15 import (
        q_text_vocab_growth,
    )

    rows = sorted(
        q_text_vocab_growth(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    assert all(
        a.cum_types <= b.cum_types for a, b in zip(rows, rows[1:])
    )
    assert sum(r.new_types for r in rows) == rows[-1].cum_types
    toks = (
        load_table(spark, "documents", sf_dir)
        .select(F.explode(words(F.col("text"))).alias("tok"))
    )
    assert sum(r.bucket_tokens for r in rows) == toks.count()
    assert rows[-1].cum_types == toks.distinct().count()


def test_updown_streaks_cover_month_deltas(spark, sf_dir):
    """Streak months sum to #months − 1 (every delta belongs to exactly
    one streak) and max_len <= months per direction."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational15 import (
        q_orders_updown_streaks,
    )

    rows = q_orders_updown_streaks(spark, sf_dir).collect()
    n_months = (
        load_table(spark, "orders", sf_dir)
        .select(F.year("o_orderdate"), F.month("o_orderdate"))
        .distinct()
        .count()
    )
    assert sum(r.months for r in rows) == n_months - 1
    assert all(r.max_len <= r.months for r in rows)
    assert all(r.n_streaks >= 1 for r in rows)


# --- batch 16 -----------------------------------------------------------------


def test_pca_loading_matches_numpy_eigvec(spark, sf_dir):
    """The integer power-iteration direction must align with numpy's
    leading eigenvector of the SAME quantized Gram matrix: cosine
    similarity > 0.999 (sign fixed by the all-ones start)."""
    import numpy as np

    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational16 import (
        q_embedding_pca_top_component,
    )

    rows = sorted(
        q_embedding_pca_top_component(spark, sf_dir).collect(),
        key=lambda r: r.pos,
    )
    v = np.array([float(r.loading_ppm) for r in rows])
    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, "embeddings", sf_dir)
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    lo, hi = emb.min(axis=0), emb.max(axis=0)
    span = np.where(hi - lo == 0, 1.0, hi - lo)
    q = np.round((emb - lo) / span * 254.0) - 127.0
    q[:, hi - lo == 0] = 0.0
    g = q.T @ q
    w_, vec = np.linalg.eigh(g)
    lead = vec[:, -1]
    cos = abs(v @ lead) / (np.linalg.norm(v) * np.linalg.norm(lead))
    assert cos > 0.999


def test_null_safe_join_keeps_null_bucket(spark, sf_dir):
    """The -1 (NULL) bucket equals (#null customers × #null suppliers)
    and total pairs match the null-normalized key product sum."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational16 import (
        q_join_null_safe_nations,
    )

    rows = {r.nk: r.n_pairs for r in q_join_null_safe_nations(spark, sf_dir).collect()}
    nc = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") % 97 == 0)
        .count()
    )
    ns = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_suppkey") % 89 == 0)
        .count()
    )
    assert rows.get(-1, 0) == nc * ns
    assert all(n > 0 for n in rows.values())


def test_longest_gap_within_customer_span(spark, sf_dir):
    """Every reported gap is positive and no longer than the customer's
    total order-date span."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational16 import (
        q_interval_longest_gap,
    )

    rows = q_interval_longest_gap(spark, sf_dir).collect()
    assert rows and len(rows) <= 25
    spans = {
        r.ck: r.span
        for r in load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("span")
        )
        .collect()
    }
    for r in rows:
        assert 0 < r.max_gap_days <= spans[r.c_custkey]


def test_sign_split_division_contract(spark, sf_dir):
    """The PCA normalize step's cross-engine contract: the sign-split
    expression equals truncation-toward-zero division in Spark, DuckDB,
    and Python on negatives, positives, and boundary values."""
    import duckdb

    cases = [-7, -6, -5, -1, 0, 1, 5, 6, 7, -1_000_000, 999_999, 2**53 + 3, -(2**53) - 3]
    d = 3
    expr = (
        f"CASE WHEN x < 0 THEN -((-x) {{div}} {d}) ELSE x {{div}} {d} END"
    )
    sdf = spark.createDataFrame([(x,) for x in cases], "x long").selectExpr(
        f"x", f"CAST({expr.format(div='div')} AS BIGINT) AS r"
    )
    got_spark = {r.x: r.r for r in sdf.collect()}
    con = duckdb.connect()
    got_duck = dict(
        con.sql(
            "SELECT x, CAST("
            + expr.format(div="//")
            + " AS BIGINT) FROM (SELECT unnest("
            + str(cases)
            + ") AS x)"
        ).fetchall()
    )
    for x in cases:
        want = -((-x) // d) if x < 0 else x // d  # trunc-toward-zero
        assert got_spark[x] == want, (x, got_spark[x], want)
        assert got_duck[x] == want, (x, got_duck[x], want)


def test_lpa_modularity_bounds_and_networkx_free_check(spark, sf_dir):
    """Q lies in [-0.5, 1) by definition; cross-check against a pure-
    Python recomputation from the same labels and edge relation."""
    from page_rank_mapreduce_java_spark.graph.algorithms import (
        _symmetrize,
        label_propagation,
    )
    from page_rank_mapreduce_java_spark.graph.queries import (
        LPA_ROUNDS,
        cooccurrence_edges,
    )
    from page_rank_mapreduce_java_spark.operators.relational16 import (
        q_graph_lpa_modularity,
    )

    row = q_graph_lpa_modularity(spark, sf_dir).collect()[0]
    assert -500_000 <= row.q_ppm < 1_000_000
    e = cooccurrence_edges(spark, sf_dir)
    lbl = {
        r.id: r.community
        for r in label_propagation(e, rounds=LPA_ROUNDS).collect()
    }
    sym = [(r.src, r.dst) for r in _symmetrize(e).collect()]
    m2 = len(sym)
    from collections import Counter

    deg = Counter(lbl[s] for s, _ in sym)
    i2 = Counter(lbl[s] for s, d in sym if lbl[s] == lbl[d])
    num = sum(i2.get(c, 0) * m2 - d * d for c, d in deg.items())
    assert row.sym_edges == m2
    assert row.n_communities == len(deg)
    assert row.q_ppm == round(num * 1e6 / (m2 * m2))


def test_poisson_dispersion_matches_direct_stats(spark, sf_dir):
    """dispersion_micro equals the directly-computed sample
    variance-to-mean ratio of the daily counts, and the totals
    conserve."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational16 import (
        q_events_poisson_dispersion,
    )

    row = q_events_poisson_dispersion(spark, sf_dir).collect()[0]
    counts = [
        r.c
        for r in load_table(spark, "events", sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    n, s, q = len(counts), sum(counts), sum(c * c for c in counts)
    assert row.n_days == n and row.total_events == s
    assert row.dispersion_micro == round((n * q - s * s) / ((n - 1) * s) * 1e6)
    assert row.dispersion_micro > 0
