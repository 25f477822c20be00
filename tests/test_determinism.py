"""Partition-count invariance: results must not depend on parallelism.

The engine's core distributed-correctness claim is that every registered
query is deterministic under re-partitioning — no order-dependent float
accumulation, no position-dependent sampling, no nondeterministic
tie-breaks. This is what lets the same code run on local[32] and a
1000-executor cluster and hash-match the oracle either way. The test
re-runs a representative query slice under very different
spark.sql.shuffle.partitions settings and requires identical rows.
"""

from __future__ import annotations

import pytest

# A slice spanning the riskiest determinism classes: iterative float
# arithmetic (pagerank), two-pass global ranking (cume_dist, kmv),
# hash sketches + self-joins (minhash pairs, simhash), window lags
# (ewma), closure iteration (scc), chunked interval join, and an
# integer TPC-H aggregate.
QUERIES_UNDER_TEST = [
    "graph_pagerank",
    "window_cume_dist",
    "agg_kmv_distinct",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "events_ewma_value",
    "graph_scc",
    "graph_scc_fwbw",
    "interval_overlap_orders",
    "q1_pricing_summary",
    # second wave: clustering, peeling, as-of ordering, content-keyed
    # split, sampling, funnel, stratified windows, robust stats
    "dedup_clusters",
    "graph_kcore",
    "join_asof_latest_order",
    "text_train_split",
    "sample_stratified_orders",
    "events_funnel_conversion",
    "window_percent_rank",
    "agg_mad_robust",
    # third wave (round-4 statistical-mining batch): partition-local
    # top-k pruning, three-way ntile chassis, bounded-window skyline,
    # float-rounded information statistics
    "sample_per_lang_topk",
    "rfm_segments",
    "skyline_parts",
    "user_event_entropy",
    "graph_jaccard_neighbors",
    # fourth wave (round-4 late registrations, driver-deferred): global
    # prefix-sum PPS selection, two-phase integer path counting
    "sample_pps_orders",
    "graph_stress_centrality",
    # corr-family: covar_pop/stddev_pop/corr partial-aggregate merges can
    # vary with layout near a rounding boundary — detect early (ADVICE r4)
    "graph_degree_assortativity",
    "events_daily_acf",
    "corr_pairs_lineitem",
    # round-5: per-token ln() snapped to micro-nats before the integer
    # sum — partition-invariant by construction, but the rounding rides
    # IEEE ln, so keep it under layout surveillance like the corr family
    "text_unigram_nll",
    # chassis-based keyed quantiles: positions are layout-invariant by
    # the global_row_number contract; median's final ROUND(avg, 6) of
    # two doubles rides IEEE — surveil like the corr family
    "agg_median",
    "agg_p90_by_type",
    # round-6: the corr family moved onto exact integer sufficient
    # statistics and the ln-based scores onto the shared deterministic
    # ln (ln_int_sql), so these are invariant BY CONSTRUCTION — kept
    # under surveillance to pin that contract (plus the two-direction
    # as-of arbitration, the prefix-sum Pareto cut, and the XOR-combined
    # video fingerprint's Python leg)
    "agg_theil_nation",
    "events_transition_entropy",
    "text_js_divergence",
    "text_bigram_nll",
    "graph_adamic_adar",
    "join_asof_nearest",
    "orders_pareto_8020",
    "mm_video_fingerprint",
    # round-6 late batch: integer power iteration (lineage-cut jobs),
    # ranked-prefix Gini, and the moving order statistic
    "events_markov_stationary",
    "graph_degree_gini",
    "events_moving_median7",
    # round-7: rank statistics (Mann-Whitney U rides global ranks),
    # weighted/grouped order statistics, the corr-family ACF and the
    # windowed z-score's terminal sqrt, ABC's ranked prefix cut, and
    # the batch-15 token first-seen min + streak run-length encoding
    "mannwhitney_u_quantity",
    "agg_weighted_median",
    "agg_percentiles_by_nation",
    "events_acf_multi",
    "events_rolling_zscore7",
    "orders_abc_classification",
    "text_vocab_growth",
    "orders_updown_streaks",
    # round-8 batches 19/20: the ln-contract survival curve and
    # interpolated NLL, the ntile lift chassis, the rolling-corr
    # terminal sqrt, hash-ranked selections (balanced sample,
    # temperature mixture), the volume-sized rule-confidence pair
    # exchange, silhouette's collect_list (order-insensitive folds
    # only), the reversed-time as-of arbitration, the Hurst block
    # statistics, and the kNN vote argmax tiebreak
    "survival_kaplan_meier",
    "orders_lift_gains_deciles",
    "lineitem_rolling_corr",
    "embedding_silhouette",
    "sample_class_balanced",
    "basket_rule_confidence",
    "text_bigram_nll_interp",
    "sample_temperature_mixture",
    "join_asof_forward",
    "events_hurst_rs",
    "embedding_knn_label_accuracy",
    # round-8 batch 21: the trim cut on the ranking chassis, RAKE's
    # islands segmentation + collect_list phrase render, half-corpus
    # kmeans pairing, the cube-bound triple exchange, and the PQ
    # argmin assignment feeding the distortion mean
    "agg_trimmed_mean",
    "text_rake_keywords",
    "embedding_centroid_drift",
    "basket_itemset3_support",
    "ann_pq_distortion",
]

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_result_invariant_under_shuffle_partition_count(spark, name):
    import __spark_entry__ as entrymod
    from page_rank_mapreduce_java_spark.graph.queries import _RANKS_CACHE

    q = entrymod.queries()[name]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            # The rank-vector memo would short-circuit the re-run.
            _RANKS_CACHE.clear()
            spark.catalog.clearCache()
            results.append(_canon(q(spark, SF_DIR)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
        _RANKS_CACHE.clear()
        spark.catalog.clearCache()
    assert results[0] == results[1], (
        f"{name}: result depends on shuffle partition count"
    )
