"""Batch-11 operators: sketch properties and pattern-query invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cms_estimate_is_one_sided(spark, sf_dir):
    """Count-min never underestimates: est >= exact on every probe key."""
    from page_rank_mapreduce_java_spark.operators.relational11 import (
        q_sketch_cms_part_counts,
    )

    rows = q_sketch_cms_part_counts(spark, sf_dir).collect()
    assert rows
    assert all(r.cms_est >= r.exact for r in rows)


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every true member among the probes must be a Bloom hit:
    n_bloom_hits >= n_true_members, and false positives reconcile."""
    from page_rank_mapreduce_java_spark.operators.relational11 import (
        q_sketch_bloom_semijoin,
    )

    s = {r.stat: r.value for r in q_sketch_bloom_semijoin(spark, sf_dir).collect()}
    assert s["n_bloom_hits"] >= s["n_true_members"]
    assert s["n_false_pos"] == s["n_bloom_hits"] - s["n_true_members"]
    assert s["n_bits_set"] <= 256


def test_streaks_bounded_by_active_days(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational11 import (
        q_events_user_streaks,
    )

    rows = q_events_user_streaks(spark, sf_dir).collect()
    assert rows
    assert all(1 <= r.longest_streak <= r.n_active_days for r in rows)


def test_streaks_on_synthetic_runs(spark):
    from page_rank_mapreduce_java_spark.operators.relational11 import (
        q_events_user_streaks,
    )
    import page_rank_mapreduce_java_spark.operators.relational11 as r11
    import page_rank_mapreduce_java_spark.catalog as catalog

    # days 1,2,3 then 5,6 -> longest streak 3 of 5 active days
    df = spark.createDataFrame(
        [(1, f"2024-01-0{d} 12:00:00") for d in (1, 2, 3, 5, 6)],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    orig = catalog.load_table
    try:
        catalog_patch = lambda spark, table, sf_dir: df  # noqa: E731
        r11.load_table = catalog_patch
        [row] = q_events_user_streaks(spark, "unused").collect()
    finally:
        r11.load_table = orig
    assert row.n_active_days == 5
    assert row.longest_streak == 3


def test_incremental_rollup_equals_direct_aggregate(spark, sf_dir):
    """merge(base, delta) must equal the one-shot aggregate — the IVM
    correctness property itself."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents
    from page_rank_mapreduce_java_spark.operators.relational11 import (
        q_merge_incremental_rollup,
    )

    merged = {
        r.custkey: (r.n_orders, r.total_cents)
        for r in q_merge_incremental_rollup(spark, sf_dir).collect()
    }
    direct = {
        r.custkey: (r.n, r.c)
        for r in load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("o_totalprice"))).alias("c"))
        .collect()
    }
    assert merged == direct
