"""Batch-27 additions: pHash Hamming histogram, brand return rates,
customer value-trend census, session-length histogram. Value-level
correctness is oracle-gated (tools/check_oracle.py at sf0.001 + sf0.01
under shuffle.partitions 3/17/32); these tests pin structural
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational27 import (
    TREND_MIN_ORDERS,
    q_customer_value_trend_census,
    q_events_session_length_histogram,
    q_lineitem_return_rate_by_brand,
    q_mm_phash_hamming_histogram,
)


def test_phash_histogram_totals_and_domain(spark, sf_dir):
    from page_rank_mapreduce_java_spark.multimodal.phash import (
        PHASH_HAM_MAX,
        q_mm_image_phash_pairs,
    )

    rows = q_mm_phash_hamming_histogram(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.hamming <= PHASH_HAM_MAX for r in rows)
    assert sum(r.n_pairs for r in rows) == q_mm_image_phash_pairs(
        spark, sf_dir
    ).count()


def test_return_rate_covers_all_brands(spark, sf_dir):
    rows = q_lineitem_return_rate_by_brand(spark, sf_dir).collect()
    n_brands = (
        load_table(spark, "part", sf_dir).select("p_brand").distinct().count()
    )
    assert len(rows) == n_brands
    n_items = load_table(spark, "lineitem", sf_dir).count()
    assert sum(r.n_items for r in rows) == n_items
    for r in rows:
        assert 0 <= r.n_returned <= r.n_items
        assert r.return_ppm == 1_000_000 * r.n_returned // r.n_items
        assert (r.n_returned == 0) == (r.returned_cents == 0)


def test_trend_census_partitions_scored_customers(spark, sf_dir):
    r = q_customer_value_trend_census(spark, sf_dir).head()
    assert r.growing + r.shrinking + r.flat == r.n_scored
    scored = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .count()
        .filter(F.col("count") >= TREND_MIN_ORDERS)
        .count()
    )
    assert r.n_scored == scored
    assert r.growing_ppm == 1_000_000 * r.growing // r.n_scored


def test_session_histogram_totals(spark, sf_dir):
    from page_rank_mapreduce_java_spark.streaming.events import session_windows

    rows = q_events_session_length_histogram(spark, sf_dir).collect()
    assert rows
    sess = session_windows(load_table(spark, "events", sf_dir))
    assert sum(r.n_sessions for r in rows) == sess.count()
    # every event lands in exactly one session
    n_events = load_table(spark, "events", sf_dir).count()
    assert sum(r.n_events * r.n_sessions for r in rows) == n_events
