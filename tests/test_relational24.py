"""Batch-24 additions: dedup cluster size histogram, term burstiness,
global transitivity, dwell times, streaming hourly actives. Value-level
correctness is oracle-gated (tools/check_oracle.py at sf0.001 + sf0.01
under shuffle.partitions 3/17/32); these tests pin structural
invariants — plus the stream-mode parity run for the new streaming
operator."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational24 import (
    BURSTY_TOP_N,
    q_dedup_cluster_size_histogram,
    q_events_dwell_time_by_type,
    q_graph_transitivity_global,
    q_text_term_burstiness,
)
from page_rank_mapreduce_java_spark.streaming.events import (
    hourly_active_users,
    materialize_stream_source,
    read_event_stream,
)


def test_cluster_histogram_accounts_for_every_doc(spark, sf_dir):
    rows = q_dedup_cluster_size_histogram(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.cluster_size >= 1


def test_burstiness_bounds_and_ordering(spark, sf_dir):
    rows = q_text_term_burstiness(spark, sf_dir).collect()
    assert 0 < len(rows) <= BURSTY_TOP_N
    n_docs = load_table(spark, "documents", sf_dir).count()
    for r in rows:
        assert 0 < r.df <= n_docs
        assert r.total_occurrences >= r.df
        # Fano of a count variable is ≥ the all-docs-identical floor
        # and 0 only if every doc has the identical count incl. zeros
        assert r.fano_milli >= 0


def test_transitivity_consistent_with_triangle_chassis(spark, sf_dir):
    from page_rank_mapreduce_java_spark.graph.motifs import triangle_counts
    from page_rank_mapreduce_java_spark.graph.queries import cooccurrence_edges

    r = q_graph_transitivity_global(spark, sf_dir).head()
    tri = triangle_counts(cooccurrence_edges(spark, sf_dir))
    assert r.closed_wedges == tri.agg(F.sum("triangles")).head()[0]
    assert r.closed_wedges % 3 == 0  # Σ participation = 3·T exactly
    assert 0 <= r.closed_wedges <= r.n_wedges
    assert 0 <= r.transitivity_ppm <= 1_000_000


def test_dwell_total_matches_pairs(spark, sf_dir):
    rows = q_events_dwell_time_by_type(spark, sf_dir).collect()
    assert rows
    e = load_table(spark, "events", sf_dir)
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    # every event except each user's last contributes exactly one dwell
    assert sum(r.n_dwells for r in rows) == n_events - n_users
    assert all(r.mean_dwell_ms >= 0 for r in rows)


@pytest.fixture(scope="module")
def stream_path_24(spark, sf_dir):
    """Stream source = corpus events + one far-future sentinel event.
    Chained stateful aggregations only run in APPEND mode, which emits
    a window once the watermark passes it — the sentinel advances the
    watermark beyond every real window so the bounded run flushes
    completely (its own window is excluded from the comparison)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    materialize_stream_source(spark, sf_dir, d)
    e = load_table(spark, "events", sf_dir)
    sentinel = (
        e.agg((F.max("ts") + F.expr("INTERVAL 2 DAYS")).alias("ts"))
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            "ts",
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("").alias("props"),
        )
    )
    sentinel.write.mode("append").parquet(d)
    return d


def test_hourly_active_users_stream_matches_batch(spark, sf_dir, stream_path_24):
    stream = hourly_active_users(read_event_stream(spark, stream_path_24))
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("hourly_actives")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    batch = hourly_active_users(load_table(spark, "events", sf_dir))
    exp = {r.window_start: r.active_users for r in batch.collect()}
    got = {
        r.window_start: r.active_users
        for r in spark.sql("SELECT * FROM hourly_actives").collect()
        if r.window_start in exp  # drop the sentinel's own window
    }
    assert got == exp
    assert len(exp) > 10
