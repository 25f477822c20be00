"""Batch-parity driver-contract queries for the streaming surface.

Every transformation in streaming/events.py accepts a batch OR a streaming
DataFrame (same code path), so running one on the batch events table
certifies the exact dataflow the stream executes — these registered
queries are how the streaming operators earn rows in the driver's
correctness gate (tests/test_streaming.py separately proves the
stream-mode runs produce identical output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.streaming.events import (
    dedup_stream,
    enrich_by_segment,
    hourly_active_users,
    session_windows,
)


def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.session_windows (gap-based native sessionization) in
    batch: per (user, session) event counts with the session's start."""
    return session_windows(load_table(spark, "events", sf_dir))


def q_events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.dedup_stream in batch: keep each (user, event_type)
    key's first arrival in event-time order."""
    d = dedup_stream(load_table(spark, "events", sf_dir))
    return d.select("user_id", "event_type", "event_id")


def q_events_enriched_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.enrich_by_segment (stream-static broadcast enrichment)
    in batch: cent-exact totals per (market segment, event type)."""
    return enrich_by_segment(
        load_table(spark, "events", sf_dir), load_table(spark, "customer", sf_dir)
    )


def q_stream_hourly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.hourly_active_users (chained stateful aggregations) in
    batch: exact distinct users per tumbling hour."""
    return hourly_active_users(load_table(spark, "events", sf_dir))


QUERIES = {
    "events_session_windows": q_events_session_windows,
    "events_dedup_first": q_events_dedup_first,
    "events_enriched_segments": q_events_enriched_segments,
    "stream_hourly_active_users": q_stream_hourly_active_users,
}

ORACLES = {
    # Session semantics: a session's window is [first_ts, last_ts + gap);
    # an event at exactly last_ts + gap does NOT overlap, so a gap >= 30
    # minutes starts a new session (matching Spark's merge-on-overlap).
    # Interval arithmetic for DuckDB-version robustness (no epoch_us).
    "events_session_windows": """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - lag(ts) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id)
                      >= INTERVAL '30' MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events),
        sessed AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged)
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
               COUNT(*) AS n_events
        FROM sessed GROUP BY user_id, sid
    """,
    "events_dedup_first": """
        SELECT user_id, event_type, event_id FROM (
          SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1
    """,
    "events_enriched_segments": """
        SELECT c_mktsegment, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2
    """,
    "stream_hourly_active_users": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS window_start,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM events GROUP BY 1
    """,
}
