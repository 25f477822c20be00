"""Streaming surface: batch/stream parity, session windows, custom state."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.streaming.events import (
    click_attribution,
    dedup_stream,
    materialize_stream_source,
    read_event_stream,
    run_stream_to_memory,
    running_user_totals,
    session_windows,
    sliding_counts,
    tumbling_counts,
    write_stream_foreach_batch,
)


@pytest.fixture(scope="module")
def stream_path(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="events_stream_")
    materialize_stream_source(spark, sf_dir, d)
    return d


def test_tumbling_counts_stream_matches_batch(spark, sf_dir, stream_path):
    stream = tumbling_counts(read_event_stream(spark, stream_path))
    assert stream.isStreaming
    run_stream_to_memory(stream, "tumbling")
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    batch = tumbling_counts(load_table(spark, "events", sf_dir))
    exp = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in batch.collect()
    }
    assert got == exp
    assert len(exp) > 10


def test_session_windows_stream(spark, stream_path):
    stream = session_windows(read_event_stream(spark, stream_path))
    run_stream_to_memory(stream, "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_sliding_counts_stream_matches_batch(spark, sf_dir, stream_path):
    stream = sliding_counts(read_event_stream(spark, stream_path))
    run_stream_to_memory(stream, "sliding")
    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM sliding").collect()
    }
    exp = {
        (r.window_start, r.event_type): r.n
        for r in sliding_counts(load_table(spark, "events", sf_dir)).collect()
    }
    assert got == exp
    # every event appears in window/slide = 4 overlapping windows
    assert sum(got.values()) == 4 * load_table(spark, "events", sf_dir).count()


def test_dedup_stream_bounded_state(spark, stream_path):
    """Within one watermark window every key is emitted exactly once."""
    stream = dedup_stream(read_event_stream(spark, stream_path), watermark="10 days")
    assert stream.isStreaming
    run_stream_to_memory(stream, "dedup_stream_out")
    got = spark.sql(
        "SELECT user_id, event_type, COUNT(*) AS n FROM dedup_stream_out "
        "GROUP BY 1, 2 HAVING COUNT(*) > 1"
    ).collect()
    assert got == []
    n_keys = (
        spark.read.parquet(stream_path)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM dedup_stream_out").first().n == n_keys


def test_stream_stream_join_matches_batch(spark, sf_dir, stream_path):
    def sides(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = click_attribution(*sides(read_event_stream(spark, stream_path)))
    assert stream.isStreaming
    run_stream_to_memory(stream, "attribution")
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM attribution").collect()
    }
    exp = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in click_attribution(*sides(load_table(spark, "events", sf_dir))).collect()
    }
    assert got == exp
    assert len(exp) > 0


def test_foreach_batch_sink(spark, stream_path, tmp_path):
    out = str(tmp_path / "fb")
    write_stream_foreach_batch(read_event_stream(spark, stream_path), out)
    back = spark.read.parquet(f"{out}/epoch=*")
    assert back.count() == spark.read.parquet(stream_path).count()


def test_running_user_totals_stateful(spark, sf_dir, stream_path):
    stream = running_user_totals(read_event_stream(spark, stream_path))
    q = stream.writeStream.outputMode("update").format("memory").queryName("totals").start()
    q.processAllAvailable()
    q.stop()
    # last update per user == full batch aggregate
    got = {
        r.user_id: (r.n_events, r.total_cents)
        for r in spark.sql(
            "SELECT user_id, max_by(n_events, n_events) AS n_events,"
            " max_by(total_cents, n_events) AS total_cents FROM totals GROUP BY user_id"
        ).collect()
    }
    exp = {
        r.user_id: (r.n, r.cents)
        for r in load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == exp


def test_enrich_by_segment_stream_matches_batch(spark, sf_dir, stream_path):
    """Stream-static broadcast enrichment: the per-micro-batch dimension
    join must produce the same segment rollup as the batch run."""
    from page_rank_mapreduce_java_spark.streaming.events import enrich_by_segment

    dim = load_table(spark, "customer", sf_dir)
    stream = enrich_by_segment(read_event_stream(spark, stream_path), dim)
    assert stream.isStreaming
    run_stream_to_memory(stream, "enriched")
    got = {
        (r.c_mktsegment, r.event_type): (r.n, r.total_cents)
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    batch = enrich_by_segment(load_table(spark, "events", sf_dir), dim)
    exp = {
        (r.c_mktsegment, r.event_type): (r.n, r.total_cents) for r in batch.collect()
    }
    assert got == exp
    assert len(exp) >= 5


def test_stream_upsert_latest_version_and_replay_idempotent(spark, tmp_path):
    """CDC upsert: the target table converges to the latest version per
    key, and replaying the whole stream over the existing target (crash
    recovery / at-least-once source) leaves it unchanged."""
    import os

    from pyspark.sql import types as T

    from page_rank_mapreduce_java_spark.streaming.events import (
        stream_upsert_to_parquet,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("version", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    # Two files -> with maxFilesPerTrigger=1 the stream sees two epochs.
    spark.createDataFrame(
        [(1, 1, "a1"), (2, 1, "b1"), (1, 2, "a2")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2, 3, "b3"), (3, 1, "c1"), (2, 2, "b2")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    target = str(tmp_path / "table")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    stream_upsert_to_parquet(stream, target, key="k", version_col="version")

    want = {(1, 2, "a2"), (2, 3, "b3"), (3, 1, "c1")}
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == want

    # Full replay from scratch onto the existing target: idempotent.
    stream2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    stream_upsert_to_parquet(stream2, target, key="k", version_col="version")
    got2 = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got2 == want

    # Replaying only an OLD epoch must not regress keys: epoch 1 carries
    # k=2 at version 1, but the table holds version 3 — the
    # version-aware merge keeps the newer row.
    import glob
    import shutil

    old_only = str(tmp_path / "src_old")
    os.makedirs(old_only)
    # Pick the file that actually holds the stale row (append order and
    # filename order need not agree).
    stale_file = next(
        f
        for f in glob.glob(f"{src}/*.parquet")
        if spark.read.parquet(f).filter("payload = 'b1'").count() > 0
    )
    shutil.copy(stale_file, old_only)
    stream3 = spark.readStream.schema(schema).parquet(old_only)
    stream_upsert_to_parquet(stream3, target, key="k", version_col="version")
    got3 = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got3 == want


def test_recover_upsert_restores_stranded_table(spark, tmp_path):
    """A crash between the upsert sink's two swap renames leaves the
    table only at '<target>._upsert_old'. The next sink invocation (or an
    explicit recover_upsert) must restore it BEFORE merging — otherwise
    the epoch rebuilds the table from its own batch alone and the final
    cleanup deletes the stranded copy permanently (ADVICE r3 medium)."""
    import os
    import shutil

    from pyspark.sql import types as T

    from page_rank_mapreduce_java_spark.streaming.events import (
        recover_upsert,
        stream_upsert_to_parquet,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("version", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    target = str(tmp_path / "table")
    spark.createDataFrame([(1, 1, "a1"), (2, 1, "b1")], schema).coalesce(
        1
    ).write.parquet(target)

    # Healthy table: recovery is a no-op.
    assert recover_upsert(spark, target) is False

    # Simulate the crashed swap: table moved aside, promote never happened.
    shutil.move(target, target + "._upsert_old")
    assert recover_upsert(spark, target) is True
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {
        (1, 1, "a1"),
        (2, 1, "b1"),
    }

    # End-to-end: strand the table again, then run a stream carrying only
    # a NEW key. The sink must self-recover and merge, not start over.
    shutil.move(target, target + "._upsert_old")
    src = str(tmp_path / "src")
    spark.createDataFrame([(3, 1, "c1")], schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_upsert_to_parquet(stream, target, key="k", version_col="version")
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 1, "a1"), (2, 1, "b1"), (3, 1, "c1")}
    assert not os.path.exists(target + "._upsert_old")
