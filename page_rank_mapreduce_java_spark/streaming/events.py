"""Structured Streaming surface (SURVEY.md §2.9 — absent from the
reference, required by the engine's extension surface).

Batch/stream parity by construction: the transformations here take either
a batch or a streaming DataFrame (same code path), so every streaming
query has an exact batch equivalent the oracle harness can check. Local
tests drive parquet-backed streams to completion with
``processAllAvailable`` + the memory sink.

Scale notes: watermark + tumbling windows keep state bounded; the stateful
per-user counter uses applyInPandasWithState (Arrow-batched, partitioned
by user — no driver state). On a real cluster the source becomes Kafka and
the sink a transactional foreachBatch writer; the middle is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of an events parquet directory (µs timestamps —
    write one with ``materialize_stream_source`` first if starting from
    the raw ns-timestamp corpus)."""
    return spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(path)


def materialize_stream_source(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Re-encode the corpus events table as a streamable parquet dir."""
    from page_rank_mapreduce_java_spark.catalog import load_table

    load_table(spark, "events", sf_dir).write.mode("overwrite").parquet(out_path)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Windowed counts + exact cent sums; watermark bounds state for
    late data when the input is a stream."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    from page_rank_mapreduce_java_spark.functions.money import cents

    return (
        df.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def hourly_active_users(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exact distinct users per tumbling hour — the DAU-curve primitive
    at stream granularity. Two chained stateful aggregations (the
    Spark-4 multiple-stateful-operator path): the first collapses to
    one row per (hour window, user) — bounded state, each key expires
    with the watermark — the second counts per window. Identical code
    path in batch (both aggregations are ordinary groupBys there).

    Scale shape: both shuffles are keyed on (window, user) then window
    with map-side partial aggregation; state never exceeds the live
    watermark horizon × active-user count."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    per_user = df.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("_n"))
    # Downstream aggregation re-windows on window_time(w) — the
    # SPARK-40925 pattern that lets the watermark propagate through
    # chained stateful operators (grouping the raw struct trips the
    # global-watermark correctness check). Identical result in batch:
    # window_time is w.end − 1µs, which re-buckets to the same hour.
    return (
        per_user.groupBy(
            F.window(F.window_time("w"), "1 hour").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            F.date_format(F.col("w2.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "active_users",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user (streaming-native sessionization;
    batch equivalent is the lag-gap query in operators/relational.py)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            "n_events",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping (sliding) windows — each event lands in
    window/slide buckets; state is bounded by the watermark."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's state only until the
    watermark passes it, so state size tracks the watermark window — the
    way a 100 TB/day ingest dedups without unbounded memory. (Plain
    ``dropDuplicates`` on a stream never expires state.) A key recurring
    after the watermark expires is re-emitted.

    Batch inputs keep the FIRST row per key in (ts, event_id) order —
    the deterministic equivalent of the stream's keep-first-arrival
    semantics (``dropDuplicates`` would keep an arbitrary row, which is
    neither parity nor oracle-checkable). One shuffle on the keys."""
    keys = keys or ["user_id", "event_type"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def click_attribution(clicks: DataFrame, purchases: DataFrame, *, within: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: each purchase attributed to the same
    user's click(s) in the preceding ``within`` interval.

    Streaming semantics: BOTH sides carry a watermark and the join
    condition bounds purchase time relative to click time, so Spark can
    expire join state — without the time bound, stream-stream state
    grows forever. Batch semantics are identical (the watermark is a
    no-op on bounded data), so the oracle gate checks this exact
    function. One shuffle on user_id; the range predicate is a residual
    filter, never a cartesian product.
    """
    l = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    r = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if l.isStreaming:
        l = l.withWatermark("c_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("p_ts", watermark)
    return l.join(
        r,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
    )


def enrich_by_segment(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the event flow to the customer
    dimension (user_id = c_custkey) and roll up exact cent totals per
    (market segment, event type).

    Streaming semantics: a stream-static inner join is stateless — Spark
    re-broadcasts the static side per micro-batch, no watermark needed on
    either side; the downstream aggregation holds segment-cardinality
    state. Batch semantics are identical (the oracle gate checks this
    exact function). On a cluster the dimension side stays broadcast-
    sized (segments × customers, dimension table) — the canonical
    enrichment topology for a 100 TB/day ingest."""
    from page_rank_mapreduce_java_spark.functions.money import cents

    dim = F.broadcast(customers.select("c_custkey", "c_mktsegment"))
    return (
        events.join(dim, events.user_id == dim.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("value")).alias("total_cents"),
        )
    )


def write_stream_foreach_batch(df: DataFrame, out_dir: str) -> None:
    """Exactly-once-style sink: every micro-batch lands as its own parquet
    dir keyed by epoch — the idempotent-writer pattern a transactional
    sink (Delta/Iceberg MERGE) would use on a real deployment."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = df.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count + value total
    via applyInPandasWithState — the engine's template for operators that
    Structured Streaming lacks natively."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id LONG, n_events LONG, total_cents LONG"
    state_schema = "n LONG, cents LONG"

    def update(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # HALF_UP (away from zero), matching F.round in the batch
            # paths — numpy's .round() is half-to-even and would drift by
            # 1 cent on exact-.5 products.
            import numpy as np

            v = pdf["value"].to_numpy() * 100
            cents += int(np.sign(v).astype("int64") @ np.floor(np.abs(v) + 0.5).astype("int64"))
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def recover_upsert(spark, target_dir: str) -> bool:
    """Startup/sink-entry check for an upsert swap that crashed between
    its two renames (table stranded at ``<target>._upsert_old`` while
    ``target_dir`` is missing). Returns True if a recovery rename was
    performed. Mirrors sources/maintenance.recover_compaction: it only
    acts when the target is absent AND the old copy exists, so a healthy
    or mid-write table is never touched."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(target_dir)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    jold = jvm.org.apache.hadoop.fs.Path(target_dir.rstrip("/") + "._upsert_old")
    if fs.exists(jold) and not fs.exists(jpath):
        if not fs.rename(jold, jpath):
            raise IOError(f"recover_upsert: could not restore {target_dir}")
        return True
    return False


def stream_upsert_to_parquet(
    stream: DataFrame,
    target_dir: str,
    key: str,
    version_col: str,
) -> None:
    """Streaming CDC upsert: maintain a parquet table as the latest
    version per key seen on the stream — the foreachBatch + MERGE
    pattern every lakehouse ingestion job runs, composed from this
    repo's own pieces (operators/merge.merge_upsert + an epoch-staged
    atomic swap).

    Each micro-batch: (1) dedup the batch to its latest row per key
    (max version_col); (2) VERSION-AWARE merge into the current table
    snapshot — union + keep the max-version row per key, so a stale row
    can never overwrite a newer one; (3) write the merged table to a
    staging dir and swap via two renames (same recovery contract as
    sources/maintenance.compact_parquet). Replaying ANY epoch — the
    last one, an old one, or the whole stream (at-least-once source,
    crash recovery) — is therefore a strict no-op, not merely
    eventually-convergent. On a cluster with a transactional format,
    steps (2)/(3) collapse to one MERGE INTO ... WHEN MATCHED AND
    source.version > target.version.

    Scale note: the merge rewrites the table per epoch — correct and
    atomic, but write amplification grows with table size; a real
    deployment partitions the target (rewrite only touched partitions)
    or uses the lakehouse MERGE. Bounded local streams are the test
    harness here.
    """
    import os

    from pyspark.sql.window import Window as W

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # A crash between the two swap renames below strands the table at
        # ._upsert_old with target_dir missing; without this restore the
        # next epoch would rebuild "merged" from its own batch alone and
        # then delete the stranded copy — losing the table (ADVICE r3
        # medium). Same contract as sources/maintenance.recover_compaction.
        recover_upsert(spark, target_dir)
        w = W.partitionBy(key).orderBy(F.desc(version_col))
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if os.path.isdir(target_dir):
            # Version-aware upsert: new rows win ties (_src 1 > 0) but
            # never beat a strictly newer current row.
            current = spark.read.parquet(target_dir)
            vw = W.partitionBy(key).orderBy(F.desc(version_col), F.desc("_src"))
            merged = (
                current.withColumn("_src", F.lit(0))
                .unionByName(latest.withColumn("_src", F.lit(1)))
                .withColumn("_rn", F.row_number().over(vw))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_src")
            )
        else:
            merged = latest
        tmp = target_dir.rstrip("/") + "._upsert_tmp"
        old = target_dir.rstrip("/") + "._upsert_old"
        merged.write.mode("overwrite").parquet(tmp)
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(target_dir)
        fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
        jold = jvm.org.apache.hadoop.fs.Path(old)
        fs.delete(jold, True)
        if fs.exists(jpath) and not fs.rename(jpath, jold):
            raise IOError(f"stream_upsert: could not move {target_dir} aside")
        if not fs.rename(jtmp, jpath):
            fs.rename(jold, jpath)
            raise IOError(f"stream_upsert: could not promote {tmp}")
        fs.delete(jold, True)

    q = stream.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()


def run_stream_to_memory(df: DataFrame, name: str) -> None:
    """Drive a (bounded) streaming query to completion synchronously."""
    q = (
        df.writeStream.outputMode("complete" if _has_agg(df) else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()
