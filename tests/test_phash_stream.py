"""Streaming perceptual dedup: stream-mode output matches the batch twin."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.multimodal.phash import phash_keeper_stream
from page_rank_mapreduce_java_spark.streaming.events import run_stream_to_memory

DOC_SCHEMA = "doc_id LONG, text STRING, ts TIMESTAMP"


def _docs(spark):
    rows = [(i, f"streamed doc {i} body", f"2024-03-01 10:{i:02d}:00") for i in range(8)]
    # planted dups: 100/101 share text with doc 2 (arrive later)
    rows += [
        (100, "streamed doc 2 body", "2024-03-01 11:00:00"),
        (101, "streamed doc 2 body", "2024-03-01 11:01:00"),
    ]
    return spark.createDataFrame(
        [(d, t, ts) for d, t, ts in rows], "doc_id long, text string, ts_s string"
    ).select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))


def test_phash_keeper_stream_matches_batch(spark):
    src = tempfile.mkdtemp(prefix="docs_stream_")
    batch = _docs(spark)
    # one file per doc_id bucket, written in doc_id order so stream
    # arrival order == the batch twin's keep-smallest-doc_id order
    for lo, hi in ((0, 5), (5, 102)):
        batch.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = phash_keeper_stream(
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        watermark="1 day",
    )
    assert stream.isStreaming
    run_stream_to_memory(stream, "phash_keepers_out")
    got = {
        (r.doc_id, r.phash) for r in spark.sql("SELECT * FROM phash_keepers_out").collect()
    }
    exp = {(r.doc_id, r.phash) for r in phash_keeper_stream(batch).collect()}
    assert got == exp
    # the duplicate texts must have been suppressed: 8 distinct contents
    assert len(got) == 8
    assert all(d < 100 for d, _ in got)
