"""Chunking: JVM hot path vs Python-UDTF extension template parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.chunking import (
    chunk_documents,
    make_chunk_udtf,
)


def test_chunks_cover_text_exactly(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    chunks = chunk_documents(docs, chunk_words=32)
    # Reassembling the chunks in order restores the original text.
    back = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk"))
                ).chunk,
                " ",
            ).alias("rebuilt")
        )
    )
    joined = docs.join(back, "doc_id").filter(F.col("text") != F.col("rebuilt"))
    assert joined.count() == 0
    # Every chunk except a doc's last has exactly chunk_words words.
    from pyspark.sql import Window

    last = F.max("chunk_id").over(Window.partitionBy("doc_id"))
    bad = chunks.withColumn("last", last).filter(
        (F.col("chunk_id") != F.col("last")) & (F.col("n_words") != 32)
    )
    assert bad.count() == 0


def test_udtf_matches_jvm_path(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    jvm = {
        (r.doc_id, r.chunk_id): (r.chunk, r.n_words)
        for r in chunk_documents(docs, chunk_words=32).collect()
    }
    ChunkWords = make_chunk_udtf(32)
    spark.udtf.register("chunk_words", ChunkWords)
    docs.createOrReplaceTempView("chunk_docs_in")
    udtf_rows = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.chunk, c.n_words "
        "FROM chunk_docs_in d, LATERAL chunk_words(d.text) c"
    ).collect()
    got = {(r.doc_id, r.chunk_id): (r.chunk, r.n_words) for r in udtf_rows}
    assert got == jvm
    assert len(got) > 0
