"""Document chunking — the context-window splitter every LLM training /
RAG pipeline runs over its corpus.

Two implementations of the same semantics (fixed-size word windows):

- ``chunk_documents`` — the HOT PATH: pure JVM column expressions
  (split → sequence → transform(slice) → posexplode), whole-stage
  codegen'd, no Python in the loop. This is the one registered with the
  oracle gate and safe at 100 TB (narrow op, no shuffle; output rows ≈
  input words / chunk_words).
- ``ChunkWordsUDTF`` — the EXTENSION TEMPLATE: the same operator as a
  Python UDTF (Spark 4 lateral-join surface), demonstrating how a user
  plugs in chunkers Spark can't express relationally (sentence
  segmenters, tokenizer-aware splitters). Row-at-a-time Python — keep it
  off hot paths; tests pin it to the JVM path's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_words: int = 32) -> DataFrame:
    """DataFrame[doc_id, chunk_id, chunk, n_words]: ``text`` split into
    consecutive ``chunk_words``-word windows (last chunk ragged)."""
    w = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(w) / F.lit(float(chunk_words))).cast("int")
    pieces = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(w, i * chunk_words + 1, chunk_words),
    )
    return (
        docs.select("doc_id", F.posexplode(pieces).alias("chunk_id", "piece"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join("piece", " ").alias("chunk"),
            F.size("piece").cast("long").alias("n_words"),
        )
    )


def chunk_sql(chunk_words: int = 32) -> str:
    """DuckDB rendering of ``chunk_documents`` (list slice is 1-based
    inclusive and truncates at the list end, matching F.slice)."""
    cw = chunk_words
    return f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             c AS (SELECT doc_id, words,
                          unnest(range(0, CAST(ceil(len(words)/{cw}.0) AS BIGINT))) AS chunk_id
                   FROM w)
        SELECT doc_id, chunk_id,
               array_to_string(words[chunk_id*{cw}+1 : chunk_id*{cw}+{cw}], ' ') AS chunk,
               CAST(len(words[chunk_id*{cw}+1 : chunk_id*{cw}+{cw}]) AS BIGINT) AS n_words
        FROM c
    """


def make_chunk_udtf(chunk_words: int = 32):
    """Python-UDTF variant (extension template; see module docstring)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id BIGINT, chunk STRING, n_words BIGINT")
    class ChunkWords:
        def eval(self, text: str):
            ws = (text or "").split(" ")
            for i in range(0, max(len(ws), 1), chunk_words):
                piece = ws[i : i + chunk_words]
                yield i // chunk_words, " ".join(piece), len(piece)

    return ChunkWords
