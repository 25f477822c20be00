"""Sources (SURVEY.md §2.1).

The reference reads CSV edge lists (``src,dst`` text lines,
pageRank_v2.java:117,153) and its own iteration-state text re-reads
(pageRank_v2.java:116-122). Here: schema'd CSV scan (no inference in
production paths), the legacy state-text decoder for compatibility, and
parquet/json passthroughs. All reads go through DataFrameReader so Catalyst
gets pushdown + pruning; local FS / HDFS / s3a URIs all work via Hadoop FS
connectors (reference Makefile:48,99,131 used local/HDFS/S3 the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

# Typed schema of the reference's circulated text record
# `node,U,contrib,adjList` (pageRank_v2.java:217, output/check3) as decoded
# by read_state_text. The text format carries no rank field (the 'U' tag
# occupies that slot); the engine's richer in-memory state adds rank —
# see graph.pagerank.reference_init_state.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("contrib", T.DoubleType(), True),
        T.StructField("out", T.ArrayType(T.LongType()), True),
    ]
)


def read_edge_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV edge-list scan: lines `src,dst`, long ids, no header (S1)."""
    return spark.read.schema(EDGE_SCHEMA).csv(path)


def read_state_text(spark: SparkSession, path: str) -> DataFrame:
    """Decode the reference's iteration-state text format (S2):
    ``node,U,contrib,adj1-adj2-...-`` → typed state rows.

    Only needed for interop with outputs of the reference; the engine
    itself keeps state as a persisted DataFrame across iterations.
    """
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), ",")
    out_str = parts.getItem(3)
    return raw.select(
        parts.getItem(0).cast("long").alias("id"),
        parts.getItem(2).cast("double").alias("contrib"),
        F.filter(
            F.split(out_str, "-"), lambda x: x != F.lit("")
        ).cast("array<long>").alias("out"),
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema'd JSON-lines scan — inference is never used in production."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Same pushdown/pruning properties as parquet (columnar,
    predicate pushdown via ORC bloom/min-max); schema travels with the
    files so no explicit StructType is needed."""
    return spark.read.orc(path)
