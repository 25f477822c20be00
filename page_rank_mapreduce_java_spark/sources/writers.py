"""Sinks (SURVEY.md §2.1 S3/S4).

The reference writes `key,value` text with a `,` separator and
`-`-joined adjacency with trailing dash (pageRank_v2.java:64,211,217),
one directory per iteration (S4). Parquet is the engine's native sink;
the text sink exists for byte-compatibility with the reference's format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_state_text(state: DataFrame, path: str, sort: bool = True) -> None:
    """Write typed state as the reference's text format:
    ``id,U,contrib,adj1-adj2-...-`` (trailing '-' matches
    pageRank_v2.java:211; 'U' tag matches the golden output)."""
    df = state
    if sort:
        df = df.orderBy("id")
    line = F.concat_ws(
        ",",
        F.col("id").cast("string"),
        F.lit("U"),
        F.col("contrib").cast("string"),
        F.concat(F.array_join(F.col("out"), "-"), F.lit("-")),
    ).alias("value")
    df.select(line).coalesce(1).write.mode("overwrite").text(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_iteration(df: DataFrame, base_path: str, iteration: int) -> None:
    """Per-iteration output dirs (S4): ``{base}/iter{N}`` parquet."""
    write_parquet(df, f"{base_path}/iter{iteration}")


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (columnar alternative where the downstream stack is
    Hive/ORC-native); same partitioned-directory layout as parquet."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink — the interchange format for downstream tooling
    that doesn't speak columnar; one object per line, splittable reads."""
    df.write.mode("overwrite").json(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, num_buckets: int = 32
) -> None:
    """Persist hash-bucketed on a join key: later joins/aggregations on
    ``bucket_col`` read co-located buckets and skip the shuffle entirely —
    the right storage layout for a graph's edge table that many jobs will
    re-join (PERF.md). Requires a warehouse-backed session (managed table)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
