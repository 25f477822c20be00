"""Reusable graph operators (SURVEY.md §7 M3).

Covers the reference's v1 operators (edge inversion pageRank.java:138-142,
record counting pageRank.java:146-158) plus the trivial-in-Spark utilities
the reference lacked (top-k, degree histogram, dangling detection).
All are thin DataFrame compositions: Catalyst handles pushdown and
partial aggregation; nothing here touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def invert_edges(edges: DataFrame) -> DataFrame:
    """(src,dst) → (dst,src): incoming-link orientation.

    The reference's v1 'IncomingLinksMapper' (pageRank.java:138-142)."""
    return edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))


def dangling_nodes(edges: DataFrame) -> DataFrame:
    """Nodes with no out-edges (left-anti join, no driver round-trip)."""
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return nodes.join(edges.select(F.col("src").alias("id")), "id", "left_anti")


def degree_histogram(edges: DataFrame) -> DataFrame:
    """out-degree → node count; two-level aggregation, both map-side-partial."""
    return (
        out_degrees(edges)
        .groupBy("out_degree")
        .agg(F.count(F.lit(1)).alias("num_nodes"))
    )


def top_k_ranks(ranks: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k by rank (ties broken by id).

    Absent from the reference (its Makefile:21 hints at a never-implemented
    top-k cousin); in Spark this is a TakeOrderedAndProject — no full sort.
    """
    return ranks.orderBy(F.desc("rank"), F.asc("id")).limit(k)


def secondary_sort(
    df: DataFrame, primary: str, secondary: str, num_partitions: int | None = None
) -> DataFrame:
    """The v1 composite-key secondary sort (pageRank.java:80-131) as a plan:
    hash-partition by the primary key, sort within partitions by
    (primary, secondary). One shuffle, no global sort."""
    n = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, primary).sortWithinPartitions(primary, secondary)


def top_k_per_group(
    df: DataFrame, group: str, order: str, k: int, tiebreak: str | None = None
) -> DataFrame:
    """Per-group top-k via window row_number. Ties on ``order`` at the k
    boundary are broken by ``tiebreak`` (ascending); without one, which of
    the tied rows survives is partition-order-dependent."""
    cols = [F.desc(order)] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(group).orderBy(*cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
