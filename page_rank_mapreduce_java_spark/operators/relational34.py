"""Relational/analytics surface, batch 34 (round 8 growth, final
wave): the k-core decomposition curve — core size and internal edge
mass for k = 1..6 on the certified synchronous-peeling chassis.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-33, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred via
`_DEFER_TO_NEXT_ROUND`.

Exactness: pure integer counting over the peeling fixpoint (the
graph_kcore contract — stop_early exits at the fixpoint the unrolled
oracle also lands on)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.graph.motifs import kcore, kcore_sql
from page_rank_mapreduce_java_spark.graph.queries import (
    COOC_EDGES_SQL,
    cooccurrence_edges,
)

KCORE_CURVE_MAX_K = 6
KCORE_CURVE_ROUNDS = 8


def q_graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-core decomposition curve of the supplier co-occurrence
    graph: for each k = 1..6, how many nodes survive k-core peeling
    and how much internal edge mass they retain — the cohesion profile
    in one relation (graph_kcore reports the single k=3 shell; the
    CURVE is what locates the graph's degeneracy and how abruptly the
    dense nucleus shears off). Output per k:
    (k, core_size, core_degree_sum) — core_degree_sum = 2·|E(core)|.

    Exactness: pure integer counting at each k's peeling fixpoint;
    stop_early is oracle-safe (the unrolled 8-round chain lands on the
    same fixpoint — the graph_kcore contract).

    Scale shape: six independent runs of the certified peeling chassis
    (each round: two semi-joins + one degree aggregate on the live
    subgraph, lineage cut per round); the curve rollup is six 1-row
    aggregates unioned. At 100 TB this is six passes of the measured
    kcore profile — embarrassingly parallel across k if ever needed.
    """
    edges = cooccurrence_edges(spark, sf_dir)
    out = None
    for k in range(1, KCORE_CURVE_MAX_K + 1):
        core = kcore(edges, k=k, rounds=KCORE_CURVE_ROUNDS)
        row = core.agg(
            F.lit(k).cast("long").alias("k"),
            F.count(F.lit(1)).cast("long").alias("core_size"),
            F.coalesce(F.sum("core_degree"), F.lit(0))
            .cast("long")
            .alias("core_degree_sum"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _kcore_curve_sql() -> str:
    parts = []
    for k in range(1, KCORE_CURVE_MAX_K + 1):
        inner = kcore_sql(COOC_EDGES_SQL, k=k, rounds=KCORE_CURVE_ROUNDS)
        parts.append(
            f"""SELECT CAST({k} AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS core_size,
       CAST(COALESCE(SUM(core_degree), 0) AS BIGINT) AS core_degree_sum
FROM ({inner})"""
        )
    return "\nUNION ALL\n".join(parts)


QUERIES = {
    "graph_kcore_decomposition": q_graph_kcore_decomposition,
}

ORACLES = {
    "graph_kcore_decomposition": _kcore_curve_sql(),
}
