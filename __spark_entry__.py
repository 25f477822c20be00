"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship iterative PageRank on the sf0.001 corpus.
``queries()`` / ``oracle_sql()`` aggregate the per-module query registries;
every relational/graph/extension operator is registered with a DuckDB
oracle (queries without one get the driver's weaker rows-only check and are
flagged in the module docstrings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from page_rank_mapreduce_java_spark.graph.queries import q_pagerank

    return q_pagerank(spark, "/root/testdata/sf0.001")


def _registry() -> tuple[dict, dict]:
    from page_rank_mapreduce_java_spark.graph import queries as graph_queries
    from page_rank_mapreduce_java_spark.operators import (
        relational,
        relational2,
        relational3,
        relational4,
    )
    from page_rank_mapreduce_java_spark.dedup import queries as dedup_queries
    from page_rank_mapreduce_java_spark.similarity import queries as sim_queries
    from page_rank_mapreduce_java_spark.functions import text_queries

    # Import errors must propagate: silently shrinking the registry would
    # make the correctness gate pass on fewer queries without anyone
    # noticing.
    modules = [
        graph_queries,
        relational,
        relational2,
        relational3,
        relational4,
        dedup_queries,
        sim_queries,
        text_queries,
    ]

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    o: dict[str, str] = {}
    for m in modules:
        q.update(m.QUERIES)
        o.update(m.ORACLES)
    return q, o


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
