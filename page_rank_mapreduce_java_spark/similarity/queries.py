"""Similarity-search driver-contract queries with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.vectors import cosine_sql
from page_rank_mapreduce_java_spark.similarity.ann import (
    brute_force_topk,
    lsh_buckets,
    lsh_buckets_sql,
)

N_QUERY_VECS = 8
TOP_K = 10


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(e, queries, k=TOP_K)


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return lsh_buckets(e)


def q_ann_lsh_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy histogram — the recall/skew diagnostic for LSH."""
    e = load_table(spark, "embeddings", sf_dir)
    return (
        lsh_buckets(e)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


QUERIES = {
    "ann_bruteforce_topk": q_ann_bruteforce,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_bucket_sizes": q_ann_lsh_bucket_sizes,
}

ORACLES = {
    "ann_bruteforce_topk": f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 {cosine_sql('q.embedding', 'c.embedding')} AS cos
          FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
          WHERE q.vec_id < {N_QUERY_VECS}
        )
        SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rn
        FROM scored
        QUALIFY rn <= {TOP_K}
    """,
    "ann_lsh_buckets": f"""
        SELECT vec_id, {lsh_buckets_sql()} AS bucket FROM embeddings
    """,
    "ann_lsh_bucket_sizes": f"""
        SELECT bucket, COUNT(*) AS n_vectors
        FROM (SELECT {lsh_buckets_sql()} AS bucket FROM embeddings)
        GROUP BY bucket
    """,
}
