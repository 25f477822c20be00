"""Deterministic graph fixtures (FIXTURES.md §1).

``chain_edges(k)`` is the reference's synthetic workload (design note at
reference pageRank_v2.java:32-43): k disjoint chains of k nodes over ids
1..k², node i → i+1 within a chain, every chain tail → sink node 0.
Generated distributed (spark.range) so k=10⁴ (10⁸ nodes) would still work:
no driver-side materialization.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src LONG, dst LONG"


def chain_edges(spark: SparkSession, k: int) -> DataFrame:
    """Edge list of the k-chains graph: ids 1..k²; i→i+1, chain tails→0."""
    ids = spark.range(1, k * k + 1).withColumnRenamed("id", "src")
    return ids.select(
        F.col("src"),
        F.when(F.col("src") % k == 0, F.lit(0)).otherwise(F.col("src") + 1).alias("dst"),
    )


def random_edges(spark: SparkSession, n: int, m: int, seed: int = 7) -> DataFrame:
    """m distinct (src, dst) edges over nodes 1..n, deterministic in seed.

    Used for cross-oracle tests vs NetworkX-style general PageRank. Small
    fixture sizes only — generated on the driver for exact determinism.
    """
    if m > n * n:
        raise ValueError(f"m={m} exceeds the {n * n} possible (src, dst) pairs")
    rng = random.Random(seed)
    seen: set[tuple[int, int]] = set()
    while len(seen) < m:
        seen.add((rng.randint(1, n), rng.randint(1, n)))
    return spark.createDataFrame(sorted(seen), schema=EDGE_SCHEMA)
