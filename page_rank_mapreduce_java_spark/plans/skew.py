"""Skew mitigation utilities.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
at runtime; this module adds *explicit* key salting for the cases AQE
can't rewrite — aggregations over power-law keys and broadcast-ineligible
skewed joins. The pattern: split a hot key into ``salt_buckets`` subkeys,
do the heavy shuffle on the salted key, then reduce the partial results.

At 100 TB a handful of celebrity keys (the node-0 sink in the reference's
own graph is exactly this: every chain tail points at it) can hold a whole
stage hostage; two-phase aggregation bounds any single task's input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Append a per-row salt in [0, buckets).

    Row-content hash alone would collapse duplicate rows (the common case
    for a hot key!) into one bucket, so the salt mixes in
    ``monotonically_increasing_id`` — unique per row, deterministic for a
    given partition layout (a retried task recomputes the same ids), and
    cheaper than rand() which is retry-unsafe."""
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(
        salt_col,
        F.pmod(F.hash(*cols, F.monotonically_increasing_id()), F.lit(buckets)),
    )


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: Column,
    alias: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase SUM-like aggregation: partial per (key, salt), final per
    key. Any single reducer task sees at most 1/buckets of a hot key."""
    salted = with_salt(df, key, buckets)
    partial = salted.groupBy(key, "_salt").agg(agg_col.alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(alias))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """Skewed big ⋈ small equi-join: salt the big side per-row, replicate
    the small side across all buckets, join on (key, salt). Use when the
    small side is too large to broadcast but the big side's key
    distribution is power-law."""
    big_s = with_salt(big, key, buckets)
    salts = big.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(salts)
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")
