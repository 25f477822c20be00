"""Relational operator surface, batch 7 (round 4): the bloom-join
pattern — a broadcast BUCKET-BITMAP prefilter in front of a shuffle semi
join.

Spark broadcasts a small dimension side automatically, but at 100 TB the
interesting regime is a dimension side whose KEY SET is itself too large
to broadcast (hundreds of millions of customer keys = multiple GB of
broadcast), while the probe side is orders of magnitude larger still.
The classic fix is a Bloom filter on the dimension keys, broadcast to
the probe scan so non-matching probe rows never enter the shuffle —
Spark's own AQE runtime filter (spark.sql.optimizer.runtime.bloomFilter.
enabled, conf/) does exactly this when statistics allow. This module
makes the pattern an explicit, statistics-independent operator: hash
each dimension key into one of ``n_buckets`` buckets (a 2^16-bucket set
is ≤ 512 KiB broadcast no matter how many keys exist), broadcast-join
the probe on its bucket (dropping every row whose bucket holds no
dimension key — the Bloom 'definitely not present' answer), then run
the exact semi join on the survivors. False positives (bucket
collisions) only cost shuffle volume; the final semi join makes the
result EXACT, which is precisely what the oracle certifies with a plain
IN-subquery.

Reference parity: the reference engine has no semi-join reduction at all
(its two jobs join on pre-partitioned keys, pageRank_v2.java:25-47);
this is part of the beyond-reference join family (VERDICT §2.4 J-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table

BITMAP_BUCKETS = 1 << 16


def _bucket(col: Column, n_buckets: int) -> Column:
    # Internal-only hash: the prefilter never changes the result, so the
    # fast JVM xxhash64 is fine here (no oracle mirroring needed —
    # contrast functions/hashes.md5_long, which exists for cross-engine
    # sketch parity).
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def bitmap_prefiltered_semi_join(
    probe: DataFrame,
    dim: DataFrame,
    probe_key: str,
    dim_key: str,
    n_buckets: int = BITMAP_BUCKETS,
) -> DataFrame:
    """EXACT ``probe ⋉ dim`` (left semi) with a broadcast bucket-bitmap
    prefilter: probe rows whose key-bucket contains no dimension key are
    dropped BEFORE the semi join's shuffle. Result is identical to
    ``probe.join(dim, probe[probe_key] == dim[dim_key], 'left_semi')``;
    the bitmap is an execution detail (cf. plans/skew.salted_join_hot_keys
    — same contract: optimized plan, unchanged relation)."""
    buckets = (
        dim.select(_bucket(F.col(dim_key), n_buckets).alias("_bkt"))
        .distinct()
    )
    prefiltered = probe.withColumn(
        "_bkt", _bucket(F.col(probe_key), n_buckets)
    ).join(F.broadcast(buckets), "_bkt").drop("_bkt")
    return prefiltered.join(
        dim, prefiltered[probe_key] == dim[dim_key], "left_semi"
    )


SEMI_SEGMENT = "AUTOMOBILE"


def q_join_bitmap_semi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed by customers in one market segment, as a
    bitmap-prefiltered semi join (probe = orders, dim = filtered
    customers). The oracle is the plain IN-subquery — certifying that
    the prefilter is invisible in the result."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == SEMI_SEGMENT
    )
    return bitmap_prefiltered_semi_join(
        orders, cust, probe_key="o_custkey", dim_key="c_custkey"
    ).select("o_orderkey", "o_custkey")


BITMAP_SEMI_SQL = f"""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = '{SEMI_SEGMENT}'
    )
"""


QUERIES = {
    "join_bitmap_semi_orders": q_join_bitmap_semi_orders,
}

ORACLES = {
    "join_bitmap_semi_orders": BITMAP_SEMI_SQL,
}
