"""Relational/analytics surface, batch 40 (round 12 growth): WEIGHTED
heavy hitters — the SUM-weighted generalization of the batch-39
sharded top-m sketch (relational39), the shape a 100 TB corpus
accountant actually runs: "which keys contribute the most
bytes/tokens/revenue", not "which keys appear most often".

Chassis: identical to relational39 with COUNT(*) replaced by an exact
integer weight sum (the money convention — per-row cents snap before
summation, so per-shard partial sums are order-independent BIGINTs):

- rows shard by md5(primary key) % P (row-level, so one key's weight
  scatters across shards exactly like rows land on executors);
- each shard keeps exact per-key weight sums of its own rows and
  ships its top-M keys by (weight DESC, key);
- the coordinator sums surviving partials (``est``, a deterministic
  LOWER bound on the true weight) and takes the global top-K.

Guarantees (the weighted Misra-Gries bound, PROVEN ON DATA by the
audit): est(key) ≤ W(key), and W(key) − est(key) ≤ Σ_p cap_p with
cap_p = shard p's M-th largest weight sum — a key evicted by shard p
left at most cap_p weight behind there. Any key with
W(key) > Σ_p cap_p is certain to be reported.

Key domain: part keys weighted by lineitem extended price — 20 000
keys at sf0.1 against P·M = 32·64 counters, so the sketch evicts
~97% of the domain and the audit exercises the bound, not an
identity.

Scale shape: one shuffle to (shard, key) exact weight sums with
map-side combine, a PARTITIONED window over P bounded groups, and a
coordinator-sized merge (≤ P·M rows); the fact table is never
globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.operators.relational38 import (
    _LI_HASH_SQL,
    _li_hash,
)

WHH_SHARDS = 32  # P
WHH_PER_SHARD = 64  # M
WHH_TOPK = 20  # K


def _weighted_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per lineitem: (shard, key, w) — part key, integer-cents
    weight, row-level shard by the lineitem primary-key hash."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        (_li_hash() % WHH_SHARDS).alias("shard"),
        F.col("l_partkey").alias("key"),
        cents("l_extendedprice").alias("w"),
    )


_BASE_SQL = f"""
    base AS (
      SELECT {_LI_HASH_SQL} % {WHH_SHARDS} AS shard,
             l_partkey AS key,
             {cents_sql('l_extendedprice')} AS w
      FROM lineitem)
"""


def _shard_survivors_weighted(base: DataFrame) -> DataFrame:
    """Per-shard exact weight sums, top-WHH_PER_SHARD survivors by
    (weight DESC, key): DataFrame[shard, key, ws]."""
    sc = base.groupBy("shard", "key").agg(F.sum("w").alias("ws"))
    wd = Window.partitionBy("shard").orderBy(F.col("ws").desc(), F.col("key"))
    return (
        sc.withColumn("pos", F.row_number().over(wd))
        .filter(F.col("pos") <= WHH_PER_SHARD)
        .select("shard", "key", "ws")
    )


_SURVIVORS_SQL = f"""
    sc AS (SELECT shard, key, SUM(w) AS ws FROM base GROUP BY 1, 2),
    surv AS (
      SELECT shard, key, ws FROM (
        SELECT shard, key, ws,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY ws DESC, key) AS pos
        FROM sc)
      WHERE pos <= {WHH_PER_SHARD})
"""


def q_sketch_heavy_hitters_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-WHH_TOPK part keys by estimated revenue (sharded top-M
    weight merge). Output per hitter: (key, est_cents, n_shards),
    ordered by (est_cents DESC, key) — est_cents is the sum of the
    surviving shard-exact partials, a deterministic lower bound on the
    part's true revenue; n_shards counts the shards that kept it."""
    est = (
        _shard_survivors_weighted(_weighted_base(spark, sf_dir))
        .groupBy("key")
        .agg(
            F.sum("ws").cast("long").alias("est_cents"),
            F.count(F.lit(1)).cast("long").alias("n_shards"),
        )
    )
    return est.orderBy(F.col("est_cents").desc(), "key").limit(WHH_TOPK)


_WHH_TOPK_SQL = f"""
    WITH {_BASE_SQL},
    {_SURVIVORS_SQL},
    est AS (
      SELECT key, CAST(SUM(ws) AS BIGINT) AS est_cents,
             CAST(COUNT(*) AS BIGINT) AS n_shards
      FROM surv GROUP BY key)
    SELECT key, est_cents, n_shards
    FROM est ORDER BY est_cents DESC, key LIMIT {WHH_TOPK}
"""


def q_sketch_heavy_hitters_weighted_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROOF-ON-DATA of the weighted bound against exact per-key
    revenue. Output one row: (k, n_found_of_exact_topk,
    n_underestimated, max_underestimate_cents, total_cap_cents);
    invariants: every estimate ≤ its exact weight, and
    max_underestimate_cents ≤ total_cap_cents (Σ per-shard M-th
    largest weight sums). All legs after aggregation are ≤ K or ≤ P
    rows and broadcast."""
    base = _weighted_base(spark, sf_dir)
    surv = _shard_survivors_weighted(base)
    est = surv.groupBy("key").agg(F.sum("ws").cast("long").alias("est"))
    est_topk = est.orderBy(F.col("est").desc(), "key").limit(WHH_TOPK)

    exact = base.groupBy("key").agg(F.sum("w").cast("long").alias("exact"))
    exact_topk = exact.orderBy(F.col("exact").desc(), "key").limit(WHH_TOPK)

    joined = exact_topk.join(F.broadcast(est), "key", "left").select(
        "key",
        "exact",
        F.coalesce("est", F.lit(0)).cast("long").alias("est"),
    )
    found = exact_topk.join(
        F.broadcast(est_topk.select("key")), "key"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_found_of_exact_topk"))
    under = joined.agg(
        F.sum((F.col("exact") > F.col("est")).cast("long"))
        .cast("long")
        .alias("n_underestimated"),
        F.max(F.col("exact") - F.col("est"))
        .cast("long")
        .alias("max_underestimate_cents"),
    )
    wd = Window.partitionBy("shard").orderBy(F.col("ws").desc(), F.col("key"))
    caps = (
        base.groupBy("shard", "key")
        .agg(F.sum("w").alias("ws"))
        .withColumn("pos", F.row_number().over(wd))
        .filter(F.col("pos") == WHH_PER_SHARD)
        .agg(
            F.coalesce(F.sum("ws"), F.lit(0))
            .cast("long")
            .alias("total_cap_cents")
        )
    )
    return (
        found.crossJoin(F.broadcast(under))
        .crossJoin(F.broadcast(caps))
        .select(
            F.lit(WHH_TOPK).cast("long").alias("k"),
            "n_found_of_exact_topk",
            "n_underestimated",
            "max_underestimate_cents",
            "total_cap_cents",
        )
    )


_WHH_AUDIT_SQL = f"""
    WITH {_BASE_SQL},
    {_SURVIVORS_SQL},
    est AS (SELECT key, CAST(SUM(ws) AS BIGINT) AS est
            FROM surv GROUP BY key),
    est_topk AS (SELECT key FROM est
                 ORDER BY est DESC, key LIMIT {WHH_TOPK}),
    exact AS (SELECT key, CAST(SUM(w) AS BIGINT) AS exact
              FROM base GROUP BY key),
    exact_topk AS (SELECT key, exact FROM exact
                   ORDER BY exact DESC, key LIMIT {WHH_TOPK}),
    joined AS (
      SELECT x.key, x.exact, COALESCE(e.est, 0) AS est
      FROM exact_topk x LEFT JOIN est e USING (key)),
    found AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_found_of_exact_topk
      FROM exact_topk x JOIN est_topk s USING (key)),
    under AS (
      SELECT CAST(SUM(CASE WHEN exact > est THEN 1 ELSE 0 END) AS BIGINT)
               AS n_underestimated,
             CAST(MAX(exact - est) AS BIGINT) AS max_underestimate_cents
      FROM joined),
    caps AS (
      SELECT CAST(COALESCE(SUM(ws), 0) AS BIGINT) AS total_cap_cents
      FROM (
        SELECT shard, ws,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY ws DESC, key) AS pos
        FROM sc)
      WHERE pos = {WHH_PER_SHARD})
    SELECT CAST({WHH_TOPK} AS BIGINT) AS k,
           found.n_found_of_exact_topk,
           under.n_underestimated,
           under.max_underestimate_cents,
           caps.total_cap_cents
    FROM found, under, caps
"""


QUERIES = {
    "sketch_heavy_hitters_weighted": q_sketch_heavy_hitters_weighted,
    "sketch_heavy_hitters_weighted_audit": q_sketch_heavy_hitters_weighted_audit,
}

ORACLES = {
    "sketch_heavy_hitters_weighted": _WHH_TOPK_SQL,
    "sketch_heavy_hitters_weighted_audit": _WHH_AUDIT_SQL,
}
