"""Relational/analytics surface, batch 38 (round 11 growth): the
MERGEABLE QUANTILE SKETCH family — the rank-query analogue of the KMV
distinct sketches (relational11-13), closing the VERDICT-r10 gap
("a mergeable quantile sketch — KLL/t-digest analogue to the KMV
family").

Chassis: the bottom-k-by-uniform-hash sample. Hashing each row's key
through the portable md5 family (functions/hashes contract) and keeping
the k smallest hash values yields a uniform random sample of fixed size
whose selection is DETERMINISTIC given the data — so, unlike KLL's
coin-flip compactions or t-digest's order-dependent centroid merges,
the identical sketch is reproducible in any engine and the DuckDB
oracle can value-hash it. The sketch is mergeable in the exact sense
that makes it distributed-friendly: bottom-k(A ∪ B) =
bottom-k(bottom-k(A) ∪ bottom-k(B)) — each partition/group ships only
its k candidates and the coordinator re-takes the k smallest
(sketch_quantile_merge_audit PROVES this on the data rather than
assuming it). Quantiles read off the sorted sample at integer rank
positions ((q·(n−1)) div 100), exact in both engines.

Sampling error is the standard bottom-k bound (±O(1/√k) in rank), the
same guarantee class as KMV's cardinality error — documented, not
hidden: these are SKETCH quantiles next to the exact family
(agg_percentiles_exact, agg_median).

Exactness: integer cents values, md5-bit-identical hash order, ties on
the 60-bit hash broken by the value itself so boundary selection can
never diverge between engines, and integer rank arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.hashes import md5_long, md5_long_sql
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql

SKETCH_K = 1024  # global sketch size (rank error ~ n/sqrt(k) ≈ 3% of n)
MERGE_K = 256  # per-group sketch size for the merge audit
MONTH_K = 128  # per-month sketch size

# Quantile positions are integer ranks over the sorted sample:
# pos(q) = (q·(n−1)) div 100, 0-indexed (+1 for 1-based array access) —
# the same formula rendered into both engines.
_QUANTS = (25, 50, 75, 90, 99)


def _li_hash():
    """60-bit uniform hash of the lineitem primary key."""
    return md5_long(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        )
    )


_LI_HASH_SQL = md5_long_sql(
    "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
)


# --- sketch_quantile_bottomk -----------------------------------------------------


def q_sketch_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quantile sketch of lineitem extended price: keep the
    SKETCH_K rows with the smallest key hashes (a fixed-size uniform
    sample), read p25/p50/p75/p90/p99 off the sorted sample. Output one
    row: (k, n_sample, p25_cents, p50_cents, p75_cents, p90_cents,
    p99_cents).

    Scale shape: ORDER BY hash LIMIT k compiles to
    TakeOrderedAndProject — a per-partition k-element heap + one
    driver-side merge of p·k candidates, no global sort, no shuffle of
    the fact table (the same plan family as the two-pass ranking
    chassis but cheaper: k is a constant). Everything after the limit
    is a 1-row aggregate over k rows.
    """
    li = load_table(spark, "lineitem", sf_dir)
    samp = (
        li.select(
            cents("l_extendedprice").alias("v"), _li_hash().alias("hv")
        )
        .orderBy("hv", "v")
        .limit(SKETCH_K)
    )
    agg = samp.agg(
        F.sort_array(F.collect_list("v")).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    )
    cols = [
        F.lit(SKETCH_K).cast("long").alias("k"),
        F.col("n").cast("long").alias("n_sample"),
    ]
    for q in _QUANTS:
        cols.append(
            F.expr(
                f"CAST(element_at(arr, CAST(({q} * (n - 1)) div 100 AS INT)"
                " + 1) AS BIGINT)"
            ).alias(f"p{q}_cents")
        )
    return agg.select(*cols)


def _sketch_quantile_bottomk_sql() -> str:
    v = cents_sql("l_extendedprice")
    quants = ",\n           ".join(
        f"CAST(arr[CAST(({q} * (n - 1)) // 100 AS INTEGER) + 1] AS BIGINT)"
        f" AS p{q}_cents"
        for q in _QUANTS
    )
    return f"""
    WITH samp AS (
      SELECT {v} AS v, {_LI_HASH_SQL} AS hv
      FROM lineitem ORDER BY hv, v LIMIT {SKETCH_K}),
    agg AS (
      SELECT list_sort(list(v)) AS arr, COUNT(*) AS n FROM samp)
    SELECT CAST({SKETCH_K} AS BIGINT) AS k,
           CAST(n AS BIGINT) AS n_sample,
           {quants}
    FROM agg
"""


# --- sketch_quantile_merge_audit -------------------------------------------------


def q_sketch_quantile_merge_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROOF-ON-DATA of the sketch's mergeability: build one bottom-k
    sketch PER SUPPLIER NATION (the distributed leg — each group keeps
    only its MERGE_K smallest hashes), merge them by re-taking the
    MERGE_K smallest of the union (the coordinator leg), and compare
    against the sketch built directly from the raw rows. The two must
    be IDENTICAL MULTISETS of (hash, value) — bottom-k(∪ groups) =
    bottom-k(∪ bottom-k(group)) — so n_overlap = k and the medians
    agree. n_overlap is the exact multiset-intersection size
    Σ least(count_merged, count_direct) over (hv, v) groups (the
    synthetic lineitem carries duplicate primary keys, so hash ties
    are real and a bare join on hv would fan out — the r11 382>256
    lesson). Output one row: (k, n_merged, n_direct, n_overlap,
    p50_merged_cents, p50_direct_cents).

    Scale shape: the grouped leg is one shuffle on nation + a
    partitioned window row_number (25 groups, never single-task); the
    union being merged is ≤ 25·k rows, coordinator-sized. The direct
    leg is a second TakeOrderedAndProject scan — deliberately
    independent of the grouped leg, otherwise the audit would compare
    a relation with itself.
    """
    from pyspark.sql import Window

    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nation"),
    )
    base = li.select(
        "l_suppkey",
        cents("l_extendedprice").alias("v"),
        _li_hash().alias("hv"),
    ).join(F.broadcast(sup), "l_suppkey")
    w = Window.partitionBy("nation").orderBy("hv", "v")
    grouped = (
        base.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= MERGE_K)
        .select("v", "hv")
    )
    merged = grouped.orderBy("hv", "v").limit(MERGE_K)
    direct = (
        li.select(
            cents("l_extendedprice").alias("v"), _li_hash().alias("hv")
        )
        .orderBy("hv", "v")
        .limit(MERGE_K)
    )

    def sketch_stats(df: DataFrame, prefix: str) -> DataFrame:
        a = df.agg(
            F.sort_array(F.collect_list("v")).alias("arr"),
            F.count(F.lit(1)).alias("n"),
        )
        return a.select(
            F.col("n").cast("long").alias(f"n_{prefix}"),
            F.expr(
                "CAST(element_at(arr, CAST((50 * (n - 1)) div 100 AS INT)"
                " + 1) AS BIGINT)"
            ).alias(f"p50_{prefix}_cents"),
        )

    mg = merged.groupBy("hv", "v").agg(F.count(F.lit(1)).alias("cm"))
    dg = direct.groupBy("hv", "v").agg(F.count(F.lit(1)).alias("cd"))
    overlap = mg.join(dg, ["hv", "v"]).agg(
        F.coalesce(F.sum(F.least("cm", "cd")), F.lit(0))
        .cast("long")
        .alias("n_overlap")
    )
    return (
        sketch_stats(merged, "merged")
        .crossJoin(F.broadcast(sketch_stats(direct, "direct")))
        .crossJoin(F.broadcast(overlap))
        .select(
            F.lit(MERGE_K).cast("long").alias("k"),
            "n_merged",
            "n_direct",
            "n_overlap",
            "p50_merged_cents",
            "p50_direct_cents",
        )
    )


def _sketch_quantile_merge_audit_sql() -> str:
    v = cents_sql("l_extendedprice")
    return f"""
    WITH base AS (
      SELECT s_nationkey AS nation, {v} AS v, {_LI_HASH_SQL} AS hv
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
    grouped AS (
      SELECT v, hv FROM (
        SELECT v, hv,
               row_number() OVER (PARTITION BY nation ORDER BY hv, v)
                 AS pos
        FROM base)
      WHERE pos <= {MERGE_K}),
    merged AS (SELECT v, hv FROM grouped ORDER BY hv, v LIMIT {MERGE_K}),
    direct AS (
      SELECT {v} AS v, {_LI_HASH_SQL} AS hv
      FROM lineitem ORDER BY hv, v LIMIT {MERGE_K}),
    m AS (SELECT list_sort(list(v)) AS arr, COUNT(*) AS n FROM merged),
    d AS (SELECT list_sort(list(v)) AS arr, COUNT(*) AS n FROM direct),
    mg AS (SELECT hv, v, COUNT(*) AS cm FROM merged GROUP BY 1, 2),
    dg AS (SELECT hv, v, COUNT(*) AS cd FROM direct GROUP BY 1, 2),
    ov AS (SELECT COALESCE(SUM(LEAST(cm, cd)), 0) AS n_overlap
           FROM mg JOIN dg USING (hv, v))
    SELECT CAST({MERGE_K} AS BIGINT) AS k,
           CAST(m.n AS BIGINT) AS n_merged,
           CAST(d.n AS BIGINT) AS n_direct,
           CAST(ov.n_overlap AS BIGINT) AS n_overlap,
           CAST(m.arr[CAST((50 * (m.n - 1)) // 100 AS INTEGER) + 1]
                AS BIGINT) AS p50_merged_cents,
           CAST(d.arr[CAST((50 * (d.n - 1)) // 100 AS INTEGER) + 1]
                AS BIGINT) AS p50_direct_cents
    FROM m, d, ov
"""


# --- sketch_quantile_by_month ----------------------------------------------------


def q_sketch_quantile_by_month(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The GROUPED form of the quantile sketch: per order month, a
    MONTH_K bottom-k sample of order totals with p50/p90 read off each
    group's sorted sample — the shape a 100 TB pipeline actually runs
    (one sketch per time bucket, merged across executors exactly as
    sketch_quantile_merge_audit proves is lossless). Output per month:
    (month, n_sample, p50_cents, p90_cents), ordered by month.

    Scale shape: one shuffle on month + a PARTITIONED window
    row_number (bounded groups), then a per-group aggregate over ≤ k
    rows; no global sort of the fact table — the final ORDER BY month
    sorts only month-count rows.
    """
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir)
    base = o.select(
        F.expr(
            "substring(CAST(CAST(o_orderdate AS DATE) AS STRING), 1, 7)"
        ).alias("month"),
        cents("o_totalprice").alias("v"),
        md5_long(F.col("o_orderkey").cast("string")).alias("hv"),
    )
    w = Window.partitionBy("month").orderBy("hv", "v")
    kept = base.withColumn("pos", F.row_number().over(w)).filter(
        F.col("pos") <= MONTH_K
    )
    agg = kept.groupBy("month").agg(
        F.sort_array(F.collect_list("v")).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "month",
        F.col("n").cast("long").alias("n_sample"),
        F.expr(
            "CAST(element_at(arr, CAST((50 * (n - 1)) div 100 AS INT) + 1)"
            " AS BIGINT)"
        ).alias("p50_cents"),
        F.expr(
            "CAST(element_at(arr, CAST((90 * (n - 1)) div 100 AS INT) + 1)"
            " AS BIGINT)"
        ).alias("p90_cents"),
    ).orderBy("month")


def _sketch_quantile_by_month_sql() -> str:
    v = cents_sql("o_totalprice")
    h = md5_long_sql("CAST(o_orderkey AS VARCHAR)")
    return f"""
    WITH base AS (
      SELECT substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
               AS month,
             {v} AS v, {h} AS hv
      FROM orders),
    kept AS (
      SELECT month, v FROM (
        SELECT month, v,
               row_number() OVER (PARTITION BY month ORDER BY hv, v)
                 AS pos
        FROM base)
      WHERE pos <= {MONTH_K}),
    agg AS (
      SELECT month, list_sort(list(v)) AS arr, COUNT(*) AS n
      FROM kept GROUP BY month)
    SELECT month,
           CAST(n AS BIGINT) AS n_sample,
           CAST(arr[CAST((50 * (n - 1)) // 100 AS INTEGER) + 1] AS BIGINT)
             AS p50_cents,
           CAST(arr[CAST((90 * (n - 1)) // 100 AS INTEGER) + 1] AS BIGINT)
             AS p90_cents
    FROM agg ORDER BY month
"""


QUERIES = {
    "sketch_quantile_bottomk": q_sketch_quantile_bottomk,
    "sketch_quantile_merge_audit": q_sketch_quantile_merge_audit,
    "sketch_quantile_by_month": q_sketch_quantile_by_month,
}

ORACLES = {
    "sketch_quantile_bottomk": _sketch_quantile_bottomk_sql(),
    "sketch_quantile_merge_audit": _sketch_quantile_merge_audit_sql(),
    "sketch_quantile_by_month": _sketch_quantile_by_month_sql(),
}
