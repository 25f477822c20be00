"""Relational/analytics surface, batch 33 (round 8 growth, fifteenth
wave): the basket-size histogram (the profiling fundamental behind
every Σ basket² pair-volume bound in the engine) and repeat-customer
rate by market segment.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-32, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness: pure integer counting; ppm via integer `div` (truncation
parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table


# --- basket-size histogram ------------------------------------------------------


def q_orders_basket_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution of basket sizes (lineitems per order) — the
    profiling fundamental that SIZES every Σ basket² pair bound in the
    engine (recommend.py, basket pairs, the pairsize chassis): the
    histogram IS the distribution those bounds integrate. Output per
    size: (basket_size, n_orders, share_ppm, pair_contribution).

    pair_contribution = n_orders·size·(size−1)/2 — each bucket's share
    of the candidate-pair volume a same-basket self-join emits, making
    the scale impact of the tail directly readable.

    Exactness: pure integer counting; ppm via integer `div`.

    Scale shape: one order-keyed count (map-side combinable on the
    high-cardinality key) → the bounded size domain; no joins, no
    windows.
    """
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey")
    sizes = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("basket_size")
    )
    hist = sizes.groupBy("basket_size").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    tot = hist.agg(F.sum("n_orders").alias("_t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("basket_size").cast("long").alias("basket_size"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.expr("CAST(1000000 * n_orders div _t AS BIGINT)").alias(
            "share_ppm"
        ),
        F.expr(
            "CAST(n_orders * basket_size * (basket_size - 1) div 2"
            " AS BIGINT)"
        ).alias("pair_contribution"),
    )


BASKET_HIST_SQL = """
    WITH sizes AS (
      SELECT l_orderkey, COUNT(*) AS basket_size
      FROM lineitem GROUP BY 1),
    hist AS (
      SELECT basket_size, COUNT(*) AS n_orders FROM sizes GROUP BY 1),
    t AS (SELECT SUM(n_orders) AS tn FROM hist)
    SELECT CAST(basket_size AS BIGINT) AS basket_size,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(1000000 * n_orders // tn AS BIGINT) AS share_ppm,
           CAST(n_orders * basket_size * (basket_size - 1) // 2 AS BIGINT)
             AS pair_contribution
    FROM hist, t
"""


# --- repeat-customer rate by market segment --------------------------------------


def q_customer_repeat_rate_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-customer rate per market segment: the share of a
    segment's ordering customers who came back (≥ 2 orders) — the
    retention headline a segment strategy is judged by (agg_segment_stats
    profiles value; this profiles LOYALTY). Output per segment:
    (segment, n_customers, n_repeat, repeat_ppm).

    Exactness: pure integer counting; ppm via integer `div`.

    Scale shape: one customer-keyed order count (high-cardinality key,
    map-side combinable) → broadcast customer dim for the segment →
    one bounded (5-segment) rollup.
    """
    o = load_table(spark, "orders", sf_dir).select("o_custkey")
    per_c = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("k"))
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        per_c.join(F.broadcast(c), "o_custkey")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum((F.col("k") >= 2).cast("int")).alias("n_repeat"),
        )
        .select(
            "segment",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("n_repeat").cast("long").alias("n_repeat"),
            F.expr(
                "CAST(1000000 * n_repeat div n_customers AS BIGINT)"
            ).alias("repeat_ppm"),
        )
    )


REPEAT_RATE_SQL = """
    WITH per_c AS (
      SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY 1),
    j AS (
      SELECT c.c_mktsegment AS segment, per_c.k
      FROM per_c JOIN customer c ON per_c.o_custkey = c.c_custkey)
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST(1000000 * SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS repeat_ppm
    FROM j GROUP BY 1
"""


QUERIES = {
    "orders_basket_size_histogram": q_orders_basket_size_histogram,
    "customer_repeat_rate_by_segment": q_customer_repeat_rate_by_segment,
}

ORACLES = {
    "orders_basket_size_histogram": BASKET_HIST_SQL,
    "customer_repeat_rate_by_segment": REPEAT_RATE_SQL,
}
