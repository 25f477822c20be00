"""Relational/analytics surface, batch 27 (round 8 growth, ninth
wave): pHash Hamming-distance histogram (multimodal dedup reporting),
brand-grain return rates, a per-customer value-trend census (exact
integer OLS slope signs, one regression per group, distributed), and
the session-length histogram over the native sessionization operator.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-26, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness conventions (inherited): integer grains before sums,
DECIMAL(38,0)/HUGEINT sufficient statistics, integer `div`
(truncation parity) — every query in this batch is integer-exact end
to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.multimodal.phash import (
    PHASH_PAIRS_SQL,
    q_mm_image_phash_pairs,
)
from page_rank_mapreduce_java_spark.streaming.events import session_windows
from page_rank_mapreduce_java_spark.streaming.queries import (
    ORACLES as _STREAM_ORACLES,
)


# --- pHash Hamming-distance histogram ----------------------------------------


def q_mm_phash_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of Hamming distances among the pHash candidate
    pairs — the threshold-calibration report for the image dedup stage
    (a bimodal histogram separates true near-dups from block-collision
    noise and justifies PHASH_HAM_MAX). Output per distance:
    (hamming, n_pairs).

    Exactness: pure integer counting over the certified blocked-pHash
    pair chassis (multimodal/phash.py, volume-sized pair exchange).

    Scale shape: the measured multimodal pair chassis plus ONE bounded
    aggregate (the distance domain is 0..PHASH_HAM_MAX).
    """
    pairs = q_mm_image_phash_pairs(spark, sf_dir)
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            F.col("hamming").cast("long").alias("hamming"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
        )
    )


PHASH_HIST_SQL = f"""
    SELECT CAST(hamming AS BIGINT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM ({PHASH_PAIRS_SQL}) GROUP BY hamming
"""


# --- brand-grain return rates --------------------------------------------------


def q_lineitem_return_rate_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Return rate per part brand: the share of lineitems flagged 'R',
    in ppm, with the returned revenue — the product-quality league
    table (q10 ranks customers by returned revenue; this rolls the
    same signal to the brand grain a category manager acts on).
    Output per brand: (brand, n_items, n_returned, return_ppm,
    returned_cents).

    Exactness: integer counting + exact cent sums; ppm is integer
    `div` (truncation parity).

    Scale shape: broadcast part dim onto the fact scan, one bounded
    (25-brand) aggregate with map-side partials.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey",
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
        cents("l_extendedprice").alias("v"),
    )
    p = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    return (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("ret").alias("n_returned"),
            F.sum(F.col("v") * F.col("ret")).alias("returned_cents"),
        )
        .select(
            "brand",
            F.col("n_items").cast("long").alias("n_items"),
            F.col("n_returned").cast("long").alias("n_returned"),
            F.expr(
                "CAST(1000000 * n_returned div n_items AS BIGINT)"
            ).alias("return_ppm"),
            F.col("returned_cents").cast("long").alias("returned_cents"),
        )
    )


RETURN_RATE_SQL = f"""
    SELECT p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(1000000 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS return_ppm,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN {cents_sql("l_extendedprice")}
                         ELSE 0 END) AS BIGINT) AS returned_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
"""


# --- per-customer value-trend census ---------------------------------------------

TREND_MIN_ORDERS = 3


def q_customer_value_trend_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One OLS regression per customer, distributed, reduced to a
    census: is each customer's order value trending up, down, or flat
    over their order sequence? The slope SIGN is sign(n·Σxy − Σx·Σy) —
    an exact integer, so the census needs no division at all
    (x = 0-based order index, y = exact cents; customers with <
    TREND_MIN_ORDERS orders are unscored). One row:
    (n_scored, growing, shrinking, flat, growing_ppm).

    Exactness: per-customer sufficient statistics in DECIMAL(38,0);
    the sign comparison is exact; the ppm is integer `div`.

    Scale shape: one row_number window per CUSTOMER (high-cardinality
    keyed window convention) → one customer-keyed aggregate → a 1-row
    census with map-side partials. A regression per group with zero
    data movement beyond the customer key.
    """
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        cents("o_totalprice").alias("y"),
        "o_orderdate",
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn("x", F.row_number().over(w) - 1)
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    per_c = (
        seq.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * yd).alias("sxy"),
        )
        .filter(F.col("n") >= TREND_MIN_ORDERS)
        .select(
            (
                F.col("n").cast("decimal(38,0)") * F.col("sxy")
                - F.col("sx") * F.col("sy")
            ).alias("num")
        )
    )
    return per_c.agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum(F.when(F.col("num") > 0, 1).otherwise(0))
        .cast("long")
        .alias("growing"),
        F.sum(F.when(F.col("num") < 0, 1).otherwise(0))
        .cast("long")
        .alias("shrinking"),
        F.sum(F.when(F.col("num") == 0, 1).otherwise(0))
        .cast("long")
        .alias("flat"),
    ).select(
        "n_scored",
        "growing",
        "shrinking",
        "flat",
        F.expr("CAST(1000000 * growing div n_scored AS BIGINT)").alias(
            "growing_ppm"
        ),
    )


TREND_CENSUS_SQL = f"""
    WITH seq AS (
      SELECT o_custkey, {cents_sql("o_totalprice")} AS y,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) - 1 AS x
      FROM orders),
    per_c AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * y)
               - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) AS num
      FROM seq GROUP BY 1
      HAVING COUNT(*) >= {TREND_MIN_ORDERS})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN num > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS growing,
           CAST(SUM(CASE WHEN num < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS shrinking,
           CAST(SUM(CASE WHEN num = 0 THEN 1 ELSE 0 END) AS BIGINT) AS flat,
           CAST(1000000 * SUM(CASE WHEN num > 0 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS growing_ppm
    FROM per_c
"""


# --- session-length histogram ------------------------------------------------------


def q_events_session_length_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution of session lengths (events per session) from the
    native gap-based sessionization operator — the engagement-depth
    histogram behind bounce-rate and depth targets. Output per length:
    (n_events, n_sessions).

    Exactness: pure integer counting over the certified session_window
    assignment (streaming/events.py — same code path batch and
    stream).

    Scale shape: the certified sessionization aggregate (user-keyed
    session_window state) plus one bounded-domain rollup (session
    length is bounded by per-user activity, and the histogram key is
    the length, not the session).
    """
    sess = session_windows(load_table(spark, "events", sf_dir))
    return (
        sess.groupBy("n_events")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .select(
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_sessions").cast("long").alias("n_sessions"),
        )
    )


SESSION_HIST_SQL = f"""
    SELECT CAST(n_events AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM ({_STREAM_ORACLES["events_session_windows"]})
    GROUP BY n_events
"""


QUERIES = {
    "mm_phash_hamming_histogram": q_mm_phash_hamming_histogram,
    "lineitem_return_rate_by_brand": q_lineitem_return_rate_by_brand,
    "customer_value_trend_census": q_customer_value_trend_census,
    "events_session_length_histogram": q_events_session_length_histogram,
}

ORACLES = {
    "mm_phash_hamming_histogram": PHASH_HIST_SQL,
    "lineitem_return_rate_by_brand": RETURN_RATE_SQL,
    "customer_value_trend_census": TREND_CENSUS_SQL,
    "events_session_length_histogram": SESSION_HIST_SQL,
}
