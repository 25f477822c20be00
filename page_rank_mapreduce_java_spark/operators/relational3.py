"""Relational operator surface, batch 3: as-of join, full-outer join,
exact percentiles, positional explode, date-spine gap fill, and the
salted skew aggregation routed through the oracle gate.

These extend beyond the reference's own surface (SURVEY.md SS2.4 notes
range/as-of joins are absent there) with the time-series and skew
operators a large-scale pipeline needs. Determinism conventions follow
relational.py: exact integer cents for money, explicit tie-breaks on
every ordering the result depends on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql as _c
from page_rank_mapreduce_java_spark.operators.asof import asof_join
from page_rank_mapreduce_java_spark.plans.skew import salted_aggregate


def q_join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each event matched to the user's latest order at or
    before the event time (inner — events with no prior order drop).

    Spark has no ASOF JOIN operator; the scalable realization is the
    union-sort trick: tag both sides, shuffle once on the key, sort
    within partitions by (ts, side), and carry the last order forward
    with a running ``last(..., ignorenulls)`` window. One exchange +
    one sort — the same cost envelope as a sort-merge join, with no
    per-row range probe. Ties on (custkey, orderdate) are collapsed to
    max(o_orderkey) first so both engines pick the same order.
    """
    e = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id")
    o = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ts"))
        .agg(F.max("o_orderkey").alias("asof_orderkey"))
    )
    joined = asof_join(
        e, o, on="user_id", ts="ts", payload=["asof_orderkey"], tiebreak=["event_id"]
    )
    return joined.select("event_id", "user_id", "asof_orderkey")


def q_join_full_outer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier counts —
    the one outer-join shape batch 1 didn't cover. Both inputs are
    pre-aggregated (partial maps before the join's exchange), so the
    joined sides are nation-cardinality small at any scale."""
    c = (
        load_table(spark, "customer", sf_dir)
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, "supplier", sf_dir)
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c["ck"] == s["sk"], "full_outer")
        .select(
            F.coalesce("ck", "sk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


def q_agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (p25/p50/p75) of price in
    cents per return flag. ``F.percentile`` and DuckDB ``quantile_cont``
    share the PERCENTILE_CONT interpolation rule; inputs are exact
    integers so only the final interpolation is floating-point."""
    l = load_table(spark, "lineitem", sf_dir)
    pct = F.percentile(_cents("l_extendedprice"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    g = l.groupBy("l_returnflag").agg(pct.alias("p"))
    return g.select(
        "l_returnflag",
        F.round(F.element_at("p", 1), 2).alias("p25"),
        F.round(F.element_at("p", 2), 2).alias("p50"),
        F.round(F.element_at("p", 3), 2).alias("p75"),
    )


def q_explode_with_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UNNEST WITH ORDINALITY): first 8 whitespace
    tokens of each document with their 1-based position. posexplode keeps
    the ordinal JVM-side; the slice bounds the fan-out per row."""
    d = load_table(spark, "documents", sf_dir)
    words = F.slice(F.split("text", " "), 1, 8)
    return d.select(
        "doc_id", F.posexplode(words).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("ord"), "word")


def q_events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap fill: daily event counts per type over the full
    observed date range, zero-filled where a (day, type) bucket is empty
    — the hypertable rollup shape. The spine is generated from a 1-row
    aggregate (``F.sequence`` over min..max), cross-joined with the
    distinct type dimension — both broadcast-sized at any event volume —
    so the only data-sized operation is the daily pre-aggregation."""
    e = load_table(spark, "events", sf_dir)
    daily = e.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    spine = (
        e.agg(F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    types = e.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(daily, ["d", "event_type"], "left")
        .select("d", "event_type", F.coalesce("n_events", F.lit(0)).alias("n_events"))
    )


def q_agg_date_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy ROLLUP (year → month → grand total) over order
    revenue — the calendar-rollup shape of a hypertable. One shuffle;
    Expand feeds partial aggregates so each grouping level combines
    map-side."""
    o = load_table(spark, "orders", sf_dir)
    rolled = o.rollup(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        F.sum(_cents("o_totalprice")).alias("total_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # Sentinel -1 for rolled-up grouping levels: a NULL in an integer
    # output column flips the whole column to float64 under the driver's
    # pandas fetch, corrupting every value's rendering (agg_rollup passed
    # r1 with the same sentinel policy; this query failed r2 without it).
    return rolled.select(
        F.coalesce("yr", F.lit(-1)).alias("yr"),
        F.coalesce("mo", F.lit(-1)).alias("mo"),
        "total_cents",
        "n_orders",
    )


def q_events_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h window, 1h slide) in BATCH, via the SAME
    ``streaming.sliding_counts`` the stream path uses — the function is
    mode-agnostic, so this query pins batch/stream parity through the
    oracle gate. Each event lands in window/slide = 2 buckets; the
    oracle enumerates the same epoch-aligned window starts explicitly."""
    from page_rank_mapreduce_java_spark.streaming.events import sliding_counts

    e = load_table(spark, "events", sf_dir)
    return sliding_counts(e, window="2 hours", slide="1 hour")


def q_agg_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """plans/skew.salted_aggregate routed through the oracle gate: the
    two-phase (key, salt) -> key sum must equal the plain GROUP BY SUM.
    event_id is the stable salt key (retry-deterministic)."""
    e = load_table(spark, "events", sf_dir)
    return salted_aggregate(
        e,
        "event_type",
        F.sum(_cents("value")),
        "value_cents",
        buckets=16,
        salt_on="event_id",
    )


QUERIES = {
    "join_asof_latest_order": q_join_asof_latest_order,
    "join_full_outer_nation": q_join_full_outer_nation,
    "agg_percentiles_exact": q_agg_percentiles_exact,
    "agg_date_rollup": q_agg_date_rollup,
    "explode_with_position": q_explode_with_position,
    "events_daily_gapfill": q_events_daily_gapfill,
    "events_sliding_2h": q_events_sliding_2h,
    "agg_salted_sum": q_agg_salted_sum,
}

ORACLES = {
    "join_asof_latest_order": """
        WITH o AS (
          SELECT o_custkey AS k, o_orderdate AS ts, MAX(o_orderkey) AS o_orderkey
          FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
        FROM events e ASOF JOIN o ON e.user_id = o.k AND e.ts >= o.ts
    """,
    "join_full_outer_nation": """
        WITH c AS (SELECT c_nationkey AS ck, COUNT(*) AS n_cust
                   FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS sk, COUNT(*) AS n_supp
                   FROM supplier GROUP BY 1)
        SELECT COALESCE(ck, sk) AS nationkey,
               COALESCE(n_cust, 0) AS n_cust,
               COALESCE(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON ck = sk
    """,
    "agg_percentiles_exact": f"""
        SELECT l_returnflag,
               ROUND(quantile_cont({_c('l_extendedprice')}, 0.25), 2) AS p25,
               ROUND(quantile_cont({_c('l_extendedprice')}, 0.50), 2) AS p50,
               ROUND(quantile_cont({_c('l_extendedprice')}, 0.75), 2) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    "explode_with_position": """
        SELECT doc_id, ord, word FROM (
          SELECT doc_id,
                 unnest(list_slice(string_split(text, ' '), 1, 8)) AS word,
                 unnest(range(1, len(list_slice(string_split(text, ' '), 1, 8)) + 1)) AS ord
          FROM documents
        )
    """,
    "events_daily_gapfill": """
        WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
                   FROM events),
             spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
                       FROM b),
             t AS (SELECT DISTINCT event_type FROM events),
             daily AS (SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
                       FROM events GROUP BY 1, 2)
        SELECT spine.d, t.event_type, COALESCE(daily.n, 0) AS n_events
        FROM spine CROSS JOIN t
        LEFT JOIN daily ON daily.d = spine.d AND daily.event_type = t.event_type
    """,
    # COALESCE sentinels + CAST(SUM AS BIGINT): NULL grouping keys and
    # HUGEINT sums both break the driver's pandas-fetch rendering
    # (tools/canon_audit.py).
    "agg_date_rollup": f"""
        SELECT COALESCE(yr, -1) AS yr, COALESCE(mo, -1) AS mo,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               COUNT(*) AS n_orders
        FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                     CAST(month(o_orderdate) AS BIGINT) AS mo,
                     {_c('o_totalprice')} AS cents
              FROM orders)
        GROUP BY ROLLUP (yr, mo)
    """,
    "events_sliding_2h": """
        WITH x AS (
          SELECT strftime(date_trunc('hour', ts) - o * INTERVAL 1 HOUR,
                          '%Y-%m-%d %H:%M:%S') AS window_start,
                 event_type
          FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o) t
        )
        SELECT window_start, event_type, COUNT(*) AS n
        FROM x GROUP BY 1, 2
    """,
    "agg_salted_sum": f"""
        SELECT event_type, CAST(SUM({_c('value')}) AS BIGINT) AS value_cents
        FROM events GROUP BY event_type
    """,
}
