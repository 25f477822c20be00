"""Relational operator surface, batch 4: the classic multi-join analytic
suite (TPC-H q3/q5/q10/q18 shapes adapted to the fixture schema) plus
deterministic sampling operators.

The reference has no general join operator at all (SURVEY.md §2.4 — its
one "join" is the adjacency-circulation trick of pageRank_v2.java:39);
these queries exercise the join shapes a user of a real engine runs
daily: selective fact-fact joins with date predicates, a 6-table snowflake
with a cycle-closing equality, group-filter (HAVING) over a fact
pre-aggregate, and top-k by computed revenue.

Determinism conventions follow relational.py: money in exact integer
cents (functions.money), discount/tax arithmetic kept in integer
cent-percent units so sums are order-independent, and every LIMIT is
fully tie-broken.

Scale notes (100 TB design point):
- Date/segment predicates sit directly on the scan so Catalyst pushes
  them into the parquet reader (PushedFilters) before any join.
- Dimension sides (region, nation, and the filtered customer at q3/q10
  scale) broadcast; fact-fact joins (orders⋈lineitem) shuffle on the
  join key once and AQE coalesces post-shuffle partitions.
- q18's HAVING runs as a partial-aggregate-then-filter on lineitem
  BEFORE the join back to orders/customer, so only qualifying orderkeys
  (a tiny set) reach the join — the same semi-join shape DuckDB plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql as _c


def _revenue_cp(price_col: str = "l_extendedprice", disc_col: str = "l_discount") -> F.Column:
    """Exact integer revenue in cent-percent units:
    cents(price) × (100 − cents(discount)). Division by 10000.0 back to
    currency happens only after the SUM, so aggregation is exact."""
    return _cents(price_col) * (F.lit(100) - _cents(disc_col))


_REV_SQL = f"{_c('l_extendedprice')} * (100 - {_c('l_discount')})"


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3 shape: top-10 unshipped orders by revenue for one market
    segment. customer filters ~1/5 and broadcasts; orders⋈lineitem is the
    one big shuffle. Tie-break (revenue, o_orderdate, l_orderkey) makes
    the LIMIT deterministic in both engines."""
    cutoff = "1998-07-01"
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg((F.sum(_revenue_cp()) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 shape: revenue per nation from orders where the customer
    and the line's supplier share a nation, one order year. The snowflake
    dims (supplier-as-dim, nation, region) broadcast; the cycle-closing
    predicate c_nationkey = s_nationkey is applied as a post-join filter
    — exactly how Catalyst plans the classic query."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_revenue_cp()) / 10000.0).alias("revenue"))
    )


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: top-20 customers by revenue lost to returns in
    one order year. lineitem's returnflag predicate pushes to the scan;
    the orders date filter shrinks the fact-fact join's probe side."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg((F.sum(_revenue_cp()) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose total line quantity exceeds 300,
    with customer attribution. The HAVING pre-aggregate runs on lineitem
    alone (partial map-side combine), so only the tiny qualifying-order
    set joins back — a build side small enough to broadcast at any SF."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _cents("o_totalprice").alias("totalprice_cents"),
            "total_qty",
        )
    )


def q_sample_mod_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample: ``event_id % 20 = 0``. Unlike
    TABLESAMPLE/rand(), a key-mod sample is reproducible across engines,
    retries, and partitionings — the property a training-data pipeline
    needs for holdout splits. Pure narrow op: predicate pushes to the
    scan, no shuffle at any scale."""
    e = load_table(spark, "events", sf_dir)
    return e.filter(F.col("event_id") % 20 == 0).select(
        "event_id", "user_id", "event_type", _cents("value").alias("value_cents")
    )


def q_sample_stratified_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the 50 lowest-keyed orders per
    order priority (row_number over a unique key — reproducible, unlike
    sampleBy's Bernoulli draw). One shuffle on the stratum key; at scale
    the per-stratum sort is bounded by rank pruning (WindowGroupLimit
    pushes k=50 into the sort)."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("o_orderpriority", "rn", "o_orderkey", "o_custkey")
    )


def q_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming module's stream-stream join run in BATCH through the
    oracle gate — ``click_attribution`` is mode-agnostic, so this pins
    the exact join semantics the watermarked streaming path executes."""
    from page_rank_mapreduce_java_spark.streaming.events import click_attribution

    e = load_table(spark, "events", sf_dir)
    return click_attribution(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )


def q_events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars over the event value stream — the canonical
    financial/hypertable downsample. Open/close are first/last by
    (ts, event_id) (the id tie-break makes same-timestamp bars
    deterministic); high/low/volume are plain aggregates. One shuffle on
    the hour bucket; the two row_number windows share its partitioning
    so no extra exchange is planned."""
    e = load_table(spark, "events", sf_dir).select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        _cents("value").alias("v"),
        "ts",
        "event_id",
    )
    w_asc = Window.partitionBy("hour").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("hour").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rna", F.row_number().over(w_asc))
        .withColumn("rnd", F.row_number().over(w_desc))
        .groupBy("hour")
        .agg(
            F.max(F.when(F.col("rna") == 1, F.col("v"))).alias("open_cents"),
            F.max("v").alias("high_cents"),
            F.min("v").alias("low_cents"),
            F.max(F.when(F.col("rnd") == 1, F.col("v"))).alias("close_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values (50-currency-unit buckets)
    per event type — the profiling aggregate behind every data-quality
    dashboard. Bucketing is integer arithmetic on exact cents (identical
    in any engine, no float-edge ambiguity); one shuffle, partial
    aggregation map-side."""
    e = load_table(spark, "events", sf_dir)
    bucket = F.floor(_cents("value") / F.lit(5000)).cast("long")
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(_cents("value")).alias("lo_cents"),
            F.max(_cents("value")).alias("hi_cents"),
        )
    )


def q_text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 word bigrams — the n-gram frequency scan of a
    corpus-statistics pipeline. Bigrams are built JVM-side by zipping the
    word array with itself shifted (transform over indices), exploded,
    and counted; the LIMIT is fully tie-broken. Narrow until the single
    count shuffle; TakeOrderedAndProject caps the sort at k."""
    d = load_table(spark, "documents", sf_dir)
    w = F.split(F.col("text"), " ")
    # Guard: F.sequence(1, 0) DESCENDS, so single-word docs would emit
    # bogus indices — give them an empty bigram list instead.
    idx = F.when(F.size(w) >= 2, F.sequence(F.lit(1), F.size(w) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


QUERIES = {
    "q3_shipping_priority": q_q3_shipping_priority,
    "stream_click_attribution": q_stream_click_attribution,
    "events_hourly_ohlc": q_events_hourly_ohlc,
    "agg_value_histogram": q_agg_value_histogram,
    "text_top_bigrams": q_text_top_bigrams,
    "q5_local_supplier_volume": q_q5_local_supplier_volume,
    "q10_returned_items": q_q10_returned_items,
    "q18_large_orders": q_q18_large_orders,
    "sample_mod_events": q_sample_mod_events,
    "sample_stratified_orders": q_sample_stratified_orders,
}

ORACLES = {
    "agg_value_histogram": f"""
        SELECT event_type,
               CAST(floor({_c('value')} / 5000.0) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               MIN({_c('value')}) AS lo_cents,
               MAX({_c('value')}) AS hi_cents
        FROM events
        GROUP BY 1, 2
    """,
    "text_top_bigrams": """
        SELECT bigram, COUNT(*) AS n FROM (
          SELECT w[i] || ' ' || w[i+1] AS bigram
          FROM (SELECT string_split(text, ' ') AS w FROM documents),
               LATERAL unnest(range(1, len(w))) AS t(i)
        )
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 50
    """,
    "events_hourly_ohlc": f"""
        WITH e AS (
          SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                 {_c('value')} AS v, ts, event_id
          FROM events
        ), r AS (
          SELECT hour, v,
                 ROW_NUMBER() OVER (PARTITION BY hour ORDER BY ts, event_id) AS rna,
                 ROW_NUMBER() OVER (PARTITION BY hour ORDER BY ts DESC, event_id DESC) AS rnd
          FROM e
        )
        SELECT hour,
               MAX(CASE WHEN rna = 1 THEN v END) AS open_cents,
               MAX(v) AS high_cents,
               MIN(v) AS low_cents,
               MAX(CASE WHEN rnd = 1 THEN v END) AS close_cents,
               COUNT(*) AS n_events
        FROM r GROUP BY hour
    """,
    "stream_click_attribution": """
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               SUM({_REV_SQL}) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-07-01'
          AND l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY 1, 2
        ORDER BY revenue DESC, orderdate, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name, SUM({_REV_SQL}) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
          AND r_name IN ('ASIA', 'EUROPE')
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, SUM({_REV_SQL}) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q18_large_orders": f"""
        WITH big AS (
          SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               {_c('o_totalprice')} AS totalprice_cents,
               total_qty
        FROM orders
        JOIN big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "sample_mod_events": f"""
        SELECT event_id, user_id, event_type, {_c('value')} AS value_cents
        FROM events WHERE event_id % 20 = 0
    """,
    "sample_stratified_orders": """
        SELECT o_orderpriority, rn, o_orderkey, o_custkey FROM (
          SELECT o_orderpriority, o_orderkey, o_custkey,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 50
    """,
}
