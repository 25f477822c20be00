"""Relational operator surface (SURVEY.md §7 M4) with DuckDB oracles.

Covers the operator inventory of SURVEY.md §2 plus everything the reference
*lacks* but a complete engine needs: scans with pushdown, projections,
filters, the full join family (broadcast/left/semi/anti/range), aggregation
(sum/min/max/avg, count-distinct, collect_set, cube, rollup, median),
window functions (top-k per group, running sums, sessionization,
dense_rank), sorts/limits, set ops, string/date/JSON/conditional/pivot.

Determinism conventions (so the driver's order-insensitive value-hash
matches DuckDB exactly):
- money/value sums run in integer cents (exact, order-independent), then
  divide back to DOUBLE;
- counts stay BIGINT, int-typed scalars are cast to BIGINT on both sides;
- dates are emitted as 'yyyy-MM-dd' strings;
- floating aggregates that cannot be made exact are ROUND()ed identically
  on both sides.

Scale notes: every query is a declarative plan — Catalyst pushes filters
and prunes columns into the parquet scans; dimension joins broadcast
(nation/region/supplier are tiny at any SF); fact-fact joins shuffle on
their keys and AQE handles skew/coalescing at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql


# --- scans / filters / projections -----------------------------------------


def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection pushed into the parquet scan (S1/P-family/F-family)."""
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "customer", sf_dir).select("c_mktsegment").distinct()


# --- aggregation ------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→filter→agg→sort pipeline.

    All sums in integer cents/basis points → exact and order-independent.
    """
    l = load_table(spark, "lineitem", sf_dir)
    qty = _cents("l_quantity")
    price = _cents("l_extendedprice")
    disc = _cents("l_discount")  # basis points /100
    tax = _cents("l_tax")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty) / 100.0).alias("sum_qty"),
            (F.sum(price) / 100.0).alias("sum_base_price"),
            (F.sum(price * (100 - disc)) / 10000.0).alias("sum_disc_price"),
            (F.sum(price * (100 - disc) * (100 + tax)) / 1000000.0).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
            (F.sum(qty) / 100.0 / F.count(F.lit(1))).alias("avg_qty"),
        )
    )


def q_agg_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    bal = _cents("c_acctbal")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        (F.sum(bal) / 100.0).alias("total_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        (F.sum(bal) / 100.0 / F.count(F.lit(1))).alias("avg_bal"),
    )


def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT_SET (the reference's HashSet dedup, pageRank_v2.java:184,195)
    — emitted as a sorted joined string so the hash is order-insensitive."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg((F.sum(_cents("l_quantity")) / 100.0).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.withColumn("yr", F.year("o_orderdate").cast("long"))
        .rollup("yr", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("yr", F.lit(-1)).alias("yr"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
        )
    )


def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type median of event value on the scalable grouped-
    quantile chassis: ONE global two-pass row number over (type, value,
    event_id), per-type offsets/counts broadcast, and the median read
    from the 1–2 central POSITIONS per group (averaged when even —
    DuckDB's interpolation convention).

    Not ``F.median`` per group: with a low-cardinality group key that
    aggregate buffers n/|groups| values per aggregation buffer — the
    same memory scale-killer the r4 verdict flagged on PSI's global
    exact percentile, at the keyed grain."""
    from page_rank_mapreduce_java_spark.operators.ranking import global_row_number

    e = load_table(spark, "events", sf_dir).select("event_type", "value", "event_id")
    r = global_row_number(
        e, [F.asc("event_type"), F.asc("value"), F.asc("event_id")], out_col="_grn"
    )
    stats = r.groupBy("event_type").agg(
        (F.min("_grn") - 1).alias("_off"), F.count(F.lit(1)).alias("_tot")
    )
    pos = r.join(F.broadcast(stats), "event_type").withColumn(
        "_pos", F.col("_grn") - F.col("_off")
    )
    # Central positions: floor((tot+1)/2) and floor(tot/2)+1 — the same
    # row when tot is odd, the two middle rows when even. Pure integer
    # comparisons (div), no float equality.
    central = pos.filter(
        (F.col("_pos") == F.expr("(_tot + 1) div 2"))
        | (F.col("_pos") == F.expr("_tot div 2 + 1"))
    )
    return central.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("median_value"),
        F.max("_tot").alias("n"),
    )


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch — no oracle (approx algorithms differ per engine);
    driver records the weaker rows-only check."""
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


# --- joins ------------------------------------------------------------------


def q_join_broadcast_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: facts shuffle once, dims broadcast (no shuffle of the
    big side) — the Spark analogue of the reference's join-avoidance
    (SURVEY §2.4 J1)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("revenue"),
        )
    )


def q_join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0)) / 100.0).alias("total_spent"),
        )
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi — no row duplication, no payload from the right."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    f_orders = orders.filter(F.col("o_orderstatus") == "F")
    return customer.join(
        f_orders, customer.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti (same plan shape as dangling-node detection)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_join_range_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: same-user event pairs within 1 hour. The user_id equi-key
    keeps this a shuffle join with a residual range predicate (never a
    cartesian product) — the scalable shape for interval joins."""
    e = load_table(spark, "events", sf_dir)
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- windows ----------------------------------------------------------------


def q_window_topk_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        l.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", F.col("rn").cast("long").alias("rn"))
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user sum, computed in exact cents (order-independent
    hash despite floating inputs)."""
    e = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(_cents("value")).over(w) / 100.0).alias("running_value"),
    )


def q_window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag-gap > 30 min (SURVEY §2.9 window surface)."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flag = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        > 1800 * 1_000_000
    ).cast("long")
    return (
        e.withColumn("new_sess", F.coalesce(flag, F.lit(0)))
        .groupBy("user_id")
        .agg((F.sum("new_sess") + 1).alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def q_window_dense_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global DENSE_RANK via distinct-value ranking + join back
    (operators/ranking.py) — supplier grows with the scale factor, so the
    single-task ``Window.orderBy`` form would bottleneck at scale."""
    from page_rank_mapreduce_java_spark.operators.ranking import global_dense_rank

    s = load_table(spark, "supplier", sf_dir)
    return global_dense_rank(
        s.select("s_suppkey", "s_acctbal"), F.col("s_acctbal"), "_bal", out_col="rnk"
    ).select("s_suppkey", "s_acctbal", "rnk")


# --- sort / limit -----------------------------------------------------------


def q_order_limit_top25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K: TakeOrderedAndProject, not a full sort (SURVEY §2.7)."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- set ops ----------------------------------------------------------------


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)


# --- scalar function families ------------------------------------------------


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 12).alias("name12"),
        F.length("p_name").cast("long").alias("name_len"),
        F.col("p_name").contains("green").cast("long").alias("has_green"),
        F.regexp_extract("p_name", r"^\w+", 0).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias("days_since"),
    )


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


def q_case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("total"),
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    wide = e.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return wide.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


QUERIES = {
    "scan_filter_project": q_scan_filter_project,
    "distinct_segments": q_distinct_segments,
    "q1_pricing_summary": q1_pricing_summary,
    "agg_segment_stats": q_agg_segment_stats,
    "agg_count_distinct": q_agg_count_distinct,
    "agg_collect_set_sorted": q_agg_collect_set_sorted,
    "agg_cube": q_agg_cube,
    "agg_rollup": q_agg_rollup,
    "agg_median": q_agg_median,
    "agg_approx_distinct": q_agg_approx_distinct,
    "join_broadcast_region_revenue": q_join_broadcast_region_revenue,
    "join_left_customer_orders": q_join_left_customer_orders,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_range_event_pairs": q_join_range_event_pairs,
    "window_topk_per_order": q_window_topk_per_order,
    "window_running_sum": q_window_running_sum,
    "window_sessionize": q_window_sessionize,
    "window_dense_rank_suppliers": q_window_dense_rank_suppliers,
    "order_limit_top25": q_order_limit_top25,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "json_funcs": q_json_funcs,
    "case_when_buckets": q_case_when_buckets,
    "pivot_event_counts": q_pivot_event_counts,
}

_c = cents_sql


ORACLES = {
    "scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_quantity > 45
    """,
    "distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               SUM({_c('l_quantity')}) / 100.0 AS sum_qty,
               SUM({_c('l_extendedprice')}) / 100.0 AS sum_base_price,
               SUM({_c('l_extendedprice')} * (100 - {_c('l_discount')})) / 10000.0 AS sum_disc_price,
               SUM({_c('l_extendedprice')} * (100 - {_c('l_discount')}) * (100 + {_c('l_tax')})) / 1000000.0 AS sum_charge,
               COUNT(*) AS count_order,
               SUM({_c('l_quantity')}) / 100.0 / COUNT(*) AS avg_qty
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_segment_stats": f"""
        SELECT c_mktsegment, COUNT(*) AS n_cust,
               SUM({_c('c_acctbal')}) / 100.0 AS total_bal,
               MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
               SUM({_c('c_acctbal')}) / 100.0 / COUNT(*) AS avg_bal
        FROM customer GROUP BY c_mktsegment
    """,
    "agg_count_distinct": """
        SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_collect_set_sorted": """
        SELECT o_orderpriority,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_cube": f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               SUM({_c('l_quantity')}) / 100.0 AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "agg_rollup": """
        SELECT COALESCE(yr, -1) AS yr, COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n
        FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus FROM orders)
        GROUP BY ROLLUP (yr, o_orderstatus)
    """,
    "agg_median": """
        SELECT event_type, ROUND(median(value), 6) AS median_value, COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "join_broadcast_region_revenue": f"""
        SELECT r_name, COUNT(*) AS n_orders,
               SUM({_c('o_totalprice')}) / 100.0 AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "join_left_customer_orders": f"""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               COALESCE(SUM({_c('o_totalprice')}), 0) / 100.0 AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_range_event_pairs": """
        SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        GROUP BY a.user_id
    """,
    "window_topk_per_order": """
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               CAST(row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_extendedprice DESC, l_linenumber ASC) AS BIGINT) AS rn
        FROM lineitem
        QUALIFY rn <= 3
    """,
    "window_running_sum": f"""
        SELECT event_id, user_id,
               SUM({_c('value')}) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
               AS running_value
        FROM events
    """,
    # Interval arithmetic, not epoch_us(): on DuckDB versions that surface
    # the parquet column as TIMESTAMP_NS, epoch-extraction semantics have
    # shifted across releases, while timestamp subtraction yields an
    # INTERVAL in every version. CAST(SUM(...) AS BIGINT): DuckDB's SUM
    # over integers returns HUGEINT, which the driver's pandas fetch path
    # renders as float64 ("7.0" vs Spark's "7") — the r1/r2 driver-vs-local
    # hash divergence (tools/canon_audit.py finds these mechanically).
    "window_sessionize": """
        WITH flagged AS (
          SELECT user_id,
                 CASE WHEN ts - lag(ts) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL '30' MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events)
        SELECT user_id, CAST(SUM(new_sess) + 1 AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM flagged GROUP BY user_id
    """,
    "window_dense_rank_suppliers": """
        SELECT s_suppkey, s_acctbal,
               CAST(dense_rank() OVER (ORDER BY s_acctbal DESC) AS BIGINT) AS rnk
        FROM supplier
    """,
    "order_limit_top25": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
    "set_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "set_except": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "string_funcs": r"""
        SELECT p_partkey, upper(p_brand) AS brand_u,
               substring(p_name, 1, 12) AS name12,
               CAST(length(p_name) AS BIGINT) AS name_len,
               CAST(contains(p_name, 'green') AS BIGINT) AS has_green,
               regexp_extract(p_name, '^\w+') AS first_word,
               concat_ws('|', p_brand, p_type) AS brand_type
        FROM part
    """,
    "date_funcs": """
        SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        FROM orders
    """,
    # regexp extraction, not ->>: the JSON operator family needs the json
    # extension and its path semantics ('$.k' vs 'k') moved across DuckDB
    # releases; a regexp over the {"k": <int>} payload works identically in
    # every version. Missing keys extract '' -> TRY_CAST NULL, matching
    # get_json_object's NULL. The outer CAST(SUM(..) AS BIGINT) avoids the
    # HUGEINT->float64 driver-fetch rendering (see window_sessionize note).
    "json_funcs": r"""
        SELECT event_type,
               CAST(SUM(TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
               MAX(TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS BIGINT)) AS max_k,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "case_when_buckets": f"""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END AS bucket,
               COUNT(*) AS n, SUM({_c('o_totalprice')}) / 100.0 AS total
        FROM orders GROUP BY 1
    """,
    "pivot_event_counts": """
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'error') AS error,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup') AS signup,
               COUNT(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY user_id
    """,
}
