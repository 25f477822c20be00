"""Relational/analytics surface, batch 12 (round 6): gaps-and-islands
(the classic consecutive-runs operator the registry lacked), seasonal
adjustment + dominant-period detection completing the time-series
diagnostics family, the Theil inequality index (the log-based
complement to gini_nation_spend, exact via the engine's deterministic
ln), and a KMV set-union sketch (union/overlap cardinality across event
segments — the mergeable-sketch counterpart to agg_kmv_distinct).

Beyond-reference extension surface (SURVEY §2.9). Exactness: islands
and residuals are pure integer arithmetic; Theil snaps each group's
(x/μ)·ln(x/μ) term to integer micro-units through ln_int_sql (the
correctly-rounded-ops-only formula from functions/text_queries2) before
summation; KMV estimates divide two exactly-representable numbers.

Scale shape notes per query in the docstrings; nothing here windows
over a fact-scale partition — islands windows per customer-month (the
keyed-window convention), everything else reduces to bounded relations
first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql
from page_rank_mapreduce_java_spark.operators.relational10 import (
    _DAILY_SQL,
    _daily_counts,
)


# --- gaps and islands ---------------------------------------------------------


def q_orders_monthly_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over customer activity: for every customer, the
    runs of CONSECUTIVE calendar months with at least one order, then
    the corpus-wide histogram (island_months → n_islands) — the classic
    tenure/churn-streak operator (month_index − dense_rank is constant
    within a run).

    Scale shape: orders reduce to distinct (custkey, month) first; the
    dense_rank window partitions by CUSTOMER (high-cardinality key —
    the keyed-window convention, never a global order); the histogram
    is a bounded ≤ #months relation."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
    )
    m = o.distinct()
    w = Window.partitionBy("o_custkey").orderBy("midx")
    islands = (
        m.withColumn("_grp", F.col("midx") - F.dense_rank().over(w))
        .groupBy("o_custkey", "_grp")
        .agg(F.count(F.lit(1)).alias("island_months"))
    )
    return (
        islands.groupBy("island_months")
        .agg(F.count(F.lit(1)).alias("n_islands"))
    )


MONTHLY_ISLANDS_SQL = """
    WITH m AS (
      SELECT DISTINCT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS midx
      FROM orders
    ),
    runs AS (
      SELECT o_custkey,
             midx - dense_rank() OVER (PARTITION BY o_custkey ORDER BY midx)
               AS grp
      FROM m
    ),
    islands AS (
      SELECT o_custkey, grp, CAST(COUNT(*) AS BIGINT) AS island_months
      FROM runs GROUP BY 1, 2
    )
    SELECT island_months, CAST(COUNT(*) AS BIGINT) AS n_islands
    FROM islands GROUP BY 1
"""


# --- seasonal adjustment ------------------------------------------------------


def q_events_dow_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted daily volumes: each day's count minus its
    weekday's mean, kept EXACT as a (numerator, denominator) integer
    pair — resid = c − Σc_dow/n_dow is emitted as resid_num = c·n_dow −
    Σc_dow over denominator n_dow, so no float mean ever forms. The
    detrended series a changepoint/anomaly pass would consume after
    events_dow_seasonality identifies weekday structure.

    Scale shape: fact table → day series → broadcast-joined 7-row
    weekday profile; output is days-sized."""
    daily = _daily_counts(spark, sf_dir)
    dow = (F.dayofweek("day") - 1).cast("long")
    d = daily.select("day", "c", dow.alias("dow"))
    prof = d.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_dow"), F.sum("c").alias("sum_dow")
    )
    return d.join(F.broadcast(prof), "dow").select(
        "day",
        "c",
        "dow",
        (F.col("c") * F.col("n_dow") - F.col("sum_dow")).alias("resid_num"),
        "n_dow",
    )


DOW_RESIDUALS_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (SELECT day, c, CAST(dayofweek(day) AS BIGINT) AS dow FROM daily),
    prof AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_dow,
                    CAST(SUM(c) AS BIGINT) AS sum_dow
             FROM d GROUP BY 1)
    SELECT day, c, d.dow,
           CAST(c * n_dow - sum_dow AS BIGINT) AS resid_num, n_dow
    FROM d JOIN prof ON d.dow = prof.dow
"""


# --- dominant period ----------------------------------------------------------


def q_events_period_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant period of the daily volume series: the lag (1..7) with
    the maximum autocorrelation, from the exact-sufficient-statistic
    ACF (operators/relational8.q_events_daily_acf) — one row
    (best_lag, acf_ppm). A best_lag of 7 confirms weekly structure;
    composes with events_dow_seasonality/residuals."""
    from page_rank_mapreduce_java_spark.operators.relational8 import (
        q_events_daily_acf,
    )

    acf = q_events_daily_acf(spark, sf_dir)
    return (
        acf.orderBy(F.desc("acf_ppm"), F.asc("lag"))
        .limit(1)
        .select(F.col("lag").alias("best_lag"), "acf_ppm")
    )


def _period_detect_sql() -> str:
    from page_rank_mapreduce_java_spark.operators.relational8 import ACF_SQL

    return f"""
    WITH acf AS ({ACF_SQL})
    SELECT lag AS best_lag, acf_ppm FROM acf
    ORDER BY acf_ppm DESC, lag ASC LIMIT 1
"""


# --- Theil inequality index ---------------------------------------------------


def q_agg_theil_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend across nations — the
    log-based, decomposable complement to gini_nation_spend:
    T = (1/n) Σ (x_i/μ)·ln(x_i/μ) with μ = X/n, so every log argument
    is the integer ratio n·x_i / X. Each group's term uses the
    deterministic ln (ln_int_sql: ln(n·x_i) − ln(X), both integer
    arguments) and snaps to micro-units before the sum; the single
    terminal division by n rounds identically on both engines.
    (BIGINT bound: n·x_i fits while Σcents < 2^63/n — beyond that the
    cents sums ride DECIMAL and the ln argument needs a HUGEINT bin();
    documented, not yet needed at any test scale.)

    Scale shape: one fact aggregate to the 25-nation relation; the
    1-row total broadcasts; everything after is bounded."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    x = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum("cents").alias("x"))
    )
    tot = x.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("xt")
    )
    nx = "(CAST(n AS BIGINT) * x)"
    term = (
        f"CAST(ROUND((CAST({nx} AS DOUBLE) / CAST(xt AS DOUBLE)) * "
        f"({ln_int_sql(nx, 'spark')} - {ln_int_sql('xt', 'spark')}) * 1e6, 0) "
        f"AS BIGINT)"
    )
    terms = x.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("_n"), F.expr(term).alias("t_micro")
    )
    return terms.groupBy("_n").agg(
        F.sum("t_micro").alias("_ts")
    ).select(
        F.col("_n").alias("n_groups"),
        F.round(F.col("_ts").cast("double") / F.col("_n").cast("double"))
        .cast("long")
        .alias("theil_micro"),
    )


def _theil_sql() -> str:
    nx = "(n * x)"
    term = (
        f"CAST(ROUND((CAST({nx} AS DOUBLE) / CAST(xt AS DOUBLE)) * "
        f"({ln_int_sql(nx, 'duckdb')} - {ln_int_sql('xt', 'duckdb')}) * 1e6, 0) "
        f"AS BIGINT)"
    )
    return f"""
    WITH x AS (
      SELECT c_nationkey, CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS xt FROM x),
    terms AS (SELECT n, {term} AS t_micro FROM x, t)
    SELECT n AS n_groups,
           CAST(ROUND(CAST(SUM(t_micro) AS DOUBLE) / CAST(n AS DOUBLE), 0)
                AS BIGINT) AS theil_micro
    FROM terms GROUP BY n
"""


# --- KMV union sketch ---------------------------------------------------------

KMV_UNION_K = 64


def q_sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union cardinality across event segments by MERGING k-minimum-
    values sketches — the property that makes KMV a distributed sketch
    (sets union by unioning hash sets and re-taking the k smallest;
    intersection follows by inclusion–exclusion downstream). Estimates
    distinct users for 'click', for 'view', and for their union over
    the portable md5 hash family: 3 rows (set_name, est_distinct),
    bit-identical on both engines (agg_kmv_distinct's estimator).

    Scale shape: one distinct shuffle on (set, hash); the k-smallest
    per set rides the two-pass global ranking chassis
    (operators/ranking.py), never a single-partition window."""
    from page_rank_mapreduce_java_spark.functions.hashes import md5_long
    from page_rank_mapreduce_java_spark.operators.ranking import global_row_number

    e = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("click", "view")
    )
    # ONE fact scan feeds all three sketches: each row fans out to its
    # own set and the union set via explode (a union-of-selects would
    # scan events twice).
    d = e.select(
        F.explode(F.array(F.col("event_type"), F.lit("union"))).alias(
            "set_name"
        ),
        md5_long(F.col("user_id").cast("string")).alias("hv"),
    ).distinct()
    r = global_row_number(d, [F.asc("set_name"), F.asc("hv")], out_col="_grn")
    off = r.groupBy("set_name").agg((F.min("_grn") - 1).alias("_off"))
    kept = (
        r.join(F.broadcast(off), "set_name")
        .filter(F.col("_grn") - F.col("_off") <= KMV_UNION_K)
    )
    agg = kept.groupBy("set_name").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("hk")
    )
    est = F.when(F.col("n_kept") < KMV_UNION_K, F.col("n_kept")).otherwise(
        F.round(
            F.lit(float(KMV_UNION_K - 1))
            * F.lit(float(2**60))
            / F.col("hk").cast("double")
        ).cast("long")
    )
    return agg.select("set_name", est.cast("long").alias("est_distinct"))


def _kmv_union_sql() -> str:
    from page_rank_mapreduce_java_spark.functions.hashes import md5_long_sql

    h = md5_long_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH base AS (SELECT event_type, user_id FROM events
                  WHERE event_type IN ('click', 'view')),
    d AS (
      SELECT DISTINCT set_name, hv FROM (
        SELECT unnest(list_value(event_type, 'union')) AS set_name,
               {h} AS hv
        FROM base)
    ),
    ranked AS (
      SELECT set_name, hv,
             row_number() OVER (PARTITION BY set_name ORDER BY hv) AS pos
      FROM d
    ),
    agg AS (
      SELECT set_name, COUNT(*) AS n_kept, MAX(hv) AS hk
      FROM ranked WHERE pos <= {KMV_UNION_K} GROUP BY set_name
    )
    SELECT set_name,
           CAST(CASE WHEN n_kept < {KMV_UNION_K} THEN n_kept
                ELSE CAST(ROUND({float(KMV_UNION_K - 1)} * {float(2**60)}
                               / CAST(hk AS DOUBLE), 0) AS BIGINT)
                END AS BIGINT) AS est_distinct
    FROM agg
"""


# --- nearest as-of join -------------------------------------------------------


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each event matched to the user's
    closest order in TIME — before or after — with ties (equidistant
    back/forward) resolved toward the earlier order. Complements the
    backward-only join_asof_latest_order; kdb's aj/w and Pandas
    merge_asof(direction='nearest') are the reference semantics.

    Realization: TWO passes of the union-sort as-of chassis
    (operators/asof.py) — backward on the micros timeline, forward on
    its negation — then one row-level arbitration by absolute distance.
    Cost stays two exchanges + two in-partition sorts, both keyed on
    the same user key; no per-row range probe, no interval blow-up.
    Output: (event_id, user_id, nearest_orderkey, delta_us — signed
    event-minus-order distance, ≥ 0 means the order preceded)."""
    from page_rank_mapreduce_java_spark.operators.asof import asof_join

    e = load_table(spark, "events", sf_dir).select(
        "user_id", F.unix_micros("ts").alias("tsu"), "event_id"
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ots"),
        )
        .agg(F.max("o_orderkey").alias("okey"))
        .select("user_id", F.unix_micros("ots").alias("otsu"), "okey")
    )
    back = asof_join(
        e,
        o.select("user_id", F.col("otsu").alias("tsu"),
                 F.col("okey").alias("bk_key"), F.col("otsu").alias("bk_tsu")),
        on="user_id", ts="tsu", payload=["bk_key", "bk_tsu"],
        how="left", tiebreak=["event_id"],
    )
    fwd = asof_join(
        e.select("user_id", (-F.col("tsu")).alias("tsn"), "event_id"),
        o.select("user_id", (-F.col("otsu")).alias("tsn"),
                 F.col("okey").alias("fw_key"), F.col("otsu").alias("fw_tsu")),
        on="user_id", ts="tsn", payload=["fw_key", "fw_tsu"],
        how="left", tiebreak=["event_id"],
    ).select("event_id", "fw_key", "fw_tsu")
    j = back.join(fwd, "event_id")
    db = F.col("tsu") - F.col("bk_tsu")  # ≥ 0 when matched
    df_ = F.col("fw_tsu") - F.col("tsu")  # ≥ 0 when matched
    take_back = F.col("bk_key").isNotNull() & (
        F.col("fw_key").isNull() | (db <= df_)
    )
    return j.filter(
        F.col("bk_key").isNotNull() | F.col("fw_key").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.when(take_back, F.col("bk_key"))
        .otherwise(F.col("fw_key"))
        .alias("nearest_orderkey"),
        F.when(take_back, db).otherwise(-df_).alias("delta_us"),
    )


ASOF_NEAREST_SQL = """
    WITH o AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS ots,
             MAX(o_orderkey) AS okey
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT e.event_id, e.user_id, o.okey,
             epoch_us(e.ts) - epoch_us(o.ots) AS delta_us,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch_us(e.ts) - epoch_us(o.ots)) ASC,
                        CASE WHEN o.ots <= e.ts THEN 0 ELSE 1 END ASC
             ) AS rn
      FROM events e JOIN o ON e.user_id = o.k
    )
    SELECT event_id, user_id, okey AS nearest_orderkey,
           CAST(delta_us AS BIGINT) AS delta_us
    FROM ranked WHERE rn = 1
"""


QUERIES = {
    "orders_monthly_islands": q_orders_monthly_islands,
    "events_dow_residuals": q_events_dow_residuals,
    "events_period_detect": q_events_period_detect,
    "agg_theil_nation": q_agg_theil_nation,
    "sketch_kmv_union": q_sketch_kmv_union,
    "join_asof_nearest": q_join_asof_nearest,
}

ORACLES = {
    "orders_monthly_islands": MONTHLY_ISLANDS_SQL,
    "events_dow_residuals": DOW_RESIDUALS_SQL,
    "events_period_detect": _period_detect_sql(),
    "agg_theil_nation": _theil_sql(),
    "sketch_kmv_union": _kmv_union_sql(),
    "join_asof_nearest": ASOF_NEAREST_SQL,
}
