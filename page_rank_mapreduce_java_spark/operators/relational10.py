"""Relational operator surface, batch 10 (round 5): time-series
diagnostics over the event stream and the order ledger — day-of-week
seasonality indices, single-changepoint detection, CUSUM drift scores,
Bollinger-band outlier days, inter-arrival burstiness, and centered
moving averages. Together with relational8's ACF/EWMA/anomaly family
this completes the volume-monitoring surface a data pipeline runs over
its ingest: is this week's dip seasonal or a regression (dow index)?
when exactly did the mix shift (changepoint)? is drift accumulating
slowly (CUSUM)? which days are statistical outliers (Bollinger)?

Beyond-reference extension surface (SURVEY §2.9 "absent in ref").

Canonicalization: identical policy to batch 9 — scaled BIGINTs from
identical IEEE expression trees over exact integer inputs; quadratics
that could wrap BIGINT ride DECIMAL(38,0)/HUGEINT. Timestamps reduce
through unix_micros (Spark) == epoch_us (DuckDB), both exact integers;
day-of-week uses DuckDB's 0=Sunday convention (Spark dayofweek()−1).

Scale shape: every query FIRST collapses the fact table to a bounded
relation with one map-side-combined groupBy — the day series (bounded
by the calendar), the dow profile (7 rows), or per-(user, type) gap
stats (high-cardinality keyed windows). Plain windows appear only over
those bounded/keyed relations, never over raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents, cents_sql


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared day-series reduction: events per calendar day."""
    return (
        load_table(spark, "events", sf_dir)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


_DAILY_SQL = "SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1"


def q_events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index of event volume: mean daily volume
    on each weekday relative to the overall daily mean, in ppm
    (idx > 1e6 = above-trend weekday). The cross-multiplied integer
    form (Σc_dow · n_days_total) / (n_days_dow · Σc_total) avoids
    intermediate float means.

    Scale shape: fact table → day series (calendar-bounded) → 7 rows.
    """
    daily = _daily_counts(spark, sf_dir)
    dow = (F.dayofweek("day") - 1).cast("long")
    agg = daily.groupBy(dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("events")
    )
    tot = agg.agg(
        F.sum("n_days").alias("_td"), F.sum("events").alias("_te")
    )
    idx = (
        (F.col("events") * F.col("_td")).cast("double")
        / (F.col("n_days") * F.col("_te")).cast("double")
        * 1e6
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            "events",
            F.round(idx).cast("long").alias("idx_ppm"),
        )
    )


DOW_SEASONALITY_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    a AS (SELECT CAST(dayofweek(day) AS BIGINT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(c) AS BIGINT) AS events
          FROM daily GROUP BY 1),
    t AS (SELECT CAST(SUM(n_days) AS BIGINT) AS td,
                 CAST(SUM(events) AS BIGINT) AS te FROM a)
    SELECT dow, n_days, events,
           CAST(ROUND(CAST(events * td AS DOUBLE)
                      / CAST(n_days * te AS DOUBLE) * 1e6, 0) AS BIGINT)
           AS idx_ppm
    FROM a, t
"""


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single mean-shift changepoint of the daily volume series:
    the split day k maximizing the standardized between-segment contrast
    T_k = (n·S_k − k·S_n)² / (n·k·(n−k)) — the CUSUM-test statistic,
    whose numerator A_k = n·S_k − k·S_n is an exact BIGINT (day count ×
    day sums; |A| ≤ n·S ≈ 4×10³·10¹³ at the design range). Ties on the
    rounded statistic break on the earlier day, identically in both
    engines. Returns the winning split with segment means in milli.

    Scale shape: runs entirely on the calendar-bounded day series; the
    prefix sums and the argmax window are day-count-sized.
    """
    daily = _daily_counts(spark, sf_dir)
    w_ord = Window.orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = daily.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("c").alias("_s")
    )
    d = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("_k", F.row_number().over(w_ord))
        .withColumn("_sk", F.sum("c").over(w_cum))
        .filter(F.col("_k") < F.col("_n"))  # split leaves both sides non-empty
    )
    a = F.col("_n") * F.col("_sk") - F.col("_k") * F.col("_s")
    t_stat = (
        a.cast("double")
        * a.cast("double")
        / (
            F.col("_n").cast("double")
            * F.col("_k").cast("double")
            * (F.col("_n") - F.col("_k")).cast("double")
        )
    )
    scored = d.select(
        "day",
        F.col("_k").alias("n_before"),
        (F.col("_n") - F.col("_k")).alias("n_after"),
        F.round(
            F.col("_sk").cast("double") / F.col("_k").cast("double") * 1e3
        )
        .cast("long")
        .alias("mean_before_milli"),
        F.round(
            (F.col("_s") - F.col("_sk")).cast("double")
            / (F.col("_n") - F.col("_k")).cast("double")
            * 1e3
        )
        .cast("long")
        .alias("mean_after_milli"),
        F.round(t_stat * 1e3).cast("long").alias("t_milli"),
    )
    w_best = Window.orderBy(F.desc("t_milli"), F.asc("day"))
    return (
        scored.withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


CHANGEPOINT_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
          FROM daily),
    d AS (
      SELECT day,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
             CAST(SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS sk,
             n, s
      FROM daily, t
    ),
    scored AS (
      SELECT day, k AS n_before, n - k AS n_after,
             CAST(ROUND(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE) * 1e3, 0)
                  AS BIGINT) AS mean_before_milli,
             CAST(ROUND(CAST(s - sk AS DOUBLE) / CAST(n - k AS DOUBLE) * 1e3, 0)
                  AS BIGINT) AS mean_after_milli,
             CAST(ROUND(CAST(n * sk - k * s AS DOUBLE)
                        * CAST(n * sk - k * s AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                           * CAST(n - k AS DOUBLE))
                        * 1e3, 0) AS BIGINT) AS t_milli
      FROM d WHERE k < n
    )
    SELECT day, n_before, n_after, mean_before_milli, mean_after_milli, t_milli
    FROM scored
    ORDER BY t_milli DESC, day
    LIMIT 1
"""


def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift score per day, exactly integer: with
    deviations scaled by n (d_k = n·c_k − S_n, mean-centering without a
    float mean), the recursion C_k = max(0, C_{k−1} + d_k) unrolls to
    the WINDOWABLE form C_k = cum_k − min_{j≤k}(cum_j, 0) where cum is
    the deviation prefix sum — no iterative state, two window passes.
    Emits the days with positive drift score (volume running above the
    long-run mean since the last reset).

    Scale shape: day-series-sized; both windows run over the bounded
    calendar relation. d ≤ n·c ≈ 4×10³·10¹³ — BIGINT-safe by 10².
    """
    daily = _daily_counts(spark, sf_dir)
    tot = daily.agg(F.count(F.lit(1)).alias("_n"), F.sum("c").alias("_s"))
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("_cum", F.sum(F.col("_n") * F.col("c") - F.col("_s")).over(w_cum))
        .withColumn(
            "_floor", F.least(F.min("_cum").over(w_cum), F.lit(0))
        )
    )
    return (
        d.select(
            "day",
            "c",
            (F.col("_cum") - F.col("_floor")).alias("cusum_scaled"),
        )
        .filter(F.col("cusum_scaled") > 0)
    )


CUSUM_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
          FROM daily),
    d AS (
      SELECT day, c,
             CAST(SUM(n * c - s) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM daily, t
    ),
    m AS (
      SELECT day, c, cum,
             CAST(LEAST(MIN(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
                        0) AS BIGINT) AS flr
      FROM d
    )
    SELECT day, c, cum - flr AS cusum_scaled
    FROM m WHERE cum - flr > 0
"""


def q_events_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band outlier days: daily volumes outside mean ± 1.5σ
    of their own trailing 7-day window, flagged EXACTLY in integers —
    the band test (c − s/7)² > (1.5)²·(7q − s²)/49 cross-multiplies to
    4·(7c − s)² > 9·(7q − s²) with s = Σc, q = Σc² over the window, so
    no float mean/σ ever materializes. (1.5σ, not the charting-default
    2σ: a 7-sample trailing σ is noisy enough that 2σ flags almost
    nothing on well-behaved series.) The quadratics ride DECIMAL(38,0)
    ((7c)² ≈ 10²⁸ at the design range). Warm-up days (fewer than 7
    trailing days) are excluded.

    Scale shape: day-series-sized trailing window over the bounded
    calendar relation.
    """
    daily = _daily_counts(spark, sf_dir)
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    d = (
        daily.withColumn("_s", F.sum("c").over(w7))
        .withColumn("_q", F.sum(F.col("c") * F.col("c")).over(w7))
        .withColumn("_w", F.count(F.lit(1)).over(w7))
        .filter(F.col("_w") == 7)
    )
    dev = (F.lit(7) * F.col("c") - F.col("_s")).cast("decimal(38,0)")
    spread = (
        F.lit(7).cast("decimal(38,0)") * F.col("_q").cast("decimal(38,0)")
        - F.col("_s").cast("decimal(38,0)") * F.col("_s").cast("decimal(38,0)")
    )
    outside = (
        F.lit(4).cast("decimal(38,0)") * dev * dev
        > F.lit(9).cast("decimal(38,0)") * spread
    )
    return (
        d.filter(outside)
        .select(
            "day",
            "c",
            F.col("_s").alias("s7"),
            F.when(F.lit(7) * F.col("c") > F.col("_s"), F.lit("hi"))
            .otherwise(F.lit("lo"))
            .alias("band"),
        )
    )


BOLLINGER_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (
      SELECT day, c,
             CAST(SUM(c) OVER w AS BIGINT) AS s,
             CAST(SUM(c * c) OVER w AS BIGINT) AS q,
             COUNT(*) OVER w AS nw
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, c, s AS s7,
           CASE WHEN 7 * c > s THEN 'hi' ELSE 'lo' END AS band
    FROM d
    WHERE nw = 7
      AND 4 * CAST(7 * c - s AS HUGEINT) * CAST(7 * c - s AS HUGEINT)
          > 9 * (CAST(7 AS HUGEINT) * q - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
"""


def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness coefficient B = (σ−μ)/(σ+μ) of inter-event gaps per
    event type, over each user's OWN event stream of that type (B→−1:
    metronome, B≈0: Poisson, B→1: extreme bursts). Gaps are exact
    integer microseconds (unix_micros == epoch_us); σ, μ derive from
    Σg, Σg² in identical IEEE arithmetic, Σg² in DECIMAL(38,0)/HUGEINT
    (gap² ≈ 10²⁵ μs²).

    Scale shape: the lag window partitions on the HIGH-CARDINALITY
    (user_id, event_type) key — thousands of small per-user-type
    streams per task, no giant partition; the final rollup is
    type-sized.
    """
    e = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        e.withColumn("_prev", F.lag("us").over(w))
        .filter(F.col("_prev").isNotNull())
        .select("event_type", (F.col("us") - F.col("_prev")).alias("g"))
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").alias("_sg"),
        F.sum(F.col("g").cast("decimal(38,0)") * F.col("g").cast("decimal(38,0)")).alias(
            "_sg2"
        ),
    )
    n = F.col("n_gaps").cast("double")
    mu = F.col("_sg").cast("double") / n
    sigma = F.sqrt(F.col("_sg2").cast("double") / n - mu * mu)
    return agg.select(
        "event_type",
        "n_gaps",
        F.round((sigma - mu) / (sigma + mu) * 1e6).cast("long").alias("b_ppm"),
    )


BURSTINESS_SQL = """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
             ) AS g
      FROM events
    ),
    a AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(g) AS BIGINT) AS sg,
             SUM(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS sg2
      FROM g WHERE g IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n_gaps,
           CAST(ROUND(
             (SQRT(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                   - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                     * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
              - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             / (SQRT(CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                     - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                       * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             * 1e6, 0) AS BIGINT) AS b_ppm
    FROM a
"""


def q_orders_centered_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-day moving sum of daily order revenue (the symmetric
    smoother for trend extraction — trailing MAs lag the trend by half a
    window). Exact integers: the output is the 7-day SUM in cents (the
    mean is that over 7, left to the consumer — dividing would force a
    float). Edge days without a full ±3-day window are excluded.

    Scale shape: fact table → day series; the centered window runs over
    the calendar-bounded relation.
    """
    daily = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    return (
        daily.withColumn("_s", F.sum("rev").over(w))
        .withColumn("_w", F.count(F.lit(1)).over(w))
        .filter(F.col("_w") == 7)
        .select("day", "rev", F.col("_s").alias("ma7_sum_cents"))
    )


CENTERED_MA_SQL = f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT day, rev,
             CAST(SUM(rev) OVER w AS BIGINT) AS s,
             COUNT(*) OVER w AS nw
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT day, rev, s AS ma7_sum_cents FROM d WHERE nw = 7
"""


TRIGRAM_TOP = 20


def q_events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 behavioral paths: consecutive event-type triples
    per user stream (ts, event_id total order — the transitions-query
    convention extended one LEAD further), counted globally. The
    second-order sequence mining any funnel/recommendation analysis
    starts from.

    Scale shape: two LEADs over the high-cardinality user_id window, one
    hash aggregate to the triple grain (bounded by |event_type|³ ≈ 10²
    groups), then the global top-k is a sort of that bounded relation —
    never a fact-table window."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = (
        e.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy(F.col("event_type").alias("e1"), "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return triples.orderBy(F.desc("n"), "e1", "e2", "e3").limit(TRIGRAM_TOP)


TRIGRAM_PATHS_SQL = f"""
    WITH s AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events)
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT {TRIGRAM_TOP}
"""


QUERIES = {
    "events_trigram_paths": q_events_trigram_paths,
    "events_dow_seasonality": q_events_dow_seasonality,
    "events_changepoint": q_events_changepoint,
    "events_cusum": q_events_cusum,
    "events_bollinger": q_events_bollinger,
    "events_burstiness": q_events_burstiness,
    "orders_centered_ma": q_orders_centered_ma,
}

ORACLES = {
    "events_trigram_paths": TRIGRAM_PATHS_SQL,
    "events_dow_seasonality": DOW_SEASONALITY_SQL,
    "events_changepoint": CHANGEPOINT_SQL,
    "events_cusum": CUSUM_SQL,
    "events_bollinger": BOLLINGER_SQL,
    "events_burstiness": BURSTINESS_SQL,
    "orders_centered_ma": CENTERED_MA_SQL,
}
