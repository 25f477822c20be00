"""Relational/analytics surface, batch 13 (round 7): the inferential-
statistics family (Welch two-sample t, Mann-Whitney U, WOE/information
value, two-regressor OLS), interval-stabbing order backlog, grouped
exact percentiles + IQR outlier audit, YoY growth / revenue share /
rolling z-score / day-hour heatmap / multi-lag ACF time-series
diagnostics, a KMV intersection sketch, and a broadcast band range
join.

Beyond-reference extension surface (SURVEY §2.9). Exactness contract
(the corr-family convention, VERDICT r5 next #4): every accumulation is
integer (cents / counts / micro-nats) riding DECIMAL(38,0) where
products can pass 2^63; the ONLY floating-point step is one terminal
expression rendered from the SAME SQL string into both engines
(F.expr on Spark, inline in DuckDB), so every intermediate double is
bit-identical and no half-ulp boundary can flip a rounded integer.
Log terms go through the deterministic ln (ln_int_sql).

Scale shape: nothing here windows over a fact-scale partition — the
rank/cumulative windows operate on bounded relations (a 50-value
quantity histogram, a ~2.4k-day calendar, ~80 months, 10 price bands)
per the documented bounded-domain convention; the one fact-length
prefix sum (order backlog) rides the two-pass global_running_sum
chassis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql


# --- Welch two-sample t-test --------------------------------------------------


# ONE terminal expression over the exact integer sufficient statistics
# (n/s/ss per group), shared verbatim by both engines. Sample variance
# via v = (n*ss - s*s) / (n*(n-1)) keeps a single division; every op is
# IEEE correctly rounded, so identical inputs give identical doubles.
_WELCH_T = """
    CAST(ROUND(
      ((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
       - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
      / sqrt(
          ((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
            - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
           / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
          / CAST(n_a AS DOUBLE)
          + ((CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
              - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
             / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
          / CAST(n_b AS DOUBLE))
      * 1e6, 0) AS BIGINT)
"""

_WELCH_DF = """
    CAST(ROUND(
      (((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
         - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
        / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
       / CAST(n_a AS DOUBLE)
       + ((CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
           - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
          / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
       / CAST(n_b AS DOUBLE))
      * (((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
           - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
          / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
         / CAST(n_a AS DOUBLE)
         + ((CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
             - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
            / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
         / CAST(n_b AS DOUBLE))
      / (
        pow(((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)
              - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
             / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
            / CAST(n_a AS DOUBLE), 2.0)
        / (CAST(n_a AS DOUBLE) - 1.0)
        + pow(((CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)
                - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
               / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
              / CAST(n_b AS DOUBLE), 2.0)
        / (CAST(n_b AS DOUBLE) - 1.0))
      * 1e3, 0) AS BIGINT)
"""


def q_welch_ttest_price_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test of l_extendedprice between returned
    ('R') and non-returned ('N') line items — the A/B significance
    primitive of an experimentation pipeline. Output one row:
    (n_a, n_b, t_micro, df_milli).

    Exactness: prices snap to cents; the per-group sufficient
    statistics (n, Σx, Σx²) are exact DECIMAL(38,0) from ONE map-side-
    combined aggregate pass; the Welch t and Satterthwaite df are each
    a single shared terminal expression (module header contract).

    Scale shape: full scan → 1-row relation; no shuffle beyond the
    partial-agg exchange. pow(x, 2.0) on both engines is one IEEE
    multiply — identical."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "N")
    )
    x = _cents("l_extendedprice").cast("decimal(38,0)")
    is_a = F.col("l_returnflag") == "R"
    agg = li.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_a, x).otherwise(F.lit(0))).alias("s_a"),
        F.sum(F.when(~is_a, x).otherwise(F.lit(0))).alias("s_b"),
        F.sum(F.when(is_a, x * x).otherwise(F.lit(0))).alias("ss_a"),
        F.sum(F.when(~is_a, x * x).otherwise(F.lit(0))).alias("ss_b"),
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr(_WELCH_T).alias("t_micro"),
        F.expr(_WELCH_DF).alias("df_milli"),
    )


def _welch_sql() -> str:
    c = cents_sql("l_extendedprice")
    return f"""
    WITH agg AS (
      SELECT
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST({c} AS DECIMAL(38,0)) ELSE 0 END) AS s_a,
        SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST({c} AS DECIMAL(38,0)) ELSE 0 END) AS s_b,
        SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST({c} AS DECIMAL(38,0)) * CAST({c} AS DECIMAL(38,0))
                 ELSE 0 END) AS ss_a,
        SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST({c} AS DECIMAL(38,0)) * CAST({c} AS DECIMAL(38,0))
                 ELSE 0 END) AS ss_b
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    )
    SELECT n_a, n_b,
           {_WELCH_T} AS t_micro,
           {_WELCH_DF} AS df_milli
    FROM agg
"""


# --- Mann-Whitney U -----------------------------------------------------------


def q_mannwhitney_u_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) statistic comparing l_quantity between
    returned ('R') and non-returned ('N') line items — the
    nonparametric sibling of the Welch test, exact under ties. Output
    one row (n_a, n_b, u2_a, u2_b): U×2 stays integral because tied
    mid-ranks are half-integers (u2_a + u2_b = 2·n_a·n_b).

    Exactness: pure integer arithmetic end to end — no floating point
    at all. Tie handling via the value histogram: every row with value
    v gets mid-rank (2·cum_below + tot_v + 1)/2.

    Scale shape: the fact table reduces to a ≤50-row (value → counts)
    histogram in one partial agg; the cumulative window runs on that
    bounded relation (bounded-domain convention)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "N")
    )
    h = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = h.withColumn(
        "cum", F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("cum") + F.col("ca") + F.col("cb") + 1)
        ).alias("r2_a"),
    )
    return agg.select(
        "n_a",
        "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        ).alias("u2_b"),
    )


MANNWHITNEY_SQL = """
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    ranked AS (
      SELECT *, COALESCE(SUM(ca + cb) OVER
               (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS cum
      FROM h
    ),
    agg AS (
      SELECT SUM(ca) AS n_a, SUM(cb) AS n_b,
             SUM(ca * (2 * cum + ca + cb + 1)) AS r2_a
      FROM ranked
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b
    FROM agg
"""


# --- weight of evidence / information value -----------------------------------


_WOE_BAND = "CAST(least(floor(o_totalprice / 50000.0), 9.0) AS BIGINT)"


def q_woe_iv_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence and information-value contribution of each
    50k price band for predicting a fulfilled order (o_orderstatus =
    'F') — the credit-scoring feature-screening operator. Output per
    band: (band, n_good, n_bad, woe_micro, iv_micro).

    woe = ln(pct_good/pct_bad) = ln(ng·B) − ln(nb·G) computed on
    integer products through the deterministic ln (micro-nats); the iv
    term (pct_good − pct_bad)·woe is the shared terminal expression.

    Scale shape: fact scan → 10-band relation; totals broadcast back
    via a 1-row cross join."""
    o = load_table(spark, "orders", sf_dir)
    band = F.expr(_WOE_BAND)
    good = F.col("o_orderstatus") == "F"
    per = o.groupBy(band.alias("band")).agg(
        F.sum(F.when(good, 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(~good, 1).otherwise(0)).cast("long").alias("n_bad"),
    )
    tot = per.agg(
        F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb")
    )
    woe = (
        f"CAST(ROUND(({ln_int_sql('n_good * tb', 'spark')} - "
        f"{ln_int_sql('n_bad * tg', 'spark')}) * 1e6, 0) AS BIGINT)"
    )
    iv = (
        "CAST(ROUND((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)"
        " - CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))"
        f" * (({ln_int_sql('n_good * tb', 'spark')}) - "
        f"({ln_int_sql('n_bad * tg', 'spark')})) * 1e6, 0) AS BIGINT)"
    )
    guard = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_good",
            "n_bad",
            F.when(guard, F.expr(woe)).alias("woe_micro"),
            F.when(guard, F.expr(iv)).alias("iv_micro"),
        )
    )


def _woe_sql() -> str:
    woe = (
        f"CAST(ROUND(({ln_int_sql('n_good * tb', 'duckdb')} - "
        f"{ln_int_sql('n_bad * tg', 'duckdb')}) * 1e6, 0) AS BIGINT)"
    )
    iv = (
        "CAST(ROUND((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)"
        " - CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))"
        f" * (({ln_int_sql('n_good * tb', 'duckdb')}) - "
        f"({ln_int_sql('n_bad * tg', 'duckdb')})) * 1e6, 0) AS BIGINT)"
    )
    return f"""
    WITH per AS (
      SELECT {_WOE_BAND} AS band,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good,
             CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bad
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(n_good) AS tg, SUM(n_bad) AS tb FROM per)
    SELECT band, n_good, n_bad,
           CASE WHEN n_good > 0 AND n_bad > 0 THEN {woe} END AS woe_micro,
           CASE WHEN n_good > 0 AND n_bad > 0 THEN {iv} END AS iv_micro
    FROM per CROSS JOIN tot
"""


# --- two-regressor OLS --------------------------------------------------------


def _det3(a, b, c, d, e, f, g, h, i) -> str:
    """3x3 determinant over nine scalar SQL expressions — fixed
    association so both engines build the identical double tree."""
    return (
        f"(({a}) * (({e}) * ({i}) - ({f}) * ({h}))"
        f" - ({b}) * (({d}) * ({i}) - ({f}) * ({g}))"
        f" + ({c}) * (({d}) * ({h}) - ({e}) * ({g})))"
    )


def _ols2_terminals() -> tuple[str, str, str]:
    """beta0/beta1/beta2 of y ~ 1 + x1 + x2 by Cramer's rule over the
    normal-equation matrix, as shared SQL over the exact integer sums
    (cast to double ONCE each; every later op is correctly rounded)."""
    n, sx1, sx2 = "CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)"
    s11, s12, s22 = (
        "CAST(s11 AS DOUBLE)",
        "CAST(s12 AS DOUBLE)",
        "CAST(s22 AS DOUBLE)",
    )
    sy, s1y, s2y = (
        "CAST(sy AS DOUBLE)",
        "CAST(s1y AS DOUBLE)",
        "CAST(s2y AS DOUBLE)",
    )
    det = _det3(n, sx1, sx2, sx1, s11, s12, sx2, s12, s22)
    d0 = _det3(sy, sx1, sx2, s1y, s11, s12, s2y, s12, s22)
    d1 = _det3(n, sy, sx2, sx1, s1y, s12, sx2, s2y, s22)
    d2 = _det3(n, sx1, sy, sx1, s11, s1y, sx2, s12, s2y)
    return tuple(
        f"CAST(ROUND({dd} / {det} * 1e6, 0) AS BIGINT)" for dd in (d0, d1, d2)
    )


def q_ols_price_qty_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-regressor OLS: l_extendedprice(cents) ~ 1 + l_quantity +
    l_discount(cents), solved in closed form (normal equations, Cramer)
    — the multivariate sibling of ols_price_on_quantity. Output one
    row: (n, b0_micro, b1_micro, b2_micro), betas in micro-cents.

    Exactness: all nine sufficient statistics are exact DECIMAL(38,0)
    integer sums from ONE aggregate pass; the three determinant ratios
    are shared terminal expressions with fixed association (_det3).

    Scale shape: full scan → 1 row; map-side combinable."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_quantity").cast("long").alias("x1"),
        _cents("l_discount").alias("x2"),
        _cents("l_extendedprice").alias("y"),
    )
    d = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    agg = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d("x1")).alias("sx1"),
        F.sum(d("x2")).alias("sx2"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x1") * d("x1")).alias("s11"),
        F.sum(d("x1") * d("x2")).alias("s12"),
        F.sum(d("x2") * d("x2")).alias("s22"),
        F.sum(d("x1") * d("y")).alias("s1y"),
        F.sum(d("x2") * d("y")).alias("s2y"),
    )
    b0, b1, b2 = _ols2_terminals()
    return agg.select(
        "n",
        F.expr(b0).alias("b0_micro"),
        F.expr(b1).alias("b1_micro"),
        F.expr(b2).alias("b2_micro"),
    )


def _ols2_sql() -> str:
    b0, b1, b2 = _ols2_terminals()
    yc = cents_sql("l_extendedprice")
    x2c = cents_sql("l_discount")
    return f"""
    WITH base AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1, {x2c} AS x2, {yc} AS y
      FROM lineitem
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x1 AS DECIMAL(38,0))) AS sx1,
             SUM(CAST(x2 AS DECIMAL(38,0))) AS sx2,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(x1 AS DECIMAL(38,0))) AS s11,
             SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(x2 AS DECIMAL(38,0))) AS s12,
             SUM(CAST(x2 AS DECIMAL(38,0)) * CAST(x2 AS DECIMAL(38,0))) AS s22,
             SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS s1y,
             SUM(CAST(x2 AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS s2y
      FROM base
    )
    SELECT n, {b0} AS b0_micro, {b1} AS b1_micro, {b2} AS b2_micro
    FROM agg
"""


# --- grouped exact percentiles ------------------------------------------------


def q_agg_percentiles_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median and p90 of customer balance per
    nation — the grouped sibling of agg_percentiles_exact. Output
    (n_name, n_cust, median_bal, p90_bal), percentiles of integer
    cents rounded to 1 decimal (interpolation yields exact .0/.25/.5
    /.75 fractions, identical on both engines).

    Scale shape: customer ⋈ broadcast nation; percentile per group is
    a sort-based agg over each nation's customers — grouped by a
    25-value bounded key, no global window."""
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", _cents("c_acctbal").alias("bal")
    )
    pct = F.percentile("bal", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        j.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), pct.alias("_p"))
        .select(
            "n_name",
            "n_cust",
            F.round(F.element_at("_p", 1), 1).alias("median_bal"),
            F.round(F.element_at("_p", 2), 1).alias("p90_bal"),
        )
    )


PCT_BY_NATION_SQL = f"""
    WITH j AS (
      SELECT n_name, {cents_sql("c_acctbal")} AS bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(quantile_cont(bal, 0.5), 1) AS median_bal,
           ROUND(quantile_cont(bal, 0.9), 1) AS p90_bal
    FROM j GROUP BY 1
"""


# --- IQR outlier audit --------------------------------------------------------


def q_dq_outlier_iqr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit of event value per event type: exact
    q1/q3 of integer cents, fences at 1.5·IQR, and the count of rows
    outside them — the data-quality screen before a value column
    enters training. Output (event_type, n, n_outliers, q1, q3).

    Exactness: fences are doubles derived from exact integer-cents
    percentiles through the identical expression both sides (q1/q3
    interpolate to quarter-cents — exactly representable), so the
    boundary comparisons agree bitwise.

    Scale shape: two passes over events — a per-type percentile agg
    (bounded type domain) broadcast back onto the fact scan for the
    fence count. No window."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type", _cents("value").alias("v")
    )
    pct = F.percentile("v", F.array(F.lit(0.25), F.lit(0.75)))
    fences = (
        e.groupBy("event_type")
        .agg(pct.alias("_p"))
        .select(
            "event_type",
            F.element_at("_p", 1).alias("q1"),
            F.element_at("_p", 2).alias("q3"),
        )
        .withColumn(
            "lo", F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
        )
        .withColumn(
            "hi", F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
        )
    )
    out = (
        e.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi")), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.round(F.first("q1"), 1).alias("q1"),
            F.round(F.first("q3"), 1).alias("q3"),
        )
    )
    return out


IQR_OUTLIER_SQL = f"""
    WITH e AS (
      SELECT event_type, {cents_sql("value")} AS v FROM events
    ),
    fences AS (
      SELECT event_type,
             quantile_cont(v, 0.25) AS q1,
             quantile_cont(v, 0.75) AS q3,
             quantile_cont(v, 0.25)
               - 1.5 * (quantile_cont(v, 0.75) - quantile_cont(v, 0.25)) AS lo,
             quantile_cont(v, 0.75)
               + 1.5 * (quantile_cont(v, 0.75) - quantile_cont(v, 0.25)) AS hi
      FROM e GROUP BY 1
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v < lo OR v > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           ROUND(ANY_VALUE(q1), 1) AS q1, ROUND(ANY_VALUE(q3), 1) AS q3
    FROM e JOIN fences USING (event_type)
    GROUP BY 1
"""


# --- order backlog over time --------------------------------------------------


def q_orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog per day — the interval-stabbing running
    balance: an order opens at o_orderdate and closes after its last
    line item ships (max l_shipdate); orders with no line items stay
    open. Output (day, open_orders) for every day with a delta.

    Scale shape: facts reduce to ±1 deltas grouped by calendar day
    (bounded ~2.4k-day relation), and the prefix sum rides the
    two-pass global_running_sum chassis rather than an unpartitioned
    window, so the same plan holds when the day domain is wide."""
    from page_rank_mapreduce_java_spark.operators.ranking import (
        global_running_sum,
    )

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("open_day")
    )
    close = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
    )
    j = o.join(close, o.o_orderkey == close.l_orderkey, "left")
    opens = j.select(F.col("open_day").alias("day"), F.lit(1).alias("delta"))
    closes = j.filter(F.col("last_ship").isNotNull()).select(
        F.date_add("last_ship", 1).alias("day"), F.lit(-1).alias("delta")
    )
    daily = (
        opens.unionByName(closes)
        .groupBy("day")
        .agg(F.sum("delta").cast("long").alias("net"))
    )
    return global_running_sum(
        daily, "net", [F.asc("day")], out_col="open_orders"
    ).select("day", "open_orders")


BACKLOG_SQL = """
    WITH close AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT CAST(o_orderdate AS DATE) AS open_day, last_ship
      FROM orders LEFT JOIN close ON o_orderkey = l_orderkey
    ),
    deltas AS (
      SELECT open_day AS day, 1 AS delta FROM j
      UNION ALL
      SELECT last_ship + 1 AS day, -1 AS delta FROM j
      WHERE last_ship IS NOT NULL
    ),
    daily AS (
      SELECT day, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY 1
    )
    SELECT day,
           CAST(SUM(net) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_orders
    FROM daily
"""


# --- YoY monthly growth -------------------------------------------------------


def q_orders_yoy_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per calendar month: monthly
    revenue in exact cents, matched to the SAME month last year by an
    equi-join on (year-1, month) — correct even when the month series
    has gaps, and the inner join drops first-year months so the output
    has no NULLs. Output (year, month, revenue_cents, yoy_ppm).

    Scale shape: fact scan → ≤#months relation; the self-join runs on
    the bounded monthly relation, never on facts; the growth ratio
    divides doubles cast once from the exact integer cents."""
    o = load_table(spark, "orders", sf_dir)
    monthly = o.groupBy(
        F.year("o_orderdate").alias("year"), F.month("o_orderdate").alias("month")
    ).agg(F.sum(_cents("o_totalprice")).alias("revenue_cents"))
    prev = monthly.select(
        (F.col("year") + 1).alias("year"),
        "month",
        F.col("revenue_cents").alias("_prev"),
    )
    growth = (
        "CAST(ROUND((CAST(revenue_cents AS DOUBLE) - CAST(_prev AS DOUBLE))"
        " / CAST(_prev AS DOUBLE) * 1e6, 0) AS BIGINT)"
    )
    return monthly.join(prev, ["year", "month"]).select(
        "year", "month", "revenue_cents", F.expr(growth).alias("yoy_ppm")
    )


YOY_SQL = f"""
    WITH monthly AS (
      SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
             CAST(SUM({cents_sql("o_totalprice")}) AS BIGINT) AS revenue_cents
      FROM orders GROUP BY 1, 2
    ),
    prev AS (
      SELECT year + 1 AS year, month, revenue_cents AS _prev FROM monthly
    )
    SELECT CAST(m.year AS BIGINT) AS year, CAST(m.month AS BIGINT) AS month,
           m.revenue_cents,
           CAST(ROUND((CAST(m.revenue_cents AS DOUBLE) - CAST(_prev AS DOUBLE))
                / CAST(_prev AS DOUBLE) * 1e6, 0) AS BIGINT) AS yoy_ppm
    FROM monthly m JOIN prev p ON m.year = p.year AND m.month = p.month
"""


# --- nation revenue share -----------------------------------------------------


def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total order revenue in
    ppm — the classic contribution report. Output (n_name,
    revenue_cents, share_ppm).

    Scale shape: fact scan → 25-row bounded relation; the total rides
    a broadcast 1-row cross join (never a global window over facts)."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    per = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_cents("o_totalprice")).alias("revenue_cents"))
    )
    tot = per.agg(F.sum("revenue_cents").alias("tot"))
    share = (
        "CAST(ROUND(CAST(revenue_cents AS DOUBLE) * 1e6"
        " / CAST(tot AS DOUBLE), 0) AS BIGINT)"
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "n_name", "revenue_cents", F.expr(share).alias("share_ppm")
    )


NATION_SHARE_SQL = f"""
    WITH per AS (
      SELECT n_name,
             CAST(SUM({cents_sql("o_totalprice")}) AS BIGINT) AS revenue_cents
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    ),
    tot AS (SELECT SUM(revenue_cents) AS tot FROM per)
    SELECT n_name, revenue_cents,
           CAST(ROUND(CAST(revenue_cents AS DOUBLE) * 1e6
                / CAST(tot AS DOUBLE), 0) AS BIGINT) AS share_ppm
    FROM per CROSS JOIN tot
"""


# --- rolling z-score ----------------------------------------------------------


_ZSCORE = """
    CAST(ROUND(
      (CAST(c AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0)
      / sqrt(NULLIF((7.0 * CAST(ss7 AS DOUBLE)
                     - CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE)) / 7.0 / 6.0,
                    0.0))
      * 1e6, 0) AS BIGINT)
"""


def q_events_rolling_zscore7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day z-score of daily event volume — the rolling
    anomaly score. Only full 7-day windows emit; z NULL when the window
    variance is zero. Output (day, c, z_micro).

    Exactness: window sums of c and c² are integer; the z terminal is
    ONE shared expression (module contract).

    Scale shape: events reduce to the calendar-bounded day series
    first; the trailing window runs on that bounded relation
    (bounded-domain convention)."""
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _daily_counts,
    )

    daily = _daily_counts(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(-6, 0)
    d = (
        daily.withColumn("s7", F.sum("c").over(w))
        .withColumn("ss7", F.sum(F.col("c") * F.col("c")).over(w))
        .withColumn("k7", F.count(F.lit(1)).over(w))
        .filter(F.col("k7") == 7)
    )
    return d.select("day", "c", F.expr(_ZSCORE).alias("z_micro"))


def _zscore_sql() -> str:
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _DAILY_SQL,
    )

    return f"""
    WITH daily AS ({_DAILY_SQL}),
    w AS (
      SELECT day, c,
             SUM(c) OVER win AS s7,
             SUM(c * c) OVER win AS ss7,
             COUNT(*) OVER win AS k7
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, c, {_ZSCORE} AS z_micro
    FROM w WHERE k7 = 7
"""


# --- day-of-week x hour heatmap -----------------------------------------------


def q_events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event volume heatmap over (weekday, hour) — the 7×24 activity
    fingerprint. weekday is ISO Monday=0 on both engines. Output
    (dow, hour, cnt, share_ppm).

    Scale shape: one partial-agg pass → 168-row bounded relation;
    total via broadcast cross join."""
    e = load_table(spark, "events", sf_dir)
    per = e.groupBy(
        F.expr("weekday(ts)").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = per.agg(F.sum("cnt").alias("tot"))
    share = (
        "CAST(ROUND(CAST(cnt AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0)"
        " AS BIGINT)"
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "dow", "hour", "cnt", F.expr(share).alias("share_ppm")
    )


DOW_HOUR_SQL = """
    WITH per AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hour,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(cnt) AS tot FROM per)
    SELECT dow, hour, cnt,
           CAST(ROUND(CAST(cnt AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0)
                AS BIGINT) AS share_ppm
    FROM per CROSS JOIN tot
"""


# --- multi-lag autocorrelation ------------------------------------------------


_ACF_LAGS = [1, 2, 3, 7]

_ACF_TERMINAL = """
    COALESCE(CAST(ROUND(
      try_divide(
        CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE),
        sqrt(GREATEST(
          (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
          0.0)))
      * 1e6, 0) AS BIGINT), -2000000)
"""


def q_events_acf_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event volume at lags 1/2/3/7 — the ACF
    panel behind seasonality diagnosis (lag-7 high + lag-1 low = weekly
    structure). Pairs join on integer day index, so only days actually
    present pair up (gap-robust). Output (lag, n, acf_ppm).

    Exactness: the per-lag sufficient statistics are exact integer
    sums; the Pearson terminal is the corr-family shared expression
    (try_divide + GREATEST clamp — the ADVICE r6 zero-variance guard).

    Scale shape: ONE day-series reduction feeds all four lags via an
    explode; the pair join and stats run on the bounded day relation."""
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _daily_counts,
    )

    daily = _daily_counts(spark, sf_dir).select(
        F.datediff("day", F.lit("1990-01-01").cast("date")).alias("didx"),
        F.col("c"),
    )
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in _ACF_LAGS])).alias("lag")
    )
    a = daily.crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("didx").alias("didx2"), F.col("c").alias("c2")
    )
    pairs = a.join(b, a.didx + a.lag == b.didx2)
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum("c2").alias("sy"),
        F.sum(F.col("c") * F.col("c")).alias("sxx"),
        F.sum(F.col("c2") * F.col("c2")).alias("syy"),
        F.sum(F.col("c") * F.col("c2")).alias("sxy"),
    )
    return agg.select(
        F.col("lag").cast("long").alias("lag"),
        "n",
        F.expr(_ACF_TERMINAL).alias("acf_ppm"),
    )


# DuckDB rendering of the same terminal: try_divide(a, d) ≡
# a / NULLIF(d, 0) — numerator, divisor, clamp, and rounding are the
# identical double tree, only the null-on-zero spelling differs.
_ACF_TERMINAL_DUCK = """
    COALESCE(CAST(ROUND(
      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      / NULLIF(
        sqrt(GREATEST(
          (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
          0.0)), 0.0)
      * 1e6, 0) AS BIGINT), -2000000)
"""


def _acf_sql() -> str:
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _DAILY_SQL,
    )

    terminal = _ACF_TERMINAL_DUCK
    return f"""
    WITH daily0 AS ({_DAILY_SQL}),
    daily AS (
      SELECT datediff('day', DATE '1990-01-01', day) AS didx, c FROM daily0
    ),
    pairs AS (
      SELECT l.lag, a.c AS c, b.c AS c2
      FROM daily a
        CROSS JOIN (SELECT unnest([{", ".join(map(str, _ACF_LAGS))}]) AS lag) l
        JOIN daily b ON a.didx + l.lag = b.didx
    ),
    agg AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(c) AS sx, SUM(c2) AS sy,
             SUM(c * c) AS sxx, SUM(c2 * c2) AS syy, SUM(c * c2) AS sxy
      FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag, n, {terminal} AS acf_ppm
    FROM agg
"""


# --- KMV intersection sketch --------------------------------------------------


KMV_INTER_K = 256


def q_sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between 'click' and 'view' via KMV
    sketches and inclusion–exclusion: est(∩) = est(click) + est(view)
    − est(∪) — the mergeable-sketch answer to "how many users do two
    segments share" without an exact distinct join. Output one row
    (est_click, est_view, est_union, est_intersection).

    Deterministic (portable md5 hash family — the agg_kmv_distinct
    estimator), so the DuckDB oracle reproduces it bit-for-bit.

    Scale shape: one fact scan fans each row to its set and the union
    set; one distinct shuffle on (set, hash); k-smallest per set rides
    the two-pass global ranking chassis."""
    from page_rank_mapreduce_java_spark.functions.hashes import md5_long
    from page_rank_mapreduce_java_spark.operators.ranking import (
        global_row_number,
    )

    e = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("click", "view")
    )
    d = e.select(
        F.explode(F.array(F.col("event_type"), F.lit("union"))).alias(
            "set_name"
        ),
        md5_long(F.col("user_id").cast("string")).alias("hv"),
    ).distinct()
    r = global_row_number(d, [F.asc("set_name"), F.asc("hv")], out_col="_grn")
    off = r.groupBy("set_name").agg((F.min("_grn") - 1).alias("_off"))
    kept = r.join(F.broadcast(off), "set_name").filter(
        F.col("_grn") - F.col("_off") <= KMV_INTER_K
    )
    agg = kept.groupBy("set_name").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("hk")
    )
    est = F.when(F.col("n_kept") < KMV_INTER_K, F.col("n_kept")).otherwise(
        F.round(
            F.lit(float(KMV_INTER_K - 1))
            * F.lit(float(2**60))
            / F.col("hk").cast("double")
        ).cast("long")
    )
    ests = agg.select("set_name", est.cast("long").alias("est"))
    one = ests.agg(
        F.max(F.when(F.col("set_name") == "click", F.col("est"))).alias(
            "est_click"
        ),
        F.max(F.when(F.col("set_name") == "view", F.col("est"))).alias(
            "est_view"
        ),
        F.max(F.when(F.col("set_name") == "union", F.col("est"))).alias(
            "est_union"
        ),
    )
    return one.select(
        "est_click",
        "est_view",
        "est_union",
        (F.col("est_click") + F.col("est_view") - F.col("est_union")).alias(
            "est_intersection"
        ),
    )


def _kmv_inter_sql() -> str:
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
      FROM ranked WHERE pos <= {KMV_INTER_K} GROUP BY set_name
    ),
    ests AS (
      SELECT set_name,
             CAST(CASE WHEN n_kept < {KMV_INTER_K} THEN n_kept
                  ELSE CAST(ROUND({float(KMV_INTER_K - 1)} * {float(2**60)}
                                 / CAST(hk AS DOUBLE), 0) AS BIGINT)
                  END AS BIGINT) AS est
      FROM agg
    ),
    one AS (
      SELECT MAX(CASE WHEN set_name = 'click' THEN est END) AS est_click,
             MAX(CASE WHEN set_name = 'view' THEN est END) AS est_view,
             MAX(CASE WHEN set_name = 'union' THEN est END) AS est_union
      FROM ests
    )
    SELECT est_click, est_view, est_union,
           est_click + est_view - est_union AS est_intersection
    FROM one
"""


# --- broadcast band range join ------------------------------------------------


def q_join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding via a range join against a generated 10-row band
    dimension (lo ≤ price < hi) — the broadcast theta-join pattern for
    rating tables / tariff schedules that aren't equi-expressible in
    general. Output (band, n_orders, revenue_cents).

    Scale shape: the band dim broadcasts (BroadcastNestedLoopJoin over
    10 rows ≈ a map-side predicate); the aggregate is partial. When a
    schedule IS floor-expressible (like this demo's uniform bands) the
    equi form is cheaper — the point here is the non-equi plan shape
    staying broadcast, never a shuffled cartesian."""
    bands = spark.range(10).select(
        F.col("id").alias("band"),
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0).alias("hi"),
    )
    o = load_table(spark, "orders", sf_dir)
    j = o.join(
        F.broadcast(bands),
        (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_cents("o_totalprice")).alias("revenue_cents"),
    )


RANGE_BANDS_SQL = f"""
    WITH bands AS (
      SELECT i AS band, i * 50000.0 AS lo, (i + 1) * 50000.0 AS hi
      FROM range(10) t(i)
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({cents_sql("o_totalprice")}) AS BIGINT) AS revenue_cents
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY 1
"""


QUERIES = {
    "welch_ttest_price_flag": q_welch_ttest_price_flag,
    "mannwhitney_u_quantity": q_mannwhitney_u_quantity,
    "woe_iv_price_bands": q_woe_iv_price_bands,
    "ols_price_qty_disc": q_ols_price_qty_disc,
    "agg_percentiles_by_nation": q_agg_percentiles_by_nation,
    "dq_outlier_iqr_by_type": q_dq_outlier_iqr_by_type,
    "orders_open_backlog_daily": q_orders_open_backlog_daily,
    "orders_yoy_monthly_growth": q_orders_yoy_monthly_growth,
    "nation_revenue_share": q_nation_revenue_share,
    "events_rolling_zscore7": q_events_rolling_zscore7,
    "events_dow_hour_heatmap": q_events_dow_hour_heatmap,
    "events_acf_multi": q_events_acf_multi,
    "sketch_kmv_intersection": q_sketch_kmv_intersection,
    "join_range_price_bands": q_join_range_price_bands,
}

ORACLES = {
    "welch_ttest_price_flag": _welch_sql(),
    "mannwhitney_u_quantity": MANNWHITNEY_SQL,
    "woe_iv_price_bands": _woe_sql(),
    "ols_price_qty_disc": _ols2_sql(),
    "agg_percentiles_by_nation": PCT_BY_NATION_SQL,
    "dq_outlier_iqr_by_type": IQR_OUTLIER_SQL,
    "orders_open_backlog_daily": BACKLOG_SQL,
    "orders_yoy_monthly_growth": YOY_SQL,
    "nation_revenue_share": NATION_SHARE_SQL,
    "events_rolling_zscore7": _zscore_sql(),
    "events_dow_hour_heatmap": DOW_HOUR_SQL,
    "events_acf_multi": _acf_sql(),
    "sketch_kmv_intersection": _kmv_inter_sql(),
    "join_range_price_bands": RANGE_BANDS_SQL,
}
