"""Relational/analytics surface, batch 14 (round 7): time-bounded
funnel, weighted median, per-user burstiness top-k, MAD-based daily
anomaly flags, the supplier→customer nation flow matrix, and interval-
union coverage — the remaining "operator shapes" the registry lacked
(ordered-sequence-with-deadline, weighted order statistic, robust
outlier flagging on a series, the bounded star-join matrix, interval
stabbing's union-length dual).

Beyond-reference extension surface (SURVEY §2.9). Exactness follows
the module-13 contract: integer accumulation everywhere, one shared
terminal expression per floating result, percentiles only over
integers, deterministic tie-breaks.

Scale shape: funnels/intervals/burstiness window per USER/CUSTOMER
(high-cardinality keyed windows — never a global order); the MAD flags
and weighted median run on bounded relations (calendar days, the
50-value quantity histogram); the flow matrix is two broadcast-dim
star joins reduced to a ≤625-row matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql


# --- time-bounded funnel ------------------------------------------------------

FUNNEL_WINDOW_MIN = 60


def q_events_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel view → click → purchase: a user converts a step
    only if it happens within 60 minutes of the PREVIOUS step (first
    qualifying occurrence each time — the standard product-analytics
    semantics, stricter than the unconstrained funnel in
    events_funnel_conversion). Output one row (n_view, n_view_click,
    n_full_funnel).

    Scale shape: three first-occurrence aggregates keyed on user_id
    (min over filtered joins — each an equi-join on the user key plus
    a time predicate); no window at all, so nothing orders fact-scale
    data."""
    e = load_table(spark, "events", sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("t_c")
    )
    first_click = (
        c.join(v, "user_id")
        .filter(
            (F.col("t_c") > F.col("t_view"))
            & (
                F.col("t_c")
                <= F.col("t_view") + F.expr(f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTES")
            )
        )
        .groupBy("user_id")
        .agg(F.min("t_c").alias("t_click"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("t_p")
    )
    full = (
        p.join(first_click, "user_id")
        .filter(
            (F.col("t_p") > F.col("t_click"))
            & (
                F.col("t_p")
                <= F.col("t_click")
                + F.expr(f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTES")
            )
        )
        .select("user_id")
        .distinct()
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(
            F.broadcast(first_click.agg(F.count(F.lit(1)).alias("n_view_click")))
        )
        .crossJoin(F.broadcast(full.agg(F.count(F.lit(1)).alias("n_full_funnel"))))
    )


FUNNEL_TB_SQL = f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    fc AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
      GROUP BY 1
    ),
    full_f AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN fc ON e.user_id = fc.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fc.t_click
        AND e.ts <= fc.t_click + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM fc) AS n_view_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM full_f) AS n_full_funnel
"""


# --- weighted median ----------------------------------------------------------


def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted median of l_quantity: the quantity value at
    which half the revenue (cents) sits at-or-below — lower weighted
    median convention (smallest v with cumweight ≥ half). Output one
    row (wmedian_qty, total_weight_cents).

    Exactness: weights are exact integer cents; the half-total
    comparison is integer×2 (2·cum ≥ tot), so no floating point
    anywhere.

    Scale shape: fact scan → ≤50-row (value, weight) histogram; the
    cumulative window runs on that bounded relation."""
    li = load_table(spark, "lineitem", sf_dir)
    h = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(_cents("l_extendedprice")).alias("w")
    )
    win = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = h.withColumn("cum", F.sum("w").over(win))
    tot = h.agg(F.sum("w").alias("tot"))
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(2 * F.col("cum") >= F.col("tot"))
        .agg(
            F.min("v").alias("wmedian_qty"),
            F.first("tot").alias("total_weight_cents"),
        )
    )


WMEDIAN_SQL = f"""
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(SUM({cents_sql("l_extendedprice")}) AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT v, w, SUM(w) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM h
    ),
    tot AS (SELECT SUM(w) AS tot FROM h)
    SELECT CAST(MIN(v) AS BIGINT) AS wmedian_qty,
           CAST(ANY_VALUE(tot) AS BIGINT) AS total_weight_cents
    FROM c CROSS JOIN tot WHERE 2 * cum >= tot
"""


# --- per-user burstiness ------------------------------------------------------

CV_MIN_EVENTS = 20
CV_TOP_K = 25

# Shared CV terminal over integer (n, Σgap, Σgap²) — sample std over
# mean, micro-scaled. One expression, both engines.
_CV = """
    CAST(ROUND(
      sqrt(GREATEST((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 0.0))
      / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      * 1e6, 0) AS BIGINT)
"""


def q_events_user_interevent_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 burstiest users by coefficient of variation of their
    inter-event gaps (CV ≫ 1 = bursty, CV ≈ 1 = Poisson-like, the
    per-entity refinement of the corpus-level events_burstiness).
    Users with < 20 gaps never rank. Output (user_id, n_gaps,
    cv_micro), ties on user_id.

    Exactness: gaps are exact integer MICROseconds (unix_micros ==
    epoch_us, the module-10 convention); n/Σ/Σ² accumulate as integers
    (Σgap² ≈ 10²⁸ rides DECIMAL(38,0)); CV is the one shared terminal
    expression — and scale-invariant, so the µs unit cancels.

    Scale shape: the lag window partitions by USER (high-cardinality
    keyed window convention); top-25 is TakeOrderedAndProject."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", F.unix_micros("ts").alias("t")
    )
    # Tie order within equal timestamps is irrelevant: the gap MULTISET
    # between consecutive members of a sorted multiset is permutation-
    # invariant (equal keys contribute 0-gaps either way).
    w = Window.partitionBy("user_id").orderBy("t")
    gaps = (
        e.withColumn("gap", F.col("t") - F.lag("t").over(w))
        .filter(F.col("gap").isNotNull())
    )
    g = F.col("gap").cast("decimal(38,0)")
    agg = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(g).alias("s"),
            F.sum(g * g).alias("ss"),
        )
        .filter((F.col("n") >= CV_MIN_EVENTS) & (F.col("s") > 0))
    )
    return (
        agg.select(
            "user_id",
            F.col("n").alias("n_gaps"),
            F.expr(_CV).alias("cv_micro"),
        )
        .orderBy(F.desc("cv_micro"), F.asc("user_id"))
        .limit(CV_TOP_K)
    )


USER_CV_SQL = f"""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
      FROM events
    ),
    agg AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(gap AS DECIMAL(38,0))) AS s,
             SUM(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
               AS ss
      FROM g WHERE gap IS NOT NULL GROUP BY 1
      HAVING COUNT(*) >= {CV_MIN_EVENTS} AND SUM(gap) > 0
    )
    SELECT user_id, n AS n_gaps, {_CV} AS cv_micro
    FROM agg ORDER BY cv_micro DESC, user_id LIMIT {CV_TOP_K}
"""


# --- MAD anomaly flags --------------------------------------------------------

MAD_Z_THRESHOLD_MILLI = 2000  # "investigate" level; the 3.5
# Iglewicz-Hoaglin cut flags nothing on the synthetic series (max
# modified z ~2.5 at sf0.01) and a forever-empty relation is no
# evidence at all


def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomalies by the robust MAD rule: flag days where
    0.6745·|c − median| / MAD > 2.0 (the Iglewicz–Hoaglin modified z at the investigate level) —
    the outlier screen that a mean/σ rule would let mask itself.
    Output the flagged days only: (day, c, mz_milli).

    Exactness: median and MAD are exact percentiles over integer
    counts (bounded day relation); the modified z is one shared
    terminal expression; the 2.0 investigate-level threshold
    (MAD_Z_THRESHOLD_MILLI) compares the ROUNDED integer milli-z on
    both engines, so the flag set is identical even at the boundary.

    Scale shape: fact scan → bounded day series; two bounded
    percentile aggregates broadcast back."""
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _daily_counts,
    )

    daily = _daily_counts(spark, sf_dir)
    med = daily.agg(F.percentile("c", F.lit(0.5)).alias("med"))
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day",
        "c",
        F.abs(F.col("c") - F.col("med")).alias("ad"),
        "med",
    )
    mad = dev.agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    mz = (
        "CAST(ROUND(0.6745 * abs(CAST(c AS DOUBLE) - med)"
        " / NULLIF(mad, 0.0) * 1e3, 0) AS BIGINT)"
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .withColumn("mz_milli", F.expr(mz))
        .filter(F.col("mz_milli") > MAD_Z_THRESHOLD_MILLI)
        .select("day", "c", "mz_milli")
    )


def _mad_sql() -> str:
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _DAILY_SQL,
    )

    return f"""
    WITH daily AS ({_DAILY_SQL}),
    med AS (SELECT quantile_cont(c, 0.5) AS med FROM daily),
    dev AS (
      SELECT day, c, abs(c - med) AS ad, med FROM daily CROSS JOIN med
    ),
    mad AS (SELECT quantile_cont(ad, 0.5) AS mad FROM dev)
    SELECT day, c,
           CAST(ROUND(0.6745 * abs(CAST(c AS DOUBLE) - med)
                / NULLIF(mad, 0.0) * 1e3, 0) AS BIGINT) AS mz_milli
    FROM dev CROSS JOIN mad
    WHERE CAST(ROUND(0.6745 * abs(CAST(c AS DOUBLE) - med)
               / NULLIF(mad, 0.0) * 1e3, 0) AS BIGINT)
          > {MAD_Z_THRESHOLD_MILLI}
"""


# --- nation flow matrix -------------------------------------------------------


def q_supplier_nation_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-flow matrix: revenue by (supplier nation → customer
    nation) — the full 25×25 generalization of TPC-H q7's two-nation
    slice. Output (supp_nation, cust_nation, revenue_cents).

    Scale shape: the classic star join — lineitem picks up its
    supplier's nation and its order's customer's nation via BROADCAST
    dims (supplier/customer are dims here; nation doubly so), then one
    partial-agg reduction to the ≤625-row matrix. No fact-fact
    shuffle except lineitem ⋈ orders on the order key."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", _cents("l_extendedprice").alias("rev")
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    s = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(n.withColumnsRenamed({"n_name": "supp_nation"})),
            s.s_nationkey == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(
                n.withColumnsRenamed(
                    {"n_nationkey": "nk2", "n_name": "cust_nation"}
                )
            ),
            c.c_nationkey == F.col("nk2"),
        )
    )
    return j.groupBy("supp_nation", "cust_nation").agg(
        F.sum("rev").alias("revenue_cents")
    )


FLOW_SQL = f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(SUM({cents_sql("l_extendedprice")}) AS BIGINT)
             AS revenue_cents
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
    GROUP BY 1, 2
"""


# --- interval-union coverage --------------------------------------------------

COVERAGE_TOP_K = 25


def q_interval_coverage_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 customers by total ACTIVE days — the union length of
    their order intervals [o_orderdate, last line-item ship date],
    overlaps merged (the interval-union dual of the backlog's interval
    stabbing). Orders with no line items (or shipments before the
    order date — the synthetic corpus has them) contribute the 1-day
    interval [orderdate, orderdate]. Output (c_custkey, covered_days),
    ties on custkey.

    Scale shape: classic sweep per key — sort each CUSTOMER's
    intervals by start (keyed window, high-cardinality), carry the
    running max end, a new island starts when start > max-so-far;
    island lengths reduce per customer. Top-25 is
    TakeOrderedAndProject."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").cast("date").alias("lo"),
    )
    close = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("ship"))
    )
    iv = (
        o.join(close, o.o_orderkey == close.l_orderkey, "left")
        .select(
            "ck",
            "lo",
            F.greatest(F.coalesce(F.col("ship"), F.col("lo")), F.col("lo")).alias(
                "hi"
            ),
        )
    )
    w = Window.partitionBy("ck").orderBy("lo", "hi").rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = iv.withColumn(
        "prev_max", F.max("hi").over(w)
    ).withColumn(
        "new_island",
        F.when(
            F.col("prev_max").isNull() | (F.col("lo") > F.col("prev_max")), 1
        ).otherwise(0),
    )
    w2 = Window.partitionBy("ck").orderBy("lo", "hi").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = marked.withColumn("grp", F.sum("new_island").over(w2))
    merged = islands.groupBy("ck", "grp").agg(
        F.min("lo").alias("s"), F.max("hi").alias("e")
    )
    cov = merged.groupBy("ck").agg(
        F.sum(F.datediff("e", "s") + 1).alias("covered_days")
    )
    return (
        cov.orderBy(F.desc("covered_days"), F.asc("ck"))
        .limit(COVERAGE_TOP_K)
        .select(F.col("ck").alias("c_custkey"), "covered_days")
    )


COVERAGE_SQL = f"""
    WITH close AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS ship
      FROM lineitem GROUP BY 1
    ),
    iv AS (
      SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS lo,
             GREATEST(COALESCE(ship, CAST(o_orderdate AS DATE)),
                      CAST(o_orderdate AS DATE)) AS hi
      FROM orders LEFT JOIN close ON o_orderkey = l_orderkey
    ),
    marked AS (
      SELECT ck, lo, hi,
             CASE WHEN MAX(hi) OVER (PARTITION BY ck ORDER BY lo, hi
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR lo > MAX(hi) OVER (PARTITION BY ck ORDER BY lo, hi
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT ck, lo, hi,
             SUM(new_island) OVER (PARTITION BY ck ORDER BY lo, hi
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM marked
    ),
    merged AS (
      SELECT ck, grp, MIN(lo) AS s, MAX(hi) AS e
      FROM islands GROUP BY 1, 2
    ),
    cov AS (
      SELECT ck, CAST(SUM(datediff('day', s, e) + 1) AS BIGINT)
               AS covered_days
      FROM merged GROUP BY 1
    )
    SELECT ck AS c_custkey, covered_days
    FROM cov ORDER BY covered_days DESC, c_custkey LIMIT {COVERAGE_TOP_K}
"""


# --- customer segment migration -----------------------------------------------

_TERCILES = [repr(1 / 3), repr(2 / 3)]  # identical double literals both engines


def q_customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer spend-tercile migration matrix: each
    customer's annual spend places them in a within-year tercile
    (1=low, 3=high); the matrix counts (tercile@Y → tercile@Y+1)
    transitions over all consecutive year pairs — the churn/upgrade
    flow report. Output (seg_from, seg_to, n_customers), ≤9 rows;
    customers absent in either year don't transition.

    Exactness: spend is integer cents; tercile boundaries are
    percentiles over integers with the identical interpolation and the
    identical 1/3, 2/3 double literals on both engines; boundary
    comparisons are shared expressions.

    Scale shape: orders → (customer, year) spend (one partial agg);
    per-year tercile boundaries are a bounded #years-row relation
    broadcast back; the transition join is per-customer on
    (custkey, year+1). No window anywhere."""
    o = load_table(spark, "orders", sf_dir)
    spend = o.groupBy(
        F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("yr")
    ).agg(F.sum(_cents("o_totalprice")).alias("s"))
    pct = F.percentile(
        "s", F.array(F.lit(float(_TERCILES[0])), F.lit(float(_TERCILES[1])))
    )
    bounds = spend.groupBy("yr").agg(pct.alias("_p")).select(
        "yr",
        F.element_at("_p", 1).alias("t1"),
        F.element_at("_p", 2).alias("t2"),
    )
    seg = (
        spend.join(F.broadcast(bounds), "yr")
        .select(
            "ck",
            "yr",
            F.when(F.col("s") <= F.col("t1"), 1)
            .when(F.col("s") <= F.col("t2"), 2)
            .otherwise(3)
            .alias("seg"),
        )
    )
    nxt = seg.select(
        F.col("ck").alias("ck2"),
        (F.col("yr") - 1).alias("yr2"),
        F.col("seg").alias("seg_to"),
    )
    trans = seg.join(
        nxt, (seg.ck == nxt.ck2) & (seg.yr == nxt.yr2)
    )
    return trans.groupBy(
        F.col("seg").alias("seg_from"), "seg_to"
    ).agg(F.count(F.lit(1)).alias("n_customers"))


MIGRATION_SQL = f"""
    WITH spend AS (
      SELECT o_custkey AS ck, year(o_orderdate) AS yr,
             CAST(SUM({cents_sql("o_totalprice")}) AS BIGINT) AS s
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (
      SELECT yr, quantile_cont(s, {_TERCILES[0]}) AS t1,
             quantile_cont(s, {_TERCILES[1]}) AS t2
      FROM spend GROUP BY 1
    ),
    seg AS (
      SELECT ck, yr,
             CASE WHEN s <= t1 THEN 1 WHEN s <= t2 THEN 2 ELSE 3 END AS seg
      FROM spend JOIN bounds USING (yr)
    )
    SELECT a.seg AS seg_from, b.seg AS seg_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM seg a JOIN seg b ON a.ck = b.ck AND b.yr = a.yr + 1
    GROUP BY 1, 2
"""


# --- ABC classification -------------------------------------------------------


def q_orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of parts by revenue: class A =
    parts whose cumulative revenue share (descending, inclusive) stays
    within 80%, B within 95%, C the tail — the Pareto operator's
    3-class rollup. Output (abc_class, n_parts, revenue_cents).

    Exactness: the class cuts compare integers cross-multiplied
    (5·cum ≤ 4·tot and 20·cum ≤ 19·tot) — no floating point.

    Scale shape: part revenues are fact-scale, so the descending
    prefix sum rides the two-pass global_running_sum chassis (never a
    single-partition window); the classification reduces to 3 rows."""
    from page_rank_mapreduce_java_spark.operators.ranking import (
        global_running_sum,
    )

    li = load_table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(_cents("l_extendedprice")).alias("rev")
    )
    cum = global_running_sum(
        rev, "rev", [F.desc("rev"), F.asc("l_partkey")], out_col="cum"
    )
    tot = rev.agg(F.sum("rev").alias("tot"))
    cls = (
        F.when(5 * F.col("cum") <= 4 * F.col("tot"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("tot"), "B")
        .otherwise("C")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(cls.alias("abc_class"), "rev")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").alias("revenue_cents"),
        )
    )


ABC_SQL = f"""
    WITH rev AS (
      SELECT l_partkey, CAST(SUM({cents_sql("l_extendedprice")}) AS BIGINT)
               AS rev
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT rev, SUM(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    ),
    tot AS (SELECT SUM(rev) AS tot FROM rev)
    SELECT CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                WHEN 20 * cum <= 19 * tot THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS BIGINT) AS revenue_cents
    FROM cum CROSS JOIN tot GROUP BY 1
"""


# --- as-of join with staleness tolerance --------------------------------------

ASOF_TOLERANCE_SEC = 7200  # 2-hour attribution window


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a max-staleness bound: each purchase
    matches the same user's latest click at-or-before it ONLY if that
    click is at most 2 hours old — the bounded attribution window
    every production as-of carries (a stale match is worse than no
    match; the unbounded variant is join_asof_latest_order). Output
    (event_id, user_id, click_id, staleness_sec).

    Scale shape: identical cost envelope to join_asof_latest_order
    (one union-sort exchange via operators/asof.asof_join); the
    matched timestamp rides along as a second payload column, and the
    tolerance is a post-filter — no extra shuffle. Staleness is exact
    integer seconds (unix_micros div 1e6 — the module-10 µs
    convention)."""
    from page_rank_mapreduce_java_spark.operators.asof import asof_join

    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("matched_us", F.unix_micros("ts"))
    )
    j = asof_join(
        p,
        c,
        on="user_id",
        ts="ts",
        payload=["click_id", "matched_us"],
        tiebreak=["event_id"],
    )
    stale = (F.unix_micros("ts") - F.col("matched_us")).alias("_d")
    return (
        j.withColumn("_d", stale)
        .filter(F.col("_d") <= ASOF_TOLERANCE_SEC * 1_000_000)
        .select(
            "event_id",
            "user_id",
            "click_id",
            (F.col("_d") / F.lit(1_000_000)).cast("long").alias("staleness_sec"),
        )
    )


ASOF_TOL_SQL = f"""
    WITH c AS (
      SELECT user_id AS k, ts AS cts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.event_id, p.user_id, c.click_id,
           CAST((epoch_us(p.ts) - epoch_us(c.cts)) // 1000000 AS BIGINT)
             AS staleness_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN c ON p.user_id = c.k AND p.ts >= c.cts
    WHERE epoch_us(p.ts) - epoch_us(c.cts)
          <= CAST({ASOF_TOLERANCE_SEC} AS BIGINT) * 1000000
"""


QUERIES = {
    "events_funnel_time_bound": q_events_funnel_time_bound,
    "agg_weighted_median": q_agg_weighted_median,
    "events_user_interevent_cv": q_events_user_interevent_cv,
    "events_anomaly_mad": q_events_anomaly_mad,
    "supplier_nation_flow": q_supplier_nation_flow,
    "interval_coverage_days": q_interval_coverage_days,
    "customer_migration_matrix": q_customer_migration_matrix,
    "orders_abc_classification": q_orders_abc_classification,
    "join_asof_tolerance": q_join_asof_tolerance,
}

ORACLES = {
    "events_funnel_time_bound": FUNNEL_TB_SQL,
    "agg_weighted_median": WMEDIAN_SQL,
    "events_user_interevent_cv": USER_CV_SQL,
    "events_anomaly_mad": _mad_sql(),
    "supplier_nation_flow": FLOW_SQL,
    "interval_coverage_days": COVERAGE_SQL,
    "customer_migration_matrix": MIGRATION_SQL,
    "orders_abc_classification": ABC_SQL,
    "join_asof_tolerance": ASOF_TOL_SQL,
}
