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
from page_rank_mapreduce_java_spark.plans.pairsize import (
    sum_sq_group_bound,
    volume_repartition_pairs,
)
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


# --- Pareto concentration -----------------------------------------------------


def q_orders_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 concentration summary of customer revenue: how many
    top customers cover ≥ 80% of total revenue, and the exact share
    they hold. The threshold test is pure integer cross-multiplication
    (5·cum ≥ 4·total), so k is exact; only the final share ppm divides.
    Output: (n_customers, k_top, topk_cents, total_cents, share_ppm).

    Scale shape: one fact aggregate to per-customer revenue, then the
    sign-safe two-pass prefix-sum chassis (operators/ranking.
    global_running_sum — range partition + per-partition window +
    broadcast offsets, never a single-task global window), one 1-row
    broadcast, one closing aggregate."""
    from page_rank_mapreduce_java_spark.operators.ranking import (
        global_running_sum,
    )

    rev = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).alias("r"))
    )
    tot = rev.agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("r").alias("total_cents")
    )
    cum = global_running_sum(
        rev, "r", [F.desc("r"), F.asc("o_custkey")], out_col="cum"
    )
    j = cum.crossJoin(F.broadcast(tot))
    covered = F.col("cum") * 5 >= F.col("total_cents") * 4
    return j.groupBy("n_customers", "total_cents").agg(
        (F.sum(F.when(~covered, 1).otherwise(0)) + 1).alias("k_top"),
        F.min(F.when(covered, F.col("cum"))).alias("topk_cents"),
    ).select(
        "n_customers",
        "k_top",
        "topk_cents",
        "total_cents",
        F.round(
            F.col("topk_cents").cast("double")
            / F.col("total_cents").cast("double")
            * 1e6
        )
        .cast("long")
        .alias("share_ppm"),
    )


PARETO_SQL = f"""
    WITH rev AS (
      SELECT o_custkey, CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS r
      FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
                 CAST(SUM(r) AS BIGINT) AS total_cents FROM rev),
    c AS (
      SELECT r, CAST(SUM(r) OVER (ORDER BY r DESC, o_custkey ASC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM rev
    )
    SELECT n_customers,
           CAST(SUM(CASE WHEN cum * 5 < total_cents * 4 THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS k_top,
           CAST(MIN(CASE WHEN cum * 5 >= total_cents * 4 THEN cum END)
                AS BIGINT) AS topk_cents,
           total_cents,
           CAST(ROUND(CAST(MIN(CASE WHEN cum * 5 >= total_cents * 4
                                    THEN cum END) AS DOUBLE)
                      / CAST(total_cents AS DOUBLE) * 1e6, 0) AS BIGINT)
             AS share_ppm
    FROM c, t GROUP BY n_customers, total_cents
"""


# --- Markov entropy rate ------------------------------------------------------


def q_events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order event-type Markov chain:
    H = −Σ_{ij} (n_ij/N)·ln(n_ij/n_i·) — how predictable the next event
    is given the current one (0 = deterministic flows, ln|types| =
    uniform). Completes event_type_transitions / user_event_entropy.
    Each transition's term uses the deterministic ln over INTEGER
    arguments (ln(n_i·) − ln(n_ij)) and snaps to micro-nats before the
    (bounded, |types|²-sized) sum; one terminal division by N.
    Output: (n_transitions, entropy_rate_micro).

    Scale shape: the LEAD window partitions on user_id (high-cardinality
    key); everything after runs on the |types|² transition relation."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    ni = tr.groupBy("src").agg(F.sum("nij").alias("ni"))
    tot = tr.agg(F.sum("nij").alias("nn"))
    term = (
        f"CAST(ROUND(CAST(nij AS DOUBLE) * "
        f"({ln_int_sql('ni', 'spark')} - {ln_int_sql('nij', 'spark')}) * 1e6, 0) "
        f"AS BIGINT)"
    )
    terms = tr.join(F.broadcast(ni), "src").crossJoin(F.broadcast(tot)).select(
        "nn", F.expr(term).alias("t_micro")
    )
    return terms.groupBy("nn").agg(F.sum("t_micro").alias("_ts")).select(
        F.col("nn").alias("n_transitions"),
        F.round(F.col("_ts").cast("double") / F.col("nn").cast("double"))
        .cast("long")
        .alias("entropy_rate_micro"),
    )


def _transition_entropy_sql() -> str:
    term = (
        f"CAST(ROUND(CAST(nij AS DOUBLE) * "
        f"({ln_int_sql('ni', 'duckdb')} - {ln_int_sql('nij', 'duckdb')}) * 1e6, 0) "
        f"AS BIGINT)"
    )
    return f"""
    WITH s AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    tr AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS nij
           FROM s WHERE dst IS NOT NULL GROUP BY 1, 2),
    ni AS (SELECT src, CAST(SUM(nij) AS BIGINT) AS ni FROM tr GROUP BY 1),
    t AS (SELECT CAST(SUM(nij) AS BIGINT) AS nn FROM tr),
    terms AS (SELECT nn, {term} AS t_micro
              FROM tr JOIN ni USING (src), t)
    SELECT nn AS n_transitions,
           CAST(ROUND(CAST(SUM(t_micro) AS DOUBLE) / CAST(nn AS DOUBLE), 0)
                AS BIGINT) AS entropy_rate_micro
    FROM terms GROUP BY nn
"""


# --- association lift ---------------------------------------------------------

LIFT_BASKET_CAP = 40
LIFT_TOP_K = 25


def q_basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 part pairs by LIFT — support counting (basket_pair_counts)
    normalized by marginal popularity: lift = N·c_ab / (c_a·c_b), so a
    pair of niche parts that always co-occur outranks two bestsellers
    that co-occur by volume alone. The association-rule ranking metric.
    lift_micro is one double expression over four exact integers,
    identical on both engines; fully tie-broken LIMIT.

    Scale shape: the basket_pair_counts chassis (order-key self-join,
    basket-size cap bounding pair volume at Σ min(basket, cap)², pair
    exchange volume-sized via plans/pairsize.py); the marginal relation
    is part-sized and joins back on the part keys; N is a 1-row
    broadcast."""
    items = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        # r12 (guide §2.4 share one exchange): keying the distinct's
        # exchange on l_orderkey alone (a subset of the grouping key
        # satisfies the aggregate's distribution) leaves items hash-
        # partitioned on the basket key, so the keep aggregate, the
        # keep join AND both self-join sides all reuse this single
        # exchange instead of re-shuffling. Interleaved A/B at sf0.1:
        # 1.35 s vs 2.20 s quiet medians, identical results.
        .repartition("l_orderkey")
        .distinct()
    )
    keep = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") <= LIFT_BASKET_CAP)
        .select("l_orderkey")
    )
    pair_bound = sum_sq_group_bound(
        items,
        ["l_orderkey"],
        size_cap=LIFT_BASKET_CAP,
        cache_key=f"lift_pairs:{sf_dir}",
    )
    i = items.join(keep, "l_orderkey")
    a, b = i.alias("a"), i.alias("b")
    # Volume-sized pair exchange (plans/pairsize.py, the r7 sf10-OOM
    # chassis): the Σ basket² pair stream gets a memory-sized exchange
    # on the pair key; Catalyst elides the groupBy's own shuffle.
    raw_pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
    )
    pairs = (
        volume_repartition_pairs(raw_pairs, ["p1", "p2"], pair_bound)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    marg = i.groupBy(F.col("l_partkey")).agg(F.count(F.lit(1)).alias("c"))
    # keep already holds exactly one row per surviving basket — count it
    # directly instead of re-distincting the item relation (one fewer
    # fact-scale shuffle; persisting the shared subtree was A/B'd and
    # LOST, 2.75 vs 2.42 s at sf0.1 — the r4/r5 reuse lesson holds).
    nb = keep.agg(F.count(F.lit(1)).alias("nb"))
    lift = (
        F.col("nb").cast("double")
        * F.col("c_ab").cast("double")
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        * 1e6
    )
    return (
        pairs.join(marg.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1")), "p1")
        .join(marg.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2")), "p2")
        .crossJoin(F.broadcast(nb))
        .select(
            "p1", "p2", "c_ab",
            F.round(lift).cast("long").alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), F.asc("p1"), F.asc("p2"))
        .limit(LIFT_TOP_K)
    )


BASKET_LIFT_SQL = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    keep AS (SELECT l_orderkey FROM items GROUP BY 1
             HAVING COUNT(*) <= {LIFT_BASKET_CAP}),
    i AS (SELECT items.* FROM items JOIN keep USING (l_orderkey)),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM i a JOIN i b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    marg AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
             FROM i GROUP BY 1),
    nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM i)
    SELECT p1, p2, c_ab,
           CAST(ROUND(CAST(nb AS DOUBLE) * CAST(c_ab AS DOUBLE)
                      / (CAST(m1.c AS DOUBLE) * CAST(m2.c AS DOUBLE)) * 1e6, 0)
                AS BIGINT) AS lift_micro
    FROM pairs
    JOIN marg m1 ON pairs.p1 = m1.l_partkey
    JOIN marg m2 ON pairs.p2 = m2.l_partkey, nb
    ORDER BY lift_micro DESC, p1, p2 LIMIT {LIFT_TOP_K}
"""


# --- moving order statistic ---------------------------------------------------


def q_events_moving_median7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-row moving MEDIAN of event value per user — the
    robust (outlier-immune) sibling of orders_centered_ma's moving
    mean; the missing moving ORDER STATISTIC in the window family.
    Values snap to integer micro-units first; the median is emitted
    ×2 (`med2_micro` = sum of the two middle elements for even frames,
    twice the middle for odd) so even-frame averaging stays in exact
    integers on both engines. Output: (event_id, user_id, n_win,
    med2_micro).

    Scale shape: ONE keyed window (partition by user_id —
    high-cardinality), bounded ±3-row frame; the in-frame sort touches
    ≤ 7 elements per row. No global ordering anywhere."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    arr = F.sort_array(F.collect_list("vm").over(w))
    return (
        e.withColumn("_arr", arr)
        .select(
            "event_id",
            "user_id",
            F.size("_arr").alias("n_win"),
            F.expr(
                "CASE WHEN size(_arr) % 2 = 1 "
                "THEN 2 * element_at(_arr, CAST((size(_arr) + 1) div 2 AS INT)) "
                "ELSE element_at(_arr, CAST(size(_arr) div 2 AS INT)) "
                "   + element_at(_arr, CAST(size(_arr) div 2 + 1 AS INT)) END"
            ).alias("med2_micro"),
        )
    )


MOVING_MEDIAN_SQL = """
    WITH v AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vm
      FROM events
    )
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS INTEGER) AS n_win,
           CAST(ROUND(median(vm) OVER w * 2, 0) AS BIGINT) AS med2_micro
    FROM v
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
"""


# --- Markov stationary distribution --------------------------------------------

# 8 power iterations: the ppm-grain iterate is measured STATIONARY by
# iteration 6 at both test SFs (the behavioral chain's spectral gap is
# large — transition rows are near-uniform); 8 keeps margin while each
# extra iteration costs one lineage-cut job per engine. A production
# chain with a small spectral gap would raise this or add a fixpoint
# probe like graph/pagerank's tol.
MARKOV_ITERS = 8


def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain by power iteration — where user sessions settle in the long
    run (the PageRank idea applied to the behavioral transition matrix).
    Transition probabilities snap to ppm integers; each of the
    MARKOV_ITERS (8) unrolled iterations is v'_j = ROUND(Σ_i v_i·p_ij / 1e6) — a sum of
    ≤ |types| integer products, so every iterate is EXACT integer
    arithmetic on both engines (the float matrix-power would be
    summation-order-dependent). Output: (state, stationary_ppm).

    Scale shape: one fact pass to the |types|² transition relation;
    the MARKOV_ITERS iterations run on |types|-sized relations (broadcast joins) —
    the fact table is touched once."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    ni = tr.groupBy("src").agg(F.sum("nij").alias("ni"))
    # Checkpoint the (tiny) transition matrix ONCE: without it every
    # per-iteration job re-derives it from the fact table (MARKOV_ITERS fact
    # scans), and the unrolled joins compile into one 50-second-deep
    # static plan. With lineage cut per superstep (the graph/pagerank
    # convention) the fact table is touched once and each iteration is
    # a |types|-row job.
    p = (
        tr.join(ni, "src")
        .select(
            "src",
            "dst",
            F.round(
                F.col("nij").cast("double") / F.col("ni").cast("double") * 1e6
            )
            .cast("long")
            .alias("p_ppm"),
        )
        .localCheckpoint()
    )
    n_states = ni.select(F.count(F.lit(1)).alias("ns"))
    v = ni.crossJoin(F.broadcast(n_states)).select(
        F.col("src").alias("state"),
        F.round(F.lit(1e6) / F.col("ns").cast("double")).cast("long").alias("v_ppm"),
    )
    for _ in range(MARKOV_ITERS):
        v = (
            v.join(F.broadcast(p), v["state"] == p["src"])
            .groupBy(F.col("dst").alias("state"))
            .agg(
                F.round(
                    F.sum(F.col("v_ppm") * F.col("p_ppm")).cast("double") / 1e6
                )
                .cast("long")
                .alias("v_ppm")
            )
            .localCheckpoint()
        )
    return v.select("state", F.col("v_ppm").alias("stationary_ppm"))


def _markov_sql() -> str:
    iters = "".join(
        f""",
    v{k + 1} AS (
      SELECT p.dst AS state,
             CAST(ROUND(CAST(SUM(v.v_ppm * p.p_ppm) AS DOUBLE) / 1e6, 0)
                  AS BIGINT) AS v_ppm
      FROM v{k} v JOIN p ON v.state = p.src GROUP BY 1
    )"""
        for k in range(MARKOV_ITERS)
    )
    return f"""
    WITH s AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    tr AS MATERIALIZED (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS nij
           FROM s WHERE dst IS NOT NULL GROUP BY 1, 2),
    ni AS MATERIALIZED (SELECT src, CAST(SUM(nij) AS BIGINT) AS ni
           FROM tr GROUP BY 1),
    p AS MATERIALIZED (SELECT src, dst,
                 CAST(ROUND(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE) * 1e6, 0)
                      AS BIGINT) AS p_ppm
          FROM tr JOIN ni USING (src)),
    ns AS (SELECT COUNT(*) AS ns FROM ni),
    v0 AS (SELECT src AS state,
                  CAST(ROUND(1e6 / CAST(ns AS DOUBLE), 0) AS BIGINT) AS v_ppm
           FROM ni, ns){iters}
    SELECT state, v_ppm AS stationary_ppm FROM v{MARKOV_ITERS}
"""


# --- cohort lifetime value ------------------------------------------------------


def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix: customers grouped by FIRST-order month, each
    cohort's revenue by month age (months since acquisition) — the
    money sibling of events_retention_cohorts. Exact integer cents and
    month indices end to end. Output: (cohort_month yyyymm, age_months,
    revenue_cents, n_active_customers).

    Scale shape: one aggregate to per-customer first month
    (high-cardinality key), broadcast-joinable back onto orders; the
    matrix is |months|² bounded."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        _cents("o_totalprice").alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(
        F.min("midx").alias("c_midx"), F.min("ym").alias("cohort_month")
    )
    return (
        o.join(first, "o_custkey")
        .groupBy("cohort_month", (F.col("midx") - F.col("c_midx")).alias("age_months"))
        .agg(
            F.sum("cents").alias("revenue_cents"),
            F.countDistinct("o_custkey").alias("n_active_customers"),
        )
    )


COHORT_LTV_SQL = f"""
    WITH o AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS midx,
             year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             {cents_sql('o_totalprice')} AS cents
      FROM orders
    ),
    first AS (SELECT o_custkey, MIN(midx) AS c_midx, MIN(ym) AS cohort_month
              FROM o GROUP BY 1)
    SELECT cohort_month, CAST(midx - c_midx AS BIGINT) AS age_months,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active_customers
    FROM o JOIN first USING (o_custkey)
    GROUP BY 1, 2
"""


# --- duplicate-key audit --------------------------------------------------------

_PK_AUDIT = (
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("nation", "n_nationkey"),
    ("region", "r_regionkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


def q_dq_duplicate_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness census across every cataloged table: rows,
    distinct keys, and keys appearing more than once — the first data-
    quality gate any ingest runs (joins silently fan out on duplicate
    keys; this query is the canary). Output: (table_name, n_rows,
    n_keys, n_dup_keys).

    Scale shape: one count-distinct aggregate per table (map-side
    combined), unioned into a 9-row relation."""
    parts = []
    for t, k in _PK_AUDIT:
        d = load_table(spark, t, sf_dir)
        g = d.groupBy(F.col(k)).agg(F.count(F.lit(1)).alias("_c"))
        parts.append(
            g.agg(
                F.lit(t).alias("table_name"),
                F.sum("_c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("_c") > 1, 1).otherwise(0)).alias("n_dup_keys"),
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


DQ_PK_AUDIT_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, CAST(SUM(c) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys
        FROM (SELECT {k}, COUNT(*) AS c FROM {t} GROUP BY 1)"""
    for t, k in _PK_AUDIT
)


# --- fulfillment-lag quantiles --------------------------------------------------


def q_order_ship_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag quantiles (p25/p50/p90, in days) per order
    priority — the fulfillment-SLA profile. Lags are exact integer day
    differences; F.percentile and DuckDB quantile_cont share the
    PERCENTILE_CONT interpolation rule (the agg_percentiles_exact
    precedent), with the interpolated value rounded to 2 decimals
    identically. One join + one aggregate per priority group."""
    l = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lag_days"),
    )
    pct = F.percentile("lag_days", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)))
    return (
        j.groupBy("o_orderpriority")
        .agg(pct.alias("_p"))
        .select(
            "o_orderpriority",
            F.round(F.element_at("_p", 1), 2).alias("p25"),
            F.round(F.element_at("_p", 2), 2).alias("p50"),
            F.round(F.element_at("_p", 3), 2).alias("p90"),
        )
    )


SHIP_LAG_SQL = """
    WITH j AS (
      SELECT o_orderpriority,
             CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT o_orderpriority,
           ROUND(quantile_cont(lag_days, 0.25), 2) AS p25,
           ROUND(quantile_cont(lag_days, 0.50), 2) AS p50,
           ROUND(quantile_cont(lag_days, 0.90), 2) AS p90
    FROM j GROUP BY 1
"""


QUERIES = {
    "orders_monthly_islands": q_orders_monthly_islands,
    "events_dow_residuals": q_events_dow_residuals,
    "events_period_detect": q_events_period_detect,
    "agg_theil_nation": q_agg_theil_nation,
    "sketch_kmv_union": q_sketch_kmv_union,
    "join_asof_nearest": q_join_asof_nearest,
    "orders_pareto_8020": q_orders_pareto_8020,
    "events_transition_entropy": q_events_transition_entropy,
    "basket_lift_pairs": q_basket_lift_pairs,
    "events_moving_median7": q_events_moving_median7,
    "events_markov_stationary": q_events_markov_stationary,
    "orders_cohort_ltv": q_orders_cohort_ltv,
    "dq_duplicate_key_audit": q_dq_duplicate_key_audit,
    "order_ship_lag_quantiles": q_order_ship_lag_quantiles,
}

ORACLES = {
    "orders_monthly_islands": MONTHLY_ISLANDS_SQL,
    "events_dow_residuals": DOW_RESIDUALS_SQL,
    "events_period_detect": _period_detect_sql(),
    "agg_theil_nation": _theil_sql(),
    "sketch_kmv_union": _kmv_union_sql(),
    "join_asof_nearest": ASOF_NEAREST_SQL,
    "orders_pareto_8020": PARETO_SQL,
    "events_transition_entropy": _transition_entropy_sql(),
    "basket_lift_pairs": BASKET_LIFT_SQL,
    "events_moving_median7": MOVING_MEDIAN_SQL,
    "events_markov_stationary": _markov_sql(),
    "orders_cohort_ltv": COHORT_LTV_SQL,
    "dq_duplicate_key_audit": DQ_PK_AUDIT_SQL,
    "order_ship_lag_quantiles": SHIP_LAG_SQL,
}
