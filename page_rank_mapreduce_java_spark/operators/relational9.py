"""Relational operator surface, batch 9 (round 5): distribution
analytics — inequality/concentration curves (Gini, Lorenz), two-sample
distribution tests (Kolmogorov–Smirnov, Mann–Whitney/AUC), effect-size
statistics (Cramér's V), digit-law conformance (Benford), higher-moment
shape statistics (skewness/kurtosis from raw power sums), and simple
OLS regression — the distribution-shift toolkit a training-data
pipeline runs when comparing corpus slices, spotting synthetic or
fabricated numeric fields (Benford), and quantifying how unequal a
source mix is (Gini/Lorenz, the curve view of the HHI scalar already in
relational8).

All of this is beyond-reference extension surface (the reference's
surface is one fixed PageRank loop, pageRank_v2.java:25-47); SURVEY §2.5
"absent in ref" rows.

Canonicalization policy (tools/canon_audit.py): every statistic leaves
the engine as a scaled BIGINT (ppm / milli) produced by ROUND over
DOUBLE arithmetic whose INPUTS are exact integers (counts, cents,
integer quantities) and whose expression trees are written identically
in the Spark and DuckDB renderings — IEEE 754 ops (+,−,×,÷,sqrt) are
deterministic given identical operand order, so the scaled integers
agree. Wide intermediate sums ride DECIMAL(38,0) (Spark) / HUGEINT
(DuckDB) where a BIGINT would overflow within the 100 TB design range.

Scale shape, common themes: heavy relations are reduced FIRST by a
keyed groupBy with map-side partials (per-customer spend, per-value
ECDF counts, contingency cells); global orderings ride the two-pass
chassis in operators/ranking.py (range partition + broadcast offsets),
never an unpartitioned window; the only plain windows in this module
run over provably bounded relations (25 nations, 10 deciles, ≤ 50
distinct quantities, 9 digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents, cents_sql
from page_rank_mapreduce_java_spark.operators.ranking import (
    global_ntile,
    global_row_number,
    global_running_sums,
)


def _customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer total spend in exact cents, with nation name — the
    shared reduction for the inequality queries. Customers without
    orders are excluded (inner join): inequality over the ACTIVE
    population; the nation dim is broadcast."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    spend = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum("cents").alias("spend")
    )
    return spend.join(c, "c_custkey").join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).select("c_custkey", "n_name", "spend")


_SPEND_SQL = f"""
    SELECT o_custkey AS c_custkey, n_name,
           CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS spend
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
"""


def q_gini_nation_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation, in ppm — the
    inequality scalar of the source-mix curve (HHI's cousin on the
    customer axis): G = (2·Σ i·wᵢ − (n+1)·Σ wᵢ) / (n·Σ wᵢ) with wᵢ the
    ascending-sorted spends and i the 1-based within-nation rank.

    Scale shape: the within-nation rank does NOT use a per-nation
    window (one task per nation = the skew trap). It is derived from
    ONE two-pass global row number over (nation, spend, custkey) minus
    each nation's broadcast prefix offset (25 rows) — every task stays
    range-partition-sized regardless of how large a nation is. The
    moment Σ i·wᵢ rides DECIMAL(38,0): i ≤ 10¹⁰ customers × w ≤ 10⁹
    cents overflows BIGINT at the design scale.
    """
    spend = _customer_spend(spark, sf_dir)
    ranked = global_row_number(
        spend,
        [F.asc("n_name"), F.asc("spend"), F.asc("c_custkey")],
        out_col="_grn",
    )
    per_nation = ranked.groupBy("n_name").agg(F.count(F.lit(1)).alias("_nn"))
    w_off = Window.orderBy("n_name").rowsBetween(Window.unboundedPreceding, -1)
    offs = per_nation.select(
        "n_name", F.coalesce(F.sum("_nn").over(w_off), F.lit(0)).alias("_noff")
    )
    r = ranked.join(F.broadcast(offs), "n_name").withColumn(
        "_rk", F.col("_grn") - F.col("_noff")
    )
    agg = r.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("spend").alias("_s"),
        F.sum(
            F.col("_rk").cast("decimal(38,0)") * F.col("spend").cast("decimal(38,0)")
        ).alias("_t"),
    )
    gini = (
        F.lit(2.0) * F.col("_t").cast("double")
        - (F.col("n_customers") + 1).cast("double") * F.col("_s").cast("double")
    ) / (F.col("n_customers").cast("double") * F.col("_s").cast("double"))
    return agg.select(
        "n_name",
        "n_customers",
        F.round(gini * 1e6).cast("long").alias("gini_ppm"),
    )


GINI_SQL = f"""
    WITH spend AS ({_SPEND_SQL}),
    r AS (SELECT n_name, spend,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                                    ORDER BY spend, c_custkey) AS rk
          FROM spend),
    a AS (SELECT n_name, COUNT(*) AS n_customers,
                 CAST(SUM(spend) AS BIGINT) AS s,
                 SUM(CAST(rk AS HUGEINT) * CAST(spend AS HUGEINT)) AS t
          FROM r GROUP BY 1)
    SELECT n_name, n_customers,
           CAST(ROUND((2.0 * CAST(t AS DOUBLE)
                       - CAST(n_customers + 1 AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n_customers AS DOUBLE) * CAST(s AS DOUBLE))
                      * 1e6, 0) AS BIGINT) AS gini_ppm
    FROM a
"""


def q_lorenz_deciles_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend at decile resolution: for each
    spend decile (ascending, SQL-standard NTILE tie-up — larger buckets
    first), the share and cumulative share of total revenue in ppm.
    The "bottom 50% of customers hold X% of revenue" curve behind the
    Gini scalar.

    Scale shape: deciles come from the two-pass global NTILE chassis
    (never a one-task global window); everything after runs on 10 rows.
    """
    spend = _customer_spend(spark, sf_dir).select("c_custkey", "spend")
    binned = global_ntile(
        spend, 10, [F.asc("spend"), F.asc("c_custkey")], out_col="decile"
    )
    agg = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("spend").alias("spend_cents"),
    )
    total = agg.agg(F.sum("spend_cents").alias("_tot"))
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        agg.crossJoin(F.broadcast(total))
        .withColumn("_cum", F.sum("spend_cents").over(w_cum))
        .select(
            "decile",
            "n_customers",
            "spend_cents",
            F.round(
                F.col("spend_cents").cast("double")
                / F.col("_tot").cast("double")
                * 1e6
            )
            .cast("long")
            .alias("share_ppm"),
            F.round(
                F.col("_cum").cast("double") / F.col("_tot").cast("double") * 1e6
            )
            .cast("long")
            .alias("cum_share_ppm"),
        )
    )


LORENZ_SQL = f"""
    WITH spend AS (SELECT o_custkey AS c_custkey,
                          CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS spend
                   FROM orders GROUP BY 1),
    b AS (SELECT spend,
                 NTILE(10) OVER (ORDER BY spend, c_custkey) AS decile
          FROM spend),
    a AS (SELECT decile, COUNT(*) AS n_customers,
                 CAST(SUM(spend) AS BIGINT) AS spend_cents
          FROM b GROUP BY 1),
    t AS (SELECT CAST(SUM(spend_cents) AS BIGINT) AS tot FROM a)
    SELECT CAST(decile AS BIGINT) AS decile, n_customers, spend_cents,
           CAST(ROUND(CAST(spend_cents AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6, 0)
                AS BIGINT) AS share_ppm,
           CAST(ROUND(CAST(SUM(spend_cents) OVER (ORDER BY decile
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      / CAST(tot AS DOUBLE) * 1e6, 0) AS BIGINT) AS cum_share_ppm
    FROM a, t
"""


def q_ks_flag_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the extendedprice
    distributions of returned (l_returnflag = 'R') and accepted ('A')
    lineitems — THE distribution-shift test between two corpus slices.
    D = max over thresholds |ECDF_R − ECDF_A|, computed EXACTLY on the
    integer lattice: |cum_R·n_A − cum_A·n_R| (cross-multiplied, no float
    ECDFs), maximized, then scaled once: ks_ppm = 1e6·D/(n_R·n_A).

    Scale shape: the fact table reduces to per-value counts first (one
    map-side-combined groupBy on price cents); the two cumulative count
    series ride ONE shared two-pass prefix-sum pass
    (operators/ranking.global_running_sums), and the cross-multiplied
    deviation is per-row arithmetic in DECIMAL(38,0) — cum ≤ 10¹³ rows
    × n ≤ 10¹³ overflows BIGINT well inside the design range. The final
    max is a 1-row aggregate.
    """
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "A")
    )
    per_v = l.groupBy(_cents("l_extendedprice").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("cr"),
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("ca"),
    )
    cum = global_running_sums(
        per_v, ["cr", "ca"], [F.asc("v")], out_cols=["cum_r", "cum_a"]
    )
    tot = cum.agg(
        F.max("cum_r").alias("n_r"), F.max("cum_a").alias("n_a")
    )
    dev = (
        F.col("cum_r").cast("decimal(38,0)") * F.col("n_a").cast("decimal(38,0)")
        - F.col("cum_a").cast("decimal(38,0)") * F.col("n_r").cast("decimal(38,0)")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select("n_r", "n_a", F.abs(dev).alias("_d"))
        .groupBy("n_r", "n_a")
        .agg(F.max("_d").alias("_ks"))
        .select(
            "n_r",
            "n_a",
            F.round(
                F.col("_ks").cast("double")
                / (F.col("n_r").cast("double") * F.col("n_a").cast("double"))
                * 1e6
            )
            .cast("long")
            .alias("ks_ppm"),
        )
    )


KS_SQL = f"""
    WITH per_v AS (
      SELECT {cents_sql('l_extendedprice')} AS v,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca
      FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1
    ),
    cum AS (
      SELECT CAST(SUM(cr) OVER w AS BIGINT) AS cum_r,
             CAST(SUM(ca) OVER w AS BIGINT) AS cum_a
      FROM per_v WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    t AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_r, CAST(SUM(ca) AS BIGINT) AS n_a
          FROM per_v)
    SELECT n_r, n_a,
           CAST(ROUND(CAST(MAX(ABS(CAST(cum_r AS HUGEINT) * n_a
                                   - CAST(cum_a AS HUGEINT) * n_r)) AS DOUBLE)
                      / (CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE)) * 1e6, 0)
                AS BIGINT) AS ks_ppm
    FROM cum, t GROUP BY n_r, n_a
"""


def q_auc_flag_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the quantity distributions of returned
    ('R') and accepted ('A') lineitems, reported as the AUC (probability
    a random R-quantity exceeds a random A-quantity, ties counted half)
    — the rank-sum separability score, integer-exact under ties via
    DOUBLED midranks: for a value with b smaller rows and c tied rows,
    2·(average rank) = 2b + c + 1 exactly.

    Scale shape: l_quantity has ≤ 50 distinct values at any SF, so the
    fact table collapses to ≤ 50 (value, count, count) rows by one
    map-side-combined groupBy; the cumulative ordering window runs over
    that bounded relation. The doubled rank-sum Σ c_R·(2b+c+1) rides
    DECIMAL(38,0) (2n² headroom).
    """
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "A")
    )
    per_v = l.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("cr"),
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("ca"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    d = per_v.withColumn(
        "_b", F.coalesce(F.sum(F.col("cr") + F.col("ca")).over(w), F.lit(0))
    )
    r2 = F.lit(2) * F.col("_b") + F.col("cr") + F.col("ca") + F.lit(1)
    agg = d.agg(
        F.sum("cr").alias("n_r"),
        F.sum("ca").alias("n_a"),
        F.sum(F.col("cr").cast("decimal(38,0)") * r2.cast("decimal(38,0)")).alias(
            "_sr2"
        ),
    )
    # doubled U_R = Σ2R_R − n_R(n_R+1); AUC = U_R / (n_R·n_A) = doubled
    # U over doubled n_R·n_A.
    u2 = F.col("_sr2").cast("double") - (
        F.col("n_r").cast("double") * (F.col("n_r") + 1).cast("double")
    )
    return agg.select(
        "n_r",
        "n_a",
        F.round(
            u2
            / (F.lit(2.0) * F.col("n_r").cast("double") * F.col("n_a").cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("auc_ppm"),
    )


AUC_SQL = """
    WITH per_v AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca
      FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1
    ),
    d AS (
      SELECT cr, ca,
             COALESCE(CAST(SUM(cr + ca) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS b
      FROM per_v
    ),
    a AS (
      SELECT CAST(SUM(cr) AS BIGINT) AS n_r, CAST(SUM(ca) AS BIGINT) AS n_a,
             SUM(CAST(cr AS HUGEINT) * CAST(2 * b + cr + ca + 1 AS HUGEINT)) AS sr2
      FROM d
    )
    SELECT n_r, n_a,
           CAST(ROUND((CAST(sr2 AS DOUBLE)
                       - CAST(n_r AS DOUBLE) * CAST(n_r + 1 AS DOUBLE))
                      / (2.0 * CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE))
                      * 1e6, 0) AS BIGINT) AS auc_ppm
    FROM a
"""


def q_cramers_v_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the l_returnflag × l_linestatus contingency — the
    [0,1]-normalized effect size over the chi-square statistic already
    registered in relational8 (chi2 grows with n; V is comparable across
    corpus sizes): V = sqrt(χ² / (n · min(r−1, c−1))).

    Scale shape: one map-side-combined groupBy to the r×c cells (≤ 6
    rows); every aggregate after runs on the cell relation. sqrt is
    IEEE-correctly-rounded, so the ppm value is engine-independent.
    """
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_linestatus"
    )
    cells = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows = cells.groupBy("l_returnflag").agg(F.sum("o").alias("rt"))
    colsb = cells.groupBy("l_linestatus").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("l_returnflag").alias("_r"),
        F.countDistinct("l_linestatus").alias("_c"),
    )
    j = (
        cells.join(F.broadcast(rows), "l_returnflag")
        .join(F.broadcast(colsb), "l_linestatus")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast(
        "double"
    )
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    agg = j.groupBy("n", "_r", "_c").agg(F.sum(term).alias("_chi2"))
    dfmin = F.least(F.col("_r") - 1, F.col("_c") - 1)
    v = F.sqrt(F.col("_chi2") / (F.col("n").cast("double") * dfmin.cast("double")))
    return agg.select(
        "n",
        dfmin.cast("long").alias("df_min"),
        F.round(v * 1e6).cast("long").alias("v_ppm"),
    )


CRAMERS_V_SQL = """
    WITH cells AS (
      SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS o
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (SELECT l_returnflag, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
    c AS (SELECT l_linestatus, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS nc
          FROM cells),
    x AS (
      SELECT t.n, t.nr, t.nc,
             SUM((CAST(o AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(o AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)))
             AS chi2
      FROM cells JOIN r USING (l_returnflag) JOIN c USING (l_linestatus)
      CROSS JOIN t
      GROUP BY 1, 2, 3
    )
    SELECT n, CAST(LEAST(nr - 1, nc - 1) AS BIGINT) AS df_min,
           CAST(ROUND(SQRT(chi2 / (CAST(n AS DOUBLE)
                                   * CAST(LEAST(nr - 1, nc - 1) AS DOUBLE)))
                      * 1e6, 0) AS BIGINT) AS v_ppm
    FROM x
"""


def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the fabricated-numbers detector for numeric corpus fields.
    The digit comes from the DECIMAL STRING of integer cents (exact and
    identical across engines; float→string or log10-near-power-bounds
    are both drift channels). Per digit: count, observed share (ppm),
    Benford expectation log10(1+1/d) (ppm), and the signed deviation of
    the two ROUNDED shares (integer subtraction — no re-rounding).

    Scale shape: one map-side-combined groupBy to ≤ 9 rows.
    """
    o = load_table(spark, "orders", sf_dir)
    digit = F.substring(_cents("o_totalprice").cast("string"), 1, 1).cast("long")
    agg = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n_orders"))
    tot = agg.agg(F.sum("n_orders").alias("_tot"))
    share = F.round(
        F.col("n_orders").cast("double") / F.col("_tot").cast("double") * 1e6
    ).cast("long")
    benford = F.round(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
        / F.log(F.lit(10.0))
        * 1e6
    ).cast("long")
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            share.alias("share_ppm"),
            benford.alias("benford_ppm"),
            (share - benford).alias("dev_ppm"),
        )
    )


BENFORD_SQL = f"""
    WITH a AS (
      SELECT CAST(SUBSTR(CAST({cents_sql('o_totalprice')} AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS tot FROM a)
    SELECT digit, n_orders,
           CAST(ROUND(CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6, 0)
                AS BIGINT) AS share_ppm,
           CAST(ROUND(LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0) * 1e6, 0)
                AS BIGINT) AS benford_ppm,
           CAST(ROUND(CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6, 0)
                AS BIGINT)
           - CAST(ROUND(LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0) * 1e6, 0)
                  AS BIGINT) AS dev_ppm
    FROM a, t
"""


def q_skew_kurtosis_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of l_quantity per
    returnflag, from raw integer power sums (Σq, Σq², Σq³, Σq⁴) — NOT
    the engines' built-in skewness()/kurtosis() (Spark and DuckDB apply
    different sample-bias corrections and different accumulation
    schemes; raw sums are order-independent integers, and the central
    moments derive from them in identical IEEE arithmetic on both
    sides). skew = m₃/sqrt(m₂³), ex_kurt = m₄/m₂² − 3, both in milli.

    Scale shape: one map-side-combined groupBy; the power sums ride
    DECIMAL(38,0)/HUGEINT (q⁴ ≤ 6.25e6 × 10¹³ rows overflows BIGINT).
    """
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    qd = F.col("q").cast("decimal(38,0)")
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qd).alias("_s1"),
        F.sum(qd * qd).alias("_s2"),
        F.sum(qd * qd * qd).alias("_s3"),
        F.sum(qd * qd * qd * qd).alias("_s4"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    s3 = F.col("_s3").cast("double")
    s4 = F.col("_s4").cast("double")
    m = s1 / n
    m2 = s2 / n - m * m
    m3 = s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m
    m4 = (
        s4 / n
        - 4.0 * m * (s3 / n)
        + 6.0 * m * m * (s2 / n)
        - 3.0 * m * m * m * m
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(m3 / F.sqrt(m2 * m2 * m2) * 1e3).cast("long").alias("skew_milli"),
        F.round((m4 / (m2 * m2) - 3.0) * 1e3).cast("long").alias("ex_kurt_milli"),
    )


SKEW_KURT_SQL = """
    WITH a AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s1,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s2,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s3,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s4
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(ROUND(
             (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
              - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             / SQRT(
                 (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                 * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                 * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
             * 1e3, 0) AS BIGINT) AS skew_milli,
           CAST(ROUND(
             ((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
               - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
               + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
               - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
              / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                 * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
              - 3.0)
             * 1e3, 0) AS BIGINT) AS ex_kurt_milli
    FROM a
"""


def q_ols_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of extendedprice (cents) on quantity: slope,
    intercept and R² from the five exact sufficient statistics
    (n, Σx, Σy, Σx², Σxy, Σy²) — the one-pass closed form, the shape
    every distributed regression uses (sums are order-independent
    integers; the closed form runs on the driver-sized aggregate).

    slope_milli is cents-per-unit × 10³; intercept_cents rounds to a
    cent; r2 in ppm. Sufficient statistics ride DECIMAL(38,0)/HUGEINT
    (Σy² hits ~10²⁷ in the design range).
    """
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        _cents("l_extendedprice").alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(yd * yd).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    a = n * sxy - sx * sy
    b = n * sxx - sx * sx
    c = n * syy - sy * sy
    slope = a / b
    intercept = (sy - slope * sx) / n
    return agg.select(
        "l_returnflag",
        "n",
        F.round(slope * 1e3).cast("long").alias("slope_milli"),
        F.round(intercept).cast("long").alias("intercept_cents"),
        F.round(a * a / (b * c) * 1e6).cast("long").alias("r2_ppm"),
    )


OLS_SQL = f"""
    WITH a AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sx,
             SUM(CAST({cents_sql('l_extendedprice')} AS HUGEINT)) AS sy,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxx,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST({cents_sql('l_extendedprice')} AS HUGEINT)) AS sxy,
             SUM(CAST({cents_sql('l_extendedprice')} AS HUGEINT)
                 * CAST({cents_sql('l_extendedprice')} AS HUGEINT)) AS syy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * 1e3, 0) AS BIGINT) AS slope_milli,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE), 0) AS BIGINT) AS intercept_cents,
           CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      * 1e6, 0) AS BIGINT) AS r2_ppm
    FROM a
"""


QUERIES = {
    "gini_nation_spend": q_gini_nation_spend,
    "lorenz_deciles_spend": q_lorenz_deciles_spend,
    "ks_flag_price": q_ks_flag_price,
    "auc_flag_quantity": q_auc_flag_quantity,
    "cramers_v_flag_status": q_cramers_v_flag_status,
    "benford_totalprice": q_benford_totalprice,
    "skew_kurtosis_quantity": q_skew_kurtosis_quantity,
    "ols_price_on_quantity": q_ols_price_on_quantity,
}

ORACLES = {
    "gini_nation_spend": GINI_SQL,
    "lorenz_deciles_spend": LORENZ_SQL,
    "ks_flag_price": KS_SQL,
    "auc_flag_quantity": AUC_SQL,
    "cramers_v_flag_status": CRAMERS_V_SQL,
    "benford_totalprice": BENFORD_SQL,
    "skew_kurtosis_quantity": SKEW_KURT_SQL,
    "ols_price_on_quantity": OLS_SQL,
}
