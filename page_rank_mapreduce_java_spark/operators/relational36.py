"""Relational/analytics surface, batch 36 (round 10 growth, second
wave): precision-recall ranking quality (average precision), ordinal
and standardized effect sizes (Cliff's delta, Cohen's d / Hedges g /
Glass delta), sequence randomness (Wald-Wolfowitz runs test),
embedding separability diagnostics (Fisher discriminant ratio,
participation-ratio effective dimensionality), beyond-accuracy
recommender novelty, and a temporal referential-integrity audit.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline
family). Registered in the same round-10 window as batch 35 (demand
stays ≤ 50).

Exactness: the module-wide sufficient-statistics contract — integer
quantization before any sum, DECIMAL(38,0)/HUGEINT accumulators,
integer `div`-`//` truncation parity, shared terminal double
expressions, and the deterministic ln (ln_int_sql) wherever a log
enters. The runs-test and PR-curve windows run over BOUNDED relations
(≤ |distinct days| / ≤ 50 quantity values), never the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql
from page_rank_mapreduce_java_spark.operators.recommend import (
    _INTER_CTE,
    _SIMS_CTE,
    _interactions,
    item_item_topk,
)

# --- auc_pr_flag_quantity (average precision) ----------------------------------


def q_auc_pr_flag_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC) of l_quantity as a score for the
    returned-vs-accepted label — the precision-recall twin of
    auc_flag_quantity (ROC-AUC is prevalence-blind; under class
    imbalance the PR curve is the one that moves, which is why
    retrieval and dedup pipelines report AP). Sweeping the threshold
    down the ≤50-value quantity domain:
    AP = Σ_v ΔTP(v)·precision(v) / P. Output one row:
    (n_pos, n_neg, ap_ppm, baseline_ppm) — baseline is the positive
    prevalence, the AP of a random ranker.

    Exactness: pure integer counting on the bounded histogram;
    precision snaps to integer ppm per threshold via `div` BEFORE the
    ΔTP weighting (truncation parity), and the final mean is again
    integer `div`.

    Scale shape: one map-side-combined groupBy to ≤50 rows; the
    threshold sweep is a window over that bounded relation.
    """
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "A")
    )
    per_v = l.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("cr"),
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("ca"),
    )
    w = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = per_v.select(
        "cr",
        F.sum("cr").over(w).alias("tp"),
        F.sum("ca").over(w).alias("fp"),
    ).select(
        "cr",
        F.expr("CAST(1000000 * tp div (tp + fp) AS BIGINT)").alias(
            "prec_ppm"
        ),
    )
    agg = d.agg(
        F.sum("cr").alias("p"),
        F.sum(F.col("cr") * F.col("prec_ppm")).alias("wsum"),
    )
    tot = l.agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias(
            "n_neg"
        )
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.expr("CAST(wsum div p AS BIGINT)").alias("ap_ppm"),
        F.expr("CAST(1000000 * p div (p + n_neg) AS BIGINT)").alias(
            "baseline_ppm"
        ),
    )


AUC_PR_SQL = """
    WITH per_v AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cr,
             SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca
      FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1),
    d AS (
      SELECT cr,
             CAST(1000000 * SUM(cr) OVER (ORDER BY v DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  // (SUM(cr) OVER (ORDER BY v DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      + SUM(ca) OVER (ORDER BY v DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  AS BIGINT) AS prec_ppm
      FROM per_v),
    agg AS (
      SELECT SUM(cr) AS p, SUM(cr * prec_ppm) AS wsum FROM d),
    tot AS (
      SELECT SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS n_neg
      FROM lineitem WHERE l_returnflag IN ('R', 'A'))
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CAST(wsum // p AS BIGINT) AS ap_ppm,
           CAST(1000000 * p // (p + n_neg) AS BIGINT) AS baseline_ppm
    FROM agg, tot
"""


# --- cliffs_delta_quantity ------------------------------------------------------


def q_cliffs_delta_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta for l_quantity between returned ('R') and
    non-returned ('N') line items — the ordinal effect size on top of
    the Mann-Whitney machinery (U says WHETHER the distributions
    differ; δ = P(R>N) − P(R<N) ∈ [−1,1] says by HOW MUCH, robustly,
    with the conventional |δ|<0.147 'negligible' reading). Output one
    row: (n_a, n_b, delta_micro).

    Exactness: doubled tied midranks keep the rank sum integral
    (the mannwhitney_u convention); δ = u2_a/(n_a·n_b) − 1 is one
    shared terminal expression rounded to micro.

    Scale shape: the ≤50-row quantity histogram + its cumulative
    window; nothing unbounded past the first map-side-combined agg.
    """
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "N")
    )
    h = l.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    d = h.withColumn(
        "_b", F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
    )
    r2 = F.lit(2) * F.col("_b") + F.col("ca") + F.col("cb") + F.lit(1)
    agg = d.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca").cast("decimal(38,0)") * r2.cast("decimal(38,0)")
        ).alias("sr2"),
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr(
            "CAST(ROUND(1e6 * ((CAST(sr2 AS DOUBLE)"
            " - CAST(n_a AS DOUBLE) * CAST(n_a + 1 AS DOUBLE))"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) - 1.0),"
            " 0) AS BIGINT)"
        ).alias("delta_micro"),
    )


CLIFFS_DELTA_SQL = """
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS cb
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
    d AS (
      SELECT ca, cb,
             COALESCE(SUM(ca + cb) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
      FROM h),
    agg AS (
      SELECT SUM(ca) AS n_a, SUM(cb) AS n_b,
             SUM(CAST(ca AS HUGEINT)
                 * CAST(2 * b + ca + cb + 1 AS HUGEINT)) AS sr2
      FROM d)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(ROUND(1e6 * ((CAST(sr2 AS DOUBLE)
                - CAST(n_a AS DOUBLE) * CAST(n_a + 1 AS DOUBLE))
                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) - 1.0),
                0) AS BIGINT) AS delta_micro
    FROM agg
"""


# --- effect_size_price_flag -----------------------------------------------------

# Group sample variance from exact (n, Σx, Σx²):
#   s² = (n·Σx² − (Σx)²) / (n·(n−1))
_VAR_A = (
    "((CAST(n_a AS DOUBLE) * CAST(ss_a AS DOUBLE)"
    " - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))"
    " / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))"
)
_VAR_B = (
    "((CAST(n_b AS DOUBLE) * CAST(ss_b AS DOUBLE)"
    " - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))"
    " / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))"
)
_MEAN_DIFF = (
    "(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
)
_POOLED_SD = (
    f"sqrt(((CAST(n_a AS DOUBLE) - 1.0) * {_VAR_A}"
    f" + (CAST(n_b AS DOUBLE) - 1.0) * {_VAR_B})"
    " / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0))"
)
_COHENS_D = f"CAST(ROUND(1e3 * {_MEAN_DIFF} / {_POOLED_SD}, 0) AS BIGINT)"
_HEDGES_G = (
    f"CAST(ROUND(1e3 * ({_MEAN_DIFF} / {_POOLED_SD})"
    " * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    " - 9.0)), 0) AS BIGINT)"
)
_GLASS_DELTA = (
    f"CAST(ROUND(1e3 * {_MEAN_DIFF} / sqrt({_VAR_B}), 0) AS BIGINT)"
)


def q_effect_size_price_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes of the returned-vs-non-returned price
    difference — the 'is it LARGE?' companion to welch_ttest_price_flag
    (a t-statistic grows with n; d/g/Δ do not): Cohen's d on the pooled
    SD, the small-sample Hedges g correction, and Glass's Δ on the
    control-group SD. Output one row:
    (n_a, n_b, cohens_d_milli, hedges_g_milli, glass_delta_milli).

    Exactness: the welch sufficient-statistics chassis verbatim (exact
    cents, DECIMAL(38,0)/HUGEINT n-Σx-Σx² in ONE map-side-combined
    pass); all three estimates are shared terminal expressions (sqrt is
    IEEE-correctly-rounded) rounded to milli.

    Scale shape: full scan → 1-row relation; no shuffle beyond the
    partial-agg exchange.
    """
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "N")
    )
    x = cents("l_extendedprice").cast("decimal(38,0)")
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
        F.expr(_COHENS_D).alias("cohens_d_milli"),
        F.expr(_HEDGES_G).alias("hedges_g_milli"),
        F.expr(_GLASS_DELTA).alias("glass_delta_milli"),
    )


def _effect_size_sql() -> str:
    c = cents_sql("l_extendedprice")
    return f"""
    WITH agg AS (
      SELECT
        SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST({c} AS HUGEINT) ELSE 0 END) AS s_a,
        SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST({c} AS HUGEINT) ELSE 0 END) AS s_b,
        SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST({c} AS HUGEINT) * CAST({c} AS HUGEINT)
                 ELSE 0 END) AS ss_a,
        SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST({c} AS HUGEINT) * CAST({c} AS HUGEINT)
                 ELSE 0 END) AS ss_b
      FROM lineitem WHERE l_returnflag IN ('R', 'N'))
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           {_COHENS_D} AS cohens_d_milli,
           {_HEDGES_G} AS hedges_g_milli,
           {_GLASS_DELTA} AS glass_delta_milli
    FROM agg
"""


# --- orders_runs_test_daily -----------------------------------------------------

# Wald-Wolfowitz z over the above/below-median run count:
#   mu = 2·n1·n2/(n1+n2) + 1
#   var = 2·n1·n2·(2·n1·n2 − n1 − n2) / ((n1+n2)²·(n1+n2−1))
# Degenerate guard (shared): z is defined only when both signs occur
# and the variance is positive (2·n1·n2 > n1+n2 — false exactly for
# n1=n2=1 or a missing sign, which the tiny-SF corpus produces when
# every day sits at the median); the degenerate value is 0 by
# convention so the row stays hashable.
_RUNS_Z = """
    CASE WHEN n_above >= 1 AND n_below >= 1
          AND 2 * n_above * n_below > n_above + n_below THEN
    CAST(ROUND(1e3 *
      (CAST(n_runs AS DOUBLE)
       - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
          / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)) + 1.0))
      / sqrt(
        (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
         * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
            - CAST(n_above AS DOUBLE) - CAST(n_below AS DOUBLE)))
        / ((CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
           * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
           * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE) - 1.0))),
      0) AS BIGINT)
    ELSE CAST(0 AS BIGINT) END
"""


def q_orders_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily order-count series: is the
    above/below-median sign sequence random, or does demand cluster
    (fewer runs → momentum/regimes; more runs → oscillation)? The
    sequence-randomness primitive behind trend-break monitoring, next
    to events_changepoint/cusum which locate WHERE — this tests
    WHETHER. Days exactly at the median drop (the standard
    convention). Output one row:
    (n_days_used, n_above, n_below, n_runs, z_milli).

    Exactness: day counts are integers; the median of integers is an
    exact half-integer on both engines (midpoint interpolation); run
    counting is pure integer window arithmetic over the bounded daily
    relation; z is one shared terminal expression rounded to milli.

    Scale shape: the fact table collapses to one row per DAY (bounded
    ~2.4k at any SF) in one map-side-combined agg; the lag window and
    the run count run on that bounded relation (bounded-domain
    convention).
    """
    o = load_table(spark, "orders", sf_dir).select(
        F.to_date("o_orderdate").alias("day")
    )
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("cnt"))
    med = daily.agg(F.expr("percentile(cnt, 0.5)").alias("med"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("cnt") != F.col("med"))
        .select(
            "day", (F.col("cnt") > F.col("med")).cast("int").alias("sgn")
        )
    )
    w = Window.orderBy("day")
    runs = signed.select(
        "sgn",
        F.when(
            F.lag("sgn").over(w).isNull()
            | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum("sgn").alias("n_above"),
        F.sum(F.lit(1) - F.col("sgn")).alias("n_below"),
        F.sum("new_run").alias("n_runs"),
    )
    return agg.select(
        F.col("n_used").cast("long").alias("n_days_used"),
        F.col("n_above").cast("long").alias("n_above"),
        F.col("n_below").cast("long").alias("n_below"),
        F.col("n_runs").cast("long").alias("n_runs"),
        F.expr(_RUNS_Z).alias("z_milli"),
    )


RUNS_TEST_SQL = f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt
      FROM orders GROUP BY 1),
    med AS (SELECT quantile_cont(cnt, 0.5) AS med FROM daily),
    signed AS (
      SELECT day, CASE WHEN cnt > med THEN 1 ELSE 0 END AS sgn
      FROM daily, med WHERE cnt <> med),
    runs AS (
      SELECT sgn,
             CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                    OR lag(sgn) OVER (ORDER BY day) <> sgn
                  THEN 1 ELSE 0 END AS new_run
      FROM signed),
    agg AS (
      SELECT COUNT(*) AS n_used, SUM(sgn) AS n_above,
             SUM(1 - sgn) AS n_below, SUM(new_run) AS n_runs
      FROM runs)
    SELECT CAST(n_used AS BIGINT) AS n_days_used,
           CAST(n_above AS BIGINT) AS n_above,
           CAST(n_below AS BIGINT) AS n_below,
           CAST(n_runs AS BIGINT) AS n_runs,
           {_RUNS_Z} AS z_milli
    FROM agg
"""


# --- embedding_fisher_ratio -----------------------------------------------------


def q_embedding_fisher_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher discriminant ratio of the labeled embedding corpus —
    trace(between-class scatter) / trace(within-class scatter) under
    the diagonal model: how linearly separable the label structure is
    BEFORE any classifier is trained (silhouette samples pairwise
    geometry; Fisher is the sufficient-statistics answer, one pass, no
    pairs). Output one row: (n_vectors, n_labels, fisher_milli).

    Exactness: elements snap to integer micro; per-(label, dim)
    sufficient statistics (n_l, Σv, Σv²) are DECIMAL(38,0)/HUGEINT;
    each scatter term snaps to an exact scaled integer via `div`
    (within: (n_l·q − s²)·1000 div n_l; between:
    (s_ld·n − s_d·n_l)²·1000 div (n_l·n·n)) so both traces are exact
    integer sums; the ratio is one shared terminal expression.

    Scale shape: posexplode → ONE (label×64)-row stats aggregate →
    broadcast per-dim totals onto the bounded stats relation → 1-row
    rollup. The fact table is touched once.
    """
    e = load_table(spark, "embeddings", sf_dir)
    x = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.round(F.col("v").cast("double") * 1e6)
        .cast("decimal(38,0)")
        .alias("vm"),
    )
    lp = x.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("nl"),
        F.sum("vm").alias("sl"),
        F.sum(F.col("vm") * F.col("vm")).alias("ql"),
    )
    per_pos = lp.groupBy("pos").agg(
        F.sum("nl").alias("n"), F.sum("sl").alias("sd")
    )
    terms = lp.join(F.broadcast(per_pos), "pos").select(
        "label",
        F.expr(
            "CAST(((CAST(nl AS DECIMAL(38,0)) * ql - sl * sl) * 1000)"
            " div nl AS DECIMAL(38,0))"
        ).alias("w_term"),
        F.expr(
            "CAST(((sl * n - sd * nl) * (sl * n - sd * nl) * 1000)"
            " div (CAST(nl AS DECIMAL(38,0)) * n * n) AS DECIMAL(38,0))"
        ).alias("b_term"),
    )
    agg = terms.agg(
        F.countDistinct("label").alias("n_labels"),
        F.sum("w_term").alias("wt"),
        F.sum("b_term").alias("bt"),
    )
    nv = e.agg(F.count(F.lit(1)).alias("n_vectors"))
    return nv.crossJoin(F.broadcast(agg)).select(
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.col("n_labels").cast("long").alias("n_labels"),
        F.expr(
            "CAST(ROUND(1e3 * CAST(bt AS DOUBLE) / CAST(wt AS DOUBLE), 0)"
            " AS BIGINT)"
        ).alias("fisher_milli"),
    )


FISHER_RATIO_SQL = """
    WITH x AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0)
                  AS HUGEINT) AS vm
      FROM embeddings),
    lp AS (
      SELECT label, pos, COUNT(*) AS nl, SUM(vm) AS sl,
             SUM(vm * vm) AS ql
      FROM x GROUP BY 1, 2),
    per_pos AS (
      SELECT pos, SUM(nl) AS n, SUM(sl) AS sd FROM lp GROUP BY 1),
    terms AS (
      SELECT label,
             ((CAST(nl AS HUGEINT) * ql - sl * sl) * 1000) // nl AS w_term,
             ((sl * n - sd * nl) * (sl * n - sd * nl) * 1000)
               // (CAST(nl AS HUGEINT) * n * n) AS b_term
      FROM lp JOIN per_pos ON lp.pos = per_pos.pos),
    agg AS (
      SELECT COUNT(DISTINCT label) AS n_labels,
             SUM(w_term) AS wt, SUM(b_term) AS bt
      FROM terms),
    nv AS (SELECT COUNT(*) AS n_vectors FROM embeddings)
    SELECT CAST(n_vectors AS BIGINT) AS n_vectors,
           CAST(n_labels AS BIGINT) AS n_labels,
           CAST(ROUND(1e3 * CAST(bt AS DOUBLE) / CAST(wt AS DOUBLE), 0)
                AS BIGINT) AS fisher_milli
    FROM nv, agg
"""


# --- embedding_participation_ratio ----------------------------------------------


def q_embedding_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Participation-ratio effective dimensionality of the embedding
    corpus under the diagonal model: PR = (Σ_d var_d)² / Σ_d var_d² —
    how many dimensions the variance actually lives in (PR = 64 for
    isotropic, PR → 1 for rank-collapse; the one-number summary of
    embedding_dim_variance's 64-row profile and the quickest detector
    of representation collapse after a bad training run). Output one
    row: (n_dims, total_var_micro2, pr_milli).

    Exactness: per-dimension population variances are the exact
    integers of the dim-variance convention ((n·Σv² − (Σv)²) div n²
    in micro² units); PR is one shared terminal expression over their
    exact integer sum and sum-of-squares.

    Scale shape: posexplode → one 64-row aggregate → 1-row terminal.
    """
    e = load_table(spark, "embeddings", sf_dir)
    x = e.select(F.posexplode("embedding").alias("pos", "v")).select(
        "pos",
        F.round(F.col("v").cast("double") * 1e6)
        .cast("decimal(38,0)")
        .alias("vm"),
    )
    per_dim = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).alias("q"),
    ).select(
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * q - s * s)"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS DECIMAL(38,0))"
        ).alias("var_micro2")
    )
    agg = per_dim.agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum("var_micro2").alias("sv"),
        F.sum(F.col("var_micro2") * F.col("var_micro2")).alias("qv"),
    )
    return agg.select(
        F.col("n_dims").cast("long").alias("n_dims"),
        F.col("sv").cast("long").alias("total_var_micro2"),
        F.expr(
            "CAST(ROUND(1e3 * CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)"
            " / CAST(qv AS DOUBLE), 0) AS BIGINT)"
        ).alias("pr_milli"),
    )


PARTICIPATION_RATIO_SQL = """
    WITH x AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0)
                  AS HUGEINT) AS vm
      FROM embeddings),
    per_dim AS (
      SELECT (CAST(COUNT(*) AS HUGEINT) * SUM(vm * vm)
              - SUM(vm) * SUM(vm))
             // (CAST(COUNT(*) AS HUGEINT) * COUNT(*)) AS var_micro2
      FROM x GROUP BY pos),
    agg AS (
      SELECT COUNT(*) AS n_dims, SUM(var_micro2) AS sv,
             SUM(var_micro2 * var_micro2) AS qv
      FROM per_dim)
    SELECT CAST(n_dims AS BIGINT) AS n_dims,
           CAST(sv AS BIGINT) AS total_var_micro2,
           CAST(ROUND(1e3 * CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                / CAST(qv AS DOUBLE), 0) AS BIGINT) AS pr_milli
    FROM agg
"""


# --- rec_novelty_itemitem -------------------------------------------------------


def q_rec_novelty_itemitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean novelty (self-information) of the item-item recommender's
    neighbor lists: −ln(pop_j / T) averaged over every top-k entry,
    where pop_j is the recommended item's interaction count and T the
    corpus total — the beyond-accuracy metric that catches popularity
    bias (rec_catalog_coverage asks how much of the catalog is ever
    surfaced; novelty asks how far DOWN the popularity curve the lists
    reach). Output one row: (n_entries, mean_novelty_micro).

    Exactness: popularity counts are exact integers; each entry's
    novelty ln(T) − ln(pop_j) goes through the deterministic ln
    (ln_int_sql) with BOTH terms snapped to integer micro-nats before
    the subtraction, so the sum and the final `div` mean are pure
    integer arithmetic.

    Scale shape: the certified item_item_topk chassis (volume-sized
    pair exchange, memoized bound) + an item-keyed popularity
    aggregate joined onto the k·|items| list relation + a 1-row mean.
    """
    inter = _interactions(spark, sf_dir)
    sims = item_item_topk(inter, bound_key=f"rec_inter:{sf_dir}")
    pop = inter.groupBy(F.col("item_id").alias("neighbor_id")).agg(
        F.sum("c").alias("pop")
    )
    tot = inter.agg(F.sum("c").alias("t"))
    ln_pop = ln_int_sql("pop", "spark")
    ln_t = ln_int_sql("t", "spark")
    entries = (
        sims.join(pop, "neighbor_id")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.expr(f"CAST(ROUND(1e6 * {ln_t}, 0) AS BIGINT)")
                - F.expr(f"CAST(ROUND(1e6 * {ln_pop}, 0) AS BIGINT)")
            ).alias("novelty_micro")
        )
    )
    return entries.agg(
        F.count(F.lit(1)).cast("long").alias("n_entries"),
        F.expr("CAST(sum(novelty_micro) div count(1) AS BIGINT)").alias(
            "mean_novelty_micro"
        ),
    )


def _novelty_sql() -> str:
    ln_pop = ln_int_sql("pop", "duckdb")
    ln_t = ln_int_sql("t", "duckdb")
    return f"""
    WITH {_INTER_CTE},
    {_SIMS_CTE},
    pop AS (SELECT item_id AS neighbor_id, SUM(c) AS pop
            FROM inter GROUP BY 1),
    tot AS (SELECT SUM(c) AS t FROM inter),
    entries AS (
      SELECT CAST(ROUND(1e6 * {ln_t}, 0) AS BIGINT)
             - CAST(ROUND(1e6 * {ln_pop}, 0) AS BIGINT) AS novelty_micro
      FROM sims JOIN pop ON sims.neighbor_id = pop.neighbor_id, tot)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(novelty_micro) // COUNT(*) AS BIGINT)
             AS mean_novelty_micro
    FROM entries
"""


# --- dq_ship_before_order -------------------------------------------------------


def q_dq_ship_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal referential-integrity audit: line items whose ship date
    precedes their order's order date — the cross-table impossibility
    class (dq_fk_violations checks the keys EXIST; this checks the
    child's timeline is CONSISTENT with the parent's). Output one row:
    (n_lineitems, n_violations, violation_ppm, max_violation_days),
    where max_violation_days is the magnitude of the WORST violation
    (days the ship date precedes the order date; 0 when none).

    Exactness: pure integer date arithmetic and counting; ppm via
    integer `div`.

    Scale shape: one orderkey equi-join (both sides pre-hashed on the
    join key at scale; no dimension small enough to broadcast) → one
    1-row aggregate.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("odate"),
    )
    j = li.join(o, "l_orderkey").select(
        (F.col("ship") < F.col("odate")).cast("long").alias("viol"),
        F.when(
            F.col("ship") < F.col("odate"),
            F.datediff(F.col("odate"), F.col("ship")),
        )
        .otherwise(F.lit(0))
        .alias("violation_days"),
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum("viol").cast("long").alias("n_violations"),
        F.expr("CAST(1000000 * sum(viol) div count(1) AS BIGINT)").alias(
            "violation_ppm"
        ),
        F.max("violation_days").cast("long").alias("max_violation_days"),
    )


DQ_SHIP_BEFORE_ORDER_SQL = """
    WITH j AS (
      SELECT CASE WHEN CAST(l_shipdate AS DATE) < CAST(o_orderdate AS DATE)
                  THEN 1 ELSE 0 END AS viol,
             CASE WHEN CAST(l_shipdate AS DATE) < CAST(o_orderdate AS DATE)
                  THEN datediff('day', CAST(l_shipdate AS DATE),
                                CAST(o_orderdate AS DATE))
                  ELSE 0 END AS violation_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(viol) AS BIGINT) AS n_violations,
           CAST(1000000 * SUM(viol) // COUNT(*) AS BIGINT)
             AS violation_ppm,
           CAST(MAX(violation_days) AS BIGINT) AS max_violation_days
    FROM j
"""


QUERIES = {
    "auc_pr_flag_quantity": q_auc_pr_flag_quantity,
    "cliffs_delta_quantity": q_cliffs_delta_quantity,
    "effect_size_price_flag": q_effect_size_price_flag,
    "orders_runs_test_daily": q_orders_runs_test_daily,
    "embedding_fisher_ratio": q_embedding_fisher_ratio,
    "embedding_participation_ratio": q_embedding_participation_ratio,
    "rec_novelty_itemitem": q_rec_novelty_itemitem,
    "dq_ship_before_order": q_dq_ship_before_order,
}

ORACLES = {
    "auc_pr_flag_quantity": AUC_PR_SQL,
    "cliffs_delta_quantity": CLIFFS_DELTA_SQL,
    "effect_size_price_flag": _effect_size_sql(),
    "orders_runs_test_daily": RUNS_TEST_SQL,
    "embedding_fisher_ratio": FISHER_RATIO_SQL,
    "embedding_participation_ratio": PARTICIPATION_RATIO_SQL,
    "rec_novelty_itemitem": _novelty_sql(),
    "dq_ship_before_order": DQ_SHIP_BEFORE_ORDER_SQL,
}
