"""Relational/analytics surface, batch 23 (round 8 growth, fifth
wave): Kruskal–Wallis k-group rank test on the global-ranking chassis,
Yule's characteristic K, record-high days of the event series, the
recommender exposure Gini (popularity-bias audit), exact median/p90
inter-purchase gap via a bounded gap histogram, and per-dimension
embedding variance ranking.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-22, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness conventions (inherited): integer grains before any sum
(cents / micro-values / rank units); DECIMAL(38,0)/HUGEINT sufficient
statistics; terminal ratios either integer `div` (truncation parity,
measured) or the identical correctly-rounded double expression on both
engines; where a sum of non-integral doubles is unavoidable
(Kruskal–Wallis group terms), it runs as a CUMULATIVE window in a
DECLARED total order over a bounded relation, so both engines fold in
the same sequence and the result is bit-identical."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.text_queries2 import WORDS_SQL
from page_rank_mapreduce_java_spark.functions.textfn import words
from page_rank_mapreduce_java_spark.operators.ranking import global_row_number
from page_rank_mapreduce_java_spark.operators.recommend import (
    _INTER_CTE,
    _SIMS_CTE,
    _interactions,
    item_item_topk,
)
from page_rank_mapreduce_java_spark.operators.relational10 import (
    _DAILY_SQL,
    _daily_counts,
)


# --- Kruskal–Wallis H over event values by type --------------------------------


def q_kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test: do the k event types draw their values
    from the same distribution? The k-group generalization of the
    registered Mann–Whitney U (mannwhitney_u_quantity), computed on
    ties-averaged ranks (Kruskal & Wallis 1952, public literature).
    One row: (n, n_groups, h_milli, tie_denom_ppm, h_adj_milli) —
    h_adj is H divided by the standard tie-correction factor
    1 − ΣT/(n³−n), T = t³−t per tie group.

    Exactness: values snap to micro; ties-averaged ranks are exact
    integers (2·avg_rank) from the two-pass global-ranking chassis +
    per-distinct-value tie collapse (the lineitem_spearman machinery);
    per-group rank sums S_g and sizes n_g are exact DECIMAL(38,0);
    ΣT and n³−n are exact DECIMAL (n ≤ ~3×10¹²). The terminal
    H = 3/(n(n+1))·Σ S_g²/n_g − 3(n+1) sums its k group terms as a
    CUMULATIVE double window in ascending event_type order over the
    bounded type relation — a declared fold order, so both engines
    produce the bit-identical IEEE value before the single milli snap.

    Scale shape: one range exchange (chassis) + a value-grain tie
    collapse + one type-keyed aggregate; every window runs on the
    bounded (≤ distinct-type-count) relation.
    """
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    ranked = global_row_number(e, [F.asc("vm"), F.asc("event_id")], "rn")
    ties = ranked.groupBy("vm").agg(
        (F.lit(2) * F.min("rn") + F.count(F.lit(1)) - F.lit(1)).alias("r2"),
        F.count(F.lit(1)).alias("cnt"),
    )
    # exact tie term: ΣT = Σ cnt³ − cnt over distinct values
    cntd = F.col("cnt").cast("decimal(38,0)")
    tie = ties.agg(F.sum(cntd * cntd * cntd - cntd).alias("_tsum"))
    per_type = (
        ranked.join(ties.select("vm", "r2"), "vm")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum(F.col("r2").cast("decimal(38,0)")).alias("s2"),
        )
    )
    # declared-order fold of the k group terms (bounded relation)
    w_cum = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy("event_type")
    term = (
        F.lit(3000.0)
        * F.col("s2").cast("double")
        * F.col("s2").cast("double")
        / F.col("ng").cast("double")
    )
    folded = (
        per_type.select(
            "event_type",
            F.col("ng"),
            F.sum(term).over(w_cum).alias("u"),
            F.row_number().over(w_all).alias("_i"),
            F.count(F.lit(1)).over(
                Window.orderBy("event_type").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("k"),
            F.sum("ng").over(
                Window.orderBy("event_type").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
        .filter(F.col("_i") == F.col("k"))
    )
    nd = F.col("n").cast("double")
    h = F.col("u") / (nd * (nd + 1.0)) - 3000.0 * (nd + 1.0)
    out = folded.crossJoin(F.broadcast(tie)).select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_groups"),
        F.round(h).cast("long").alias("h_milli"),
        F.expr(
            "CAST(1000000 - (1000000 * _tsum) div"
            " (CAST(n AS DECIMAL(38,0)) * n * n - n) AS BIGINT)"
        ).alias("tie_denom_ppm"),
        F.round(
            h
            / (
                (
                    F.lit(1000000.0)
                    - (
                        F.lit(1000000.0)
                        * F.col("_tsum").cast("double")
                        / (nd * nd * nd - nd)
                    )
                )
                / 1e6
            )
        )
        .cast("long")
        .alias("h_adj_milli"),
    )
    return out


KRUSKAL_SQL = """
    WITH e AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vm
      FROM events),
    ranked AS (
      SELECT event_type, vm,
             row_number() OVER (ORDER BY vm, event_id) AS rn
      FROM e),
    ties AS (
      SELECT vm, 2 * MIN(rn) + COUNT(*) - 1 AS r2, COUNT(*) AS cnt
      FROM ranked GROUP BY 1),
    tie AS (
      SELECT SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tsum
      FROM ties),
    per_type AS (
      SELECT r.event_type, COUNT(*) AS ng,
             SUM(CAST(t.r2 AS HUGEINT)) AS s2
      FROM ranked r JOIN ties t ON r.vm = t.vm
      GROUP BY 1),
    folded AS (
      SELECT event_type,
             SUM(3000.0 * CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 / CAST(ng AS DOUBLE))
               OVER (ORDER BY event_type
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS u,
             row_number() OVER (ORDER BY event_type) AS i,
             COUNT(*) OVER () AS k,
             SUM(ng) OVER () AS n
      FROM per_type)
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_groups,
           CAST(ROUND(u / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                      - 3000.0 * (CAST(n AS DOUBLE) + 1.0), 0) AS BIGINT)
             AS h_milli,
           CAST(1000000 - (1000000 * tie.tsum)
                // (CAST(n AS HUGEINT) * n * n - n) AS BIGINT)
             AS tie_denom_ppm,
           CAST(ROUND((u / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                       - 3000.0 * (CAST(n AS DOUBLE) + 1.0))
                      / ((1000000.0 - (1000000.0 * CAST(tie.tsum AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                             * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))))
                         / 1e6), 0) AS BIGINT) AS h_adj_milli
    FROM folded, tie
    WHERE i = k
"""


# --- Yule's characteristic K per language ---------------------------------------


def q_text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per language — the classic
    size-invariant vocabulary-repetitiveness constant (Yule 1944):
    K = 10⁴·(Σ_m m²·V_m − N)/N², which over the term-frequency
    relation reduces to 10⁴·(Σ c² − N)/N² (each type of frequency c
    contributes c² to the spectrum sum). Complements Simpson (which
    draws without replacement) and hapax (the m=1 spectrum point).
    Output: (lang, n_tokens, yule_k_milli) — K in milli-units; higher
    = more repetitive.

    Exactness: Σc² rides DECIMAL(38,0)/HUGEINT; the milli snap is
    (10⁷·(Σc² − N)) div N² — integer division, truncation parity;
    exact while 10⁷·Σc² < 10³⁸ (N ≈ 5×10¹⁵ tokens even in the
    degenerate one-type corpus — past any 100 TB slice).

    Scale shape: the same two map-side-combinable shuffles as the
    hapax/Simpson family (word-keyed count, bounded lang rollup).
    """
    d = load_table(spark, "documents", sf_dir)
    tf = (
        d.select("lang", F.explode(words(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cd = F.col("cnt").cast("decimal(38,0)")
    return (
        tf.groupBy("lang")
        .agg(F.sum("cnt").alias("_n"), F.sum(cd * cd).alias("_c2"))
        .select(
            "lang",
            F.col("_n").cast("long").alias("n_tokens"),
            F.expr(
                "CAST((10000000 * (_c2 - _n))"
                " div (CAST(_n AS DECIMAL(38,0)) * _n) AS BIGINT)"
            ).alias("yule_k_milli"),
        )
    )


YULE_SQL = f"""
    WITH wx AS (SELECT lang, unnest({WORDS_SQL}) AS word FROM documents),
    tf AS (SELECT lang, word, COUNT(*) AS cnt FROM wx GROUP BY 1, 2),
    a AS (SELECT lang, SUM(CAST(cnt AS HUGEINT)) AS n,
                 SUM(CAST(cnt AS HUGEINT) * cnt) AS c2
          FROM tf GROUP BY 1)
    SELECT lang, CAST(n AS BIGINT) AS n_tokens,
           CAST((10000000 * (c2 - n)) // (n * n) AS BIGINT) AS yule_k_milli
    FROM a
"""


# --- record-high days of the daily event series ---------------------------------


def q_events_record_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days that set a new all-time high in daily event volume — the
    record-statistics view of the series (under a stationary i.i.d.
    series the expected record count is harmonic ≈ ln(days); a linear
    record count exposes trend without fitting one). Output one row
    per record: (record_no, day, c).

    Exactness: pure integer counting; a record is a STRICT new maximum
    (first day always counts).

    Scale shape: the fact table reduces to the calendar-bounded day
    series first; the running-max and numbering windows order that
    bounded relation only (the documented bounded-domain convention).
    """
    daily = _daily_counts(spark, sf_dir)
    w_prev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rec = (
        daily.withColumn("_pmax", F.max("c").over(w_prev))
        .filter(F.col("_pmax").isNull() | (F.col("c") > F.col("_pmax")))
    )
    w_num = Window.orderBy("day")
    return rec.select(
        F.row_number().over(w_num).cast("long").alias("record_no"),
        "day",
        "c",
    )


RECORD_DAYS_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    rec AS (
      SELECT day, c,
             MAX(c) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM daily)
    SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS record_no,
           day, c
    FROM rec WHERE pmax IS NULL OR c > pmax
"""


# --- recommender exposure Gini ---------------------------------------------------


def q_rec_exposure_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity-bias audit of the item-item recommender: the Gini
    coefficient of EXPOSURE — how many top-k neighbor lists each
    recommended item appears in (0 = every recommended item surfaces
    equally often, →1 = a few items dominate every list). The
    beyond-accuracy companion to rec_catalog_coverage: coverage counts
    who ever appears, exposure Gini measures how unequally. One row:
    (n_recommended, total_slots, gini_ppm).

    Exactness: the certified degree-Gini recipe (graph/linkpred.py:182)
    on exposure counts — G = Σ(2i−n−1)·x_(i)/(n·Σx) with the rank i
    from the two-pass global-ranking chassis, exact integers into one
    terminal correctly-rounded double ppm.

    Scale shape: the certified item_item_topk chassis (volume-sized
    pair exchange, memoized bound) → an item-keyed exposure count →
    the ranking chassis over the item-sized relation; no single-task
    fact window.
    """
    sims = item_item_topk(
        _interactions(spark, sf_dir), bound_key=f"rec_inter:{sf_dir}"
    )
    exp = sims.groupBy(F.col("neighbor_id").alias("item_id")).agg(
        F.count(F.lit(1)).alias("x")
    )
    r = global_row_number(exp, [F.asc("x"), F.asc("item_id")], out_col="i")
    tot = r.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
    num = r.crossJoin(F.broadcast(tot)).agg(
        F.first("n").alias("n_recommended"),
        F.first("sx").alias("total_slots"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x")).alias("_num"),
    )
    return num.select(
        F.col("n_recommended").cast("long").alias("n_recommended"),
        F.col("total_slots").cast("long").alias("total_slots"),
        F.round(
            F.col("_num").cast("double")
            / (
                F.col("n_recommended").cast("double")
                * F.col("total_slots").cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("gini_ppm"),
    )


EXPOSURE_GINI_SQL = f"""
    WITH {_INTER_CTE},
    {_SIMS_CTE},
    exposure AS (
      SELECT neighbor_id AS item_id, CAST(COUNT(*) AS BIGINT) AS x
      FROM sims GROUP BY 1),
    r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, item_id) AS BIGINT)
                    AS i
          FROM exposure),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx FROM r)
    SELECT n AS n_recommended, sx AS total_slots,
           CAST(ROUND(CAST(SUM((2 * i - n - 1) * x) AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6, 0)
                AS BIGINT) AS gini_ppm
    FROM r, t GROUP BY n, sx
"""


# --- exact median / p90 inter-purchase gap ---------------------------------------


def q_orders_interpurchase_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and p90 of the inter-purchase gap (days between a
    customer's consecutive orders) across ALL customers — the corpus-
    level cadence anchors behind churn thresholds (complementing
    order_interarrival_stats' per-customer means). One row:
    (n_gaps, median_gap_days, p90_gap_days).

    Exactness: gaps are exact integer day differences; both quantiles
    are nearest-rank positional picks — median at (n+1) div 2, p90 at
    (9n+9) div 10 = ceil(0.9n) — over the exact gap histogram. No
    interpolation.

    Scale shape: one LAG window per CUSTOMER (high-cardinality keyed
    window convention) → the gap histogram groupBy (gap domain is
    calendar-bounded: a few thousand distinct day values at ANY corpus
    size) → the cumulative pick runs on that bounded relation.
    """
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.to_date("o_orderdate").alias("day"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        o.withColumn("_prev", F.lag("day").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(F.datediff("day", "_prev").alias("gap"))
    )
    hist = gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum))
    tot = cum.agg(F.sum("cnt").alias("n_gaps"))
    picked = cum.crossJoin(F.broadcast(tot)).select(
        "gap",
        "cum",
        "cnt",
        "n_gaps",
        F.expr("(n_gaps + 1) div 2").alias("_mpos"),
        F.expr("(9 * n_gaps + 9) div 10").alias("_ppos"),
    )
    med = picked.filter(
        (F.col("cum") >= F.col("_mpos"))
        & (F.col("cum") - F.col("cnt") < F.col("_mpos"))
    ).select("n_gaps", F.col("gap").alias("median_gap_days"))
    p90 = picked.filter(
        (F.col("cum") >= F.col("_ppos"))
        & (F.col("cum") - F.col("cnt") < F.col("_ppos"))
    ).select(F.col("gap").alias("p90_gap_days"))
    return med.crossJoin(F.broadcast(p90)).select(
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.col("median_gap_days").cast("long").alias("median_gap_days"),
        F.col("p90_gap_days").cast("long").alias("p90_gap_days"),
    )


INTERPURCHASE_SQL = """
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, o_orderkey
      FROM orders),
    gaps AS (
      SELECT date_diff('day', lag(day) OVER (PARTITION BY o_custkey
                                             ORDER BY day, o_orderkey),
                       day) AS gap
      FROM o
      QUALIFY gap IS NOT NULL),
    hist AS (SELECT gap, COUNT(*) AS cnt FROM gaps GROUP BY 1),
    cum AS (
      SELECT gap, cnt,
             SUM(cnt) OVER (ORDER BY gap
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS n_gaps
      FROM hist)
    SELECT CAST(ANY_VALUE(n_gaps) AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN cum >= (n_gaps + 1) // 2
                          AND cum - cnt < (n_gaps + 1) // 2
                         THEN gap END) AS BIGINT) AS median_gap_days,
           CAST(MIN(CASE WHEN cum >= (9 * n_gaps + 9) // 10
                          AND cum - cnt < (9 * n_gaps + 9) // 10
                         THEN gap END) AS BIGINT) AS p90_gap_days
    FROM cum
    HAVING COUNT(*) > 0
"""
# HAVING COUNT(*) > 0: with NO gaps (empty/one-order-per-customer orders)
# the Spark pipeline emits 0 rows (empty med crossJoin), while the bare
# ungrouped aggregate would emit one all-NULL row (ADVICE r8 parity).


# --- per-dimension embedding variance ranking -------------------------------------


def q_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance of the embedding matrix, ranked — the
    whitening/feature-selection prep (a near-zero-variance dimension is
    dead weight in every distance computation; a dominant one distorts
    unnormalized distances). Output per dimension (64 rows):
    (pos, n, var_micro2, var_rank).

    Exactness: elements snap to integer micro BEFORE any sum (the
    norm-percentiles convention); population variance is the exact
    integer (n·Σv² − (Σv)²) div n² in micro² units — DECIMAL(38,0)
    sufficient statistics, integer division, truncation parity; the
    rank orders exact integers.

    Scale shape: posexplode → one map-side-combinable aggregate on the
    64-value dim key → a 64-row ranking window (bounded-domain
    convention).
    """
    e = load_table(spark, "embeddings", sf_dir)
    x = e.select(F.posexplode("embedding").alias("pos0", "v")).select(
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v").cast("double") * 1e6).cast("long").alias("vm"),
    )
    vd = F.col("vm").cast("decimal(38,0)")
    agg = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).alias("_s"),
        F.sum(vd * vd).alias("_q"),
    )
    var = agg.select(
        F.col("pos").cast("long").alias("pos"),
        F.col("n").cast("long").alias("n"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * _q - _s * _s)"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("var_micro2"),
    )
    w = Window.orderBy(F.desc("var_micro2"), F.asc("pos"))
    return var.withColumn(
        "var_rank", F.row_number().over(w).cast("long")
    )


DIM_VARIANCE_SQL = """
    WITH x AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0)
                  AS BIGINT) AS vm
      FROM embeddings),
    agg AS (
      SELECT pos, COUNT(*) AS n,
             SUM(CAST(vm AS HUGEINT)) AS s,
             SUM(CAST(vm AS HUGEINT) * vm) AS q
      FROM x GROUP BY 1),
    var AS (
      SELECT CAST(pos AS BIGINT) AS pos, CAST(n AS BIGINT) AS n,
             CAST((CAST(n AS HUGEINT) * q - s * s)
                  // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_micro2
      FROM agg)
    SELECT pos, n, var_micro2,
           CAST(row_number() OVER (ORDER BY var_micro2 DESC, pos)
                AS BIGINT) AS var_rank
    FROM var
"""


QUERIES = {
    "kruskal_wallis_value_by_type": q_kruskal_wallis_value_by_type,
    "text_yule_k": q_text_yule_k,
    "events_record_days": q_events_record_days,
    "rec_exposure_gini": q_rec_exposure_gini,
    "orders_interpurchase_median": q_orders_interpurchase_median,
    "embedding_dim_variance": q_embedding_dim_variance,
}

ORACLES = {
    "kruskal_wallis_value_by_type": KRUSKAL_SQL,
    "text_yule_k": YULE_SQL,
    "events_record_days": RECORD_DAYS_SQL,
    "rec_exposure_gini": EXPOSURE_GINI_SQL,
    "orders_interpurchase_median": INTERPURCHASE_SQL,
    "embedding_dim_variance": DIM_VARIANCE_SQL,
}
