"""Relational/analytics surface, batch 22 (round 8 growth, fourth
wave): Spearman rank correlation on the two-pass global-ranking
chassis, the Theil–Sen robust trend slope, user–user collaborative
filtering on the volume-sized pair chassis, day-of-week variance share
(eta-squared), hapax-legomena rate, Simpson lexical diversity, and
deterministic systematic sampling.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-21, registered after the round-8 audit window filled:
locally oracle-certified (tools/check_oracle.py at sf0.001 and sf0.01)
and deferred to the round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness conventions (inherited): money in exact integer cents; event
values at the established micro grain; every terminal ratio snapped to
ppm/milli; rank statistics ride DECIMAL(38,0)/HUGEINT sufficient
statistics with the terminal a/√(b·c) evaluated as the IDENTICAL
correctly-rounded double expression on both engines (the
corr_pairs_lineitem contract); integer division is `div`/`//` on
BIGINT-typed operands, where both engines truncate toward zero
(measured — see similarity/queries.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.textfn import words
from page_rank_mapreduce_java_spark.functions.text_queries2 import WORDS_SQL
from page_rank_mapreduce_java_spark.operators.ranking import global_row_number
from page_rank_mapreduce_java_spark.operators.recommend import (
    REC_MIN_SUPPORT,
    _interactions,
)
from page_rank_mapreduce_java_spark.plans.pairsize import (
    sum_sq_group_bound,
    volume_repartition_pairs,
)


# --- Spearman rank correlation (ties-averaged), quantity vs price ------------


def q_lineitem_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_extendedprice
    — the monotone-association screen that Pearson (corr_pairs_lineitem)
    misses when the relationship is nonlinear. One row:
    (n, rho_ppm).

    Ranks are the SQL-standard ties-averaged ranks, carried as exact
    integers via 2·avg_rank (= 2·count_less + count_eq + 1, always
    integral):
      - quantity ranks come from the bounded-domain cumulative window
        over the ≤50 distinct quantity values (the documented
        bounded-domain single-task-window convention);
      - price ranks come from the certified two-pass global-ranking
        chassis (one range exchange), tie-averaged per distinct price
        as 2·min(rn) + count − 1 (rows of equal price are contiguous
        in the (price, orderkey, linenumber) total order).

    Exactness: the five sufficient statistics ride DECIMAL(38,0)/
    HUGEINT (Σ(2r)² ≤ 4n³ < 10³⁸ up to n ≈ 2.9×10¹², comfortably past
    a 100 TB lineitem); only the terminal a/(√b·√c) is floating — the
    identical correctly-rounded expression on both engines (the
    corr_pairs contract), so no half-ulp ppm flips.

    Scale shape: one range exchange (chassis) + a price-keyed
    aggregate/join (high-cardinality key) + a broadcast of the ≤50-row
    quantity rank table + one full-table aggregate. No fact-scale
    single-task window anywhere.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_quantity").cast("long").alias("q"),
        cents("l_extendedprice").alias("p"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    # quantity 2·avg-ranks over the bounded value domain
    qcnt = li.groupBy("q").agg(F.count(F.lit(1)).alias("cnt"))
    w_q = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    qa = qcnt.select(
        "q",
        (
            F.lit(2) * F.coalesce(F.sum("cnt").over(w_q), F.lit(0))
            + F.col("cnt")
            + F.lit(1)
        ).alias("ra"),
    )
    # price 2·avg-ranks via the global-ranking chassis
    ranked = global_row_number(li, [F.asc("p"), F.asc("ok"), F.asc("ln")], "rn")
    pr = ranked.groupBy("p").agg(
        (F.lit(2) * F.min("rn") + F.count(F.lit(1)) - F.lit(1)).alias("rb")
    )
    joined = (
        ranked.join(pr, "p").join(F.broadcast(qa), "q").select("ra", "rb")
    )
    rad = F.col("ra").cast("decimal(38,0)")
    rbd = F.col("rb").cast("decimal(38,0)")
    s = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rad).alias("_sa"),
        F.sum(rbd).alias("_sb"),
        F.sum(rad * rad).alias("_saa"),
        F.sum(rad * rbd).alias("_sab"),
        F.sum(rbd * rbd).alias("_sbb"),
    )
    nd = F.col("n").cast("double")
    sa = F.col("_sa").cast("double")
    sb = F.col("_sb").cast("double")
    saa = F.col("_saa").cast("double")
    sab = F.col("_sab").cast("double")
    sbb = F.col("_sbb").cast("double")
    rho = F.try_divide(
        nd * sab - sa * sb,
        F.sqrt(F.greatest(nd * saa - sa * sa, F.lit(0.0)))
        * F.sqrt(F.greatest(nd * sbb - sb * sb, F.lit(0.0))),
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.coalesce(
            F.round(rho * 1e6).cast("long"), F.lit(-2_000_000)
        ).alias("rho_ppm"),
    )


SPEARMAN_SQL = f"""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             {cents_sql("l_extendedprice")} AS p,
             l_orderkey AS ok, l_linenumber AS ln
      FROM lineitem),
    qcnt AS (SELECT q, COUNT(*) AS cnt FROM li GROUP BY 1),
    qa AS (SELECT q,
                  2 * (SUM(cnt) OVER (ORDER BY q) - cnt) + cnt + 1 AS ra
           FROM qcnt),
    ranked AS (SELECT q, p,
                      row_number() OVER (ORDER BY p, ok, ln) AS rn
               FROM li),
    pr AS (SELECT p, 2 * MIN(rn) + COUNT(*) - 1 AS rb
           FROM ranked GROUP BY 1),
    joined AS (SELECT qa.ra AS ra, pr.rb AS rb
               FROM ranked r JOIN pr ON r.p = pr.p
                             JOIN qa ON r.q = qa.q),
    s AS (SELECT COUNT(*) AS n,
                 SUM(CAST(ra AS HUGEINT)) AS sa,
                 SUM(CAST(rb AS HUGEINT)) AS sb,
                 SUM(CAST(ra AS HUGEINT) * ra) AS saa,
                 SUM(CAST(ra AS HUGEINT) * rb) AS sab,
                 SUM(CAST(rb AS HUGEINT) * rb) AS sbb
          FROM joined)
    SELECT CAST(n AS BIGINT) AS n,
           COALESCE(CAST(ROUND(
             (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / (SQRT(GREATEST(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE), 0.0))
                * SQRT(GREATEST(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE), 0.0)))
             * 1e6, 0) AS BIGINT), -2000000) AS rho_ppm
    FROM s
"""


# --- Theil–Sen robust monthly revenue trend -----------------------------------


def q_orders_theil_sen_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the monthly revenue trend: the MEDIAN of
    all pairwise slopes (rev_j − rev_i)/(m_j − m_i) over month pairs
    i < j — the robust alternative to the OLS slope
    (ols_price_on_quantity family), with a 29.3% breakdown point
    (Sen 1968, public literature). One row:
    (n_months, n_pairs, slope_milli_per_month).

    Exactness: revenue in exact cents; each pairwise slope is
    (1000·Δrev) div Δm on BIGINT — both engines truncate toward zero
    (the measured `div`/`//` parity) — and the median is the exact
    lower median (position (n+1) div 2) under the total order
    (slope, m_i, m_j), so no interpolation and no floats anywhere.

    Scale shape: the fact table reduces to the calendar-bounded month
    series (≤ hundreds of rows at ANY corpus size) before the pairwise
    self-join, so the O(months²) pair relation is bounded (~3k rows) —
    the bounded-cross convention; the median window orders that bounded
    relation only.
    """
    o = load_table(spark, "orders", sf_dir)
    monthly = (
        o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("m")
        )
        .agg(F.sum(cents("o_totalprice")).alias("rev"))
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = (
        a.join(F.broadcast(b), F.col("a.m") < F.col("b.m"))
        .select(
            F.col("a.m").alias("mi"),
            F.col("b.m").alias("mj"),
            F.col("a.rev").alias("ri"),
            F.col("b.rev").alias("rj"),
        )
        .select(
            "mi",
            "mj",
            F.expr("(1000 * (rj - ri)) div (mj - mi)").alias("slope_milli"),
        )
    )
    w = Window.orderBy("slope_milli", "mi", "mj")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    n_months = monthly.agg(F.count(F.lit(1)).alias("n_months"))
    tot = ranked.agg(F.count(F.lit(1)).alias("n_pairs"))
    med = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select("n_pairs", F.col("slope_milli").alias("slope_milli_per_month"))
    )
    return n_months.crossJoin(F.broadcast(med)).select(
        F.col("n_months").cast("long").alias("n_months"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        "slope_milli_per_month",
    )


THEIL_SEN_SQL = f"""
    WITH monthly AS (
      SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT)
               AS m,
             SUM({cents_sql("o_totalprice")}) AS rev
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT a.m AS mi, b.m AS mj,
             (1000 * (CAST(b.rev AS BIGINT) - CAST(a.rev AS BIGINT)))
               // (b.m - a.m) AS slope_milli
      FROM monthly a JOIN monthly b ON a.m < b.m),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY slope_milli, mi, mj) AS rn,
             COUNT(*) OVER () AS n_pairs
      FROM pairs)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM monthly) AS n_months,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           slope_milli AS slope_milli_per_month
    FROM ranked
    WHERE rn = (n_pairs + 1) // 2
"""


# --- user-user collaborative filtering ----------------------------------------

UU_TOP_K = 5  # neighbors kept per user
# Popularity cap: items interacted-with by more than this many users are
# excluded from pair generation (and from the norms, so the cosine is
# self-consistent on the filtered matrix). Standard practice in
# neighborhood CF — ultra-popular items carry almost no similarity
# signal but generate O(popularity²) candidate pairs, which is exactly
# the Σ-bound pair-stream class the round-7 sf10 smoke proved fatal.
UU_ITEM_CAP = 64


def q_rec_user_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-5 most-similar users by implicit-feedback cosine
    over the item dimension — the user-neighborhood twin of
    rec_item_item_topk (operators/recommend.py), on the SAME
    volume-sized pair-exchange chassis (plans/pairsize.py) keyed by
    item instead of user. Returns
    (user_id, neighbor_id, dot, cos2_micro).

    Similarity matrix is computed on the popularity-filtered
    interaction matrix (items with ≤ UU_ITEM_CAP distinct users — see
    the cap rationale above); pairs below REC_MIN_SUPPORT never rank.
    Ranking is the certified integer cos²·10⁶ cross-multiplication in
    DECIMAL(38,0)/HUGEINT — zero floating arithmetic.

    Scale shape (100 TB): the pair stream is Σ item_audience² over
    CAPPED audiences — bounded per item by the cap, never
    corpus-quadratic — and its exchange is volume-sized
    (REPARTITION_BY_NUM replaces the groupBy exchange); norms and the
    final top-k window key on the high-cardinality user id.
    """
    inter = _interactions(spark, sf_dir)
    sizes = inter.groupBy("item_id").agg(F.count(F.lit(1)).alias("_sz"))
    kept = sizes.filter(F.col("_sz") <= UU_ITEM_CAP).select("item_id")
    inter2 = inter.join(kept, "item_id", "left_semi")
    norms = inter2.groupBy("user_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("n2")
    )
    pair_bound = sum_sq_group_bound(
        inter,
        ["item_id"],
        size_cap=UU_ITEM_CAP,
        cache_key=f"uu_inter:{sf_dir}",
    )
    a, b = inter2.alias("a"), inter2.alias("b")
    dots = (
        a.join(b, "item_id")
        .filter(F.col("a.user_id") != F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("b.user_id").alias("neighbor_id"),
            (F.col("a.c") * F.col("b.c")).alias("cc"),
        )
    )
    dots = (
        volume_repartition_pairs(dots, ["user_id", "neighbor_id"], pair_bound)
        .groupBy("user_id", "neighbor_id")
        .agg(F.sum("cc").alias("dot"))
        .filter(F.col("dot") >= REC_MIN_SUPPORT)
    )
    scored = (
        dots.join(norms, "user_id")
        .join(
            norms.select(
                F.col("user_id").alias("neighbor_id"),
                F.col("n2").alias("nb2"),
            ),
            "neighbor_id",
        )
        .withColumn(
            "cos2_micro",
            F.expr(
                "CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000)"
                " div (CAST(n2 AS DECIMAL(38,0)) * nb2) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("cos2_micro"), F.desc("dot"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= UU_TOP_K)
        .select("user_id", "neighbor_id", "dot", "cos2_micro")
    )


USER_USER_SQL = f"""
    WITH inter AS (
      SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
             COUNT(*) AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    kept AS (SELECT item_id FROM inter
             GROUP BY 1 HAVING COUNT(*) <= {UU_ITEM_CAP}),
    inter2 AS (SELECT i.* FROM inter i
               WHERE EXISTS (SELECT 1 FROM kept k
                             WHERE k.item_id = i.item_id)),
    norms AS (SELECT user_id, SUM(c * c) AS n2 FROM inter2 GROUP BY 1),
    dots AS (
      SELECT a.user_id AS user_id, b.user_id AS neighbor_id,
             SUM(a.c * b.c) AS dot
      FROM inter2 a JOIN inter2 b ON a.item_id = b.item_id
      WHERE a.user_id <> b.user_id
      GROUP BY 1, 2
      HAVING SUM(a.c * b.c) >= {REC_MIN_SUPPORT}),
    scored AS (
      SELECT d.user_id, d.neighbor_id, d.dot,
             CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000)
                  // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT)
               AS cos2_micro
      FROM dots d
      JOIN norms na ON d.user_id = na.user_id
      JOIN norms nb ON d.neighbor_id = nb.user_id)
    SELECT user_id, neighbor_id, CAST(dot AS BIGINT) AS dot, cos2_micro
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY cos2_micro DESC, dot DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {UU_TOP_K}
"""


# --- day-of-week variance share (eta-squared) ----------------------------------


def q_events_dow_eta2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal STRENGTH per event type: eta² — the share
    of event-value variance explained by the weekday factor,
    SSB/SST ∈ [0,1], in ppm. Complements events_dow_seasonality (which
    indexes volume per weekday but doesn't quantify how much of the
    value variation the weekday explains). Output:
    (event_type, n, eta2_ppm).

    Exactness: values at the established micro grain; the 16
    sufficient statistics (n, Σv, Σv², and per-weekday n_d, Σ_d v) are
    exact DECIMAL(38,0)/HUGEINT from ONE conditional-aggregation pass;
    the terminal eta² = (n·Σ_d S_d²/n_d − S²)/(n·ΣQ − S²) is evaluated
    as the IDENTICAL double expression on both engines with the
    weekday sum written as a FIXED left-to-right 7-term chain — both
    engines produce the bit-identical IEEE result, so the ppm snap
    cannot flip (the corr_pairs contract, extended to a fixed-order
    sum over the constant weekday domain).

    Scale shape: one map-side-combinable aggregate over the fact table
    into ≤ n_event_types rows; zero joins, zero windows.
    """
    e = load_table(spark, "events", sf_dir).select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        F.round(F.col("value") * 1e6).cast("long").alias("vm"),
    )
    vmd = F.col("vm").cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(vmd).alias("_s"),
        F.sum(vmd * vmd).alias("_q"),
    ]
    for d in range(7):
        aggs.append(
            F.sum(F.when(F.col("dow") == d, vmd).otherwise(F.lit(0))).alias(f"_s{d}")
        )
        aggs.append(
            F.sum(F.when(F.col("dow") == d, 1).otherwise(0)).alias(f"_n{d}")
        )
    agg = e.groupBy("event_type").agg(*aggs)
    nd = F.col("n").cast("double")
    sd = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    term = None
    for d in range(7):
        t = F.when(F.col(f"_n{d}") == 0, F.lit(0.0)).otherwise(
            F.col(f"_s{d}").cast("double")
            * F.col(f"_s{d}").cast("double")
            / F.col(f"_n{d}").cast("double")
        )
        term = t if term is None else term + t
    eta2 = F.try_divide(nd * term - sd * sd, nd * qd - sd * sd)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.coalesce(
            F.round(eta2 * 1e6).cast("long"), F.lit(-2_000_000)
        ).alias("eta2_ppm"),
    )


def _dow_eta2_sql() -> str:
    s_terms = ",\n             ".join(
        f"SUM(CASE WHEN dow = {d} THEN CAST(vm AS HUGEINT) ELSE 0 END) AS s{d},"
        f" SUM(CASE WHEN dow = {d} THEN 1 ELSE 0 END) AS n{d}"
        for d in range(7)
    )
    chain = " + ".join(
        f"(CASE WHEN n{d} = 0 THEN 0.0 ELSE"
        f" CAST(s{d} AS DOUBLE) * CAST(s{d} AS DOUBLE) / CAST(n{d} AS DOUBLE)"
        f" END)"
        for d in range(7)
    )
    return f"""
    WITH e AS (
      SELECT event_type, dayofweek(ts) AS dow,
             CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vm
      FROM events),
    agg AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(vm AS HUGEINT)) AS s,
             SUM(CAST(vm AS HUGEINT) * vm) AS q,
             {s_terms}
      FROM e GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           COALESCE(CAST(ROUND(
             (CAST(n AS DOUBLE) * ({chain})
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / NULLIF(CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0)
             * 1e6, 0) AS BIGINT), -2000000) AS eta2_ppm
    FROM agg
"""


# --- hapax-legomena rate per language ------------------------------------------


def q_text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena rate per language: the fraction of vocabulary
    types that occur exactly ONCE in the corpus slice — the classic
    vocabulary-freshness / OOV-pressure signal for tokenizer budgeting
    (a high hapax share means the long tail dominates; complements
    text_vocab_growth's Heaps exponent). Output:
    (lang, n_tokens, vocab_size, hapax_count, hapax_ppm).

    Exactness: pure integer counting; hapax_ppm = (10⁶·hapax) div
    vocab on BIGINT (both engines truncate toward zero).

    Scale shape: explode → (lang, word)-keyed count (map-side
    combinable, high-cardinality key) → bounded per-lang rollup; no
    windows, no joins.
    """
    d = load_table(spark, "documents", sf_dir)
    tf = (
        d.select("lang", F.explode(words(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        tf.groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias(
                "hapax_count"
            ),
        )
        .select(
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.col("hapax_count").cast("long").alias("hapax_count"),
            F.expr(
                "CAST(1000000 * hapax_count div vocab_size AS BIGINT)"
            ).alias("hapax_ppm"),
        )
    )


HAPAX_SQL = f"""
    WITH wx AS (SELECT lang, unnest({WORDS_SQL}) AS word FROM documents),
    tf AS (SELECT lang, word, COUNT(*) AS cnt FROM wx GROUP BY 1, 2),
    a AS (SELECT lang,
                 CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS vocab_size,
                 CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_count
          FROM tf GROUP BY 1)
    SELECT lang, n_tokens, vocab_size, hapax_count,
           CAST(1000000 * hapax_count // vocab_size AS BIGINT) AS hapax_ppm
    FROM a
"""


# --- Simpson lexical diversity per language -------------------------------------


def q_text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity (repeat-rate) per language: the probability
    that two tokens drawn WITHOUT replacement are the same type,
    D = Σ c(c−1) / (N(N−1)) — Simpson 1949 / Herdan's repeat rate, the
    scale-free companion to TTR (which degrades with corpus size) and
    the quadratic complement of the hapax tail. Output:
    (lang, n_tokens, vocab_size, simpson_ppm); lower = more diverse.

    Exactness: Σc(c−1) rides DECIMAL(38,0)/HUGEINT — with the 10⁶ ppm
    factor the worst case 10⁶·N² stays under 10³⁸ to N ≈ 3×10¹⁵
    tokens, past any 100 TB text corpus (and far past it in practice,
    since Σc² « N² unless one type dominates); the ppm is
    (10⁶·Σc(c−1)) div (N(N−1)) — integer division,
    truncation-parity on both engines; langs with N < 2 report −1.

    Scale shape: identical to the hapax query — explode, word-keyed
    count, bounded per-lang rollup; no windows, no joins.
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
        .agg(
            F.sum("cnt").alias("_n"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(cd * (cd - 1)).alias("_coll"),
        )
        .select(
            "lang",
            F.col("_n").cast("long").alias("n_tokens"),
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.when(F.col("_n") < 2, F.lit(-1))
            .otherwise(
                F.expr(
                    "CAST((1000000 * _coll)"
                    " div (CAST(_n AS DECIMAL(38,0)) * (_n - 1)) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("simpson_ppm"),
        )
    )


SIMPSON_SQL = f"""
    WITH wx AS (SELECT lang, unnest({WORDS_SQL}) AS word FROM documents),
    tf AS (SELECT lang, word, COUNT(*) AS cnt FROM wx GROUP BY 1, 2),
    a AS (SELECT lang,
                 SUM(CAST(cnt AS HUGEINT)) AS n,
                 CAST(COUNT(*) AS BIGINT) AS vocab_size,
                 SUM(CAST(cnt AS HUGEINT) * (cnt - 1)) AS coll
          FROM tf GROUP BY 1)
    SELECT lang, CAST(n AS BIGINT) AS n_tokens, vocab_size,
           CASE WHEN n < 2 THEN CAST(-1 AS BIGINT)
                ELSE CAST((1000000 * coll) // (n * (n - 1)) AS BIGINT)
           END AS simpson_ppm
    FROM a
"""


# --- deterministic systematic sampling ------------------------------------------

SYS_K = 97  # sampling interval (prime: never aligns with mod-100 cohorts)


def q_sample_systematic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (equal-interval) 1-in-97 sample of orders under the
    (o_orderdate, o_orderkey) total order — the textbook
    position-based sampling design (every k-th element from a fixed
    start), complementing the hash-mod (sample_mod_events), stratified,
    PPS and class-balanced designs already registered. Deterministic:
    no RNG, the sample is a pure function of the data's total order.
    Output: (rn, o_orderkey, order_cents).

    Scale shape: one range exchange (the certified two-pass
    global-ranking chassis) + a pushed filter; the sample is 1/97 of
    the corpus, never collected.
    """
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderdate").alias("od"),
        cents("o_totalprice").alias("order_cents"),
    )
    ranked = global_row_number(o, [F.asc("od"), F.asc("ok")], "rn")
    return (
        ranked.filter(F.col("rn") % SYS_K == 1)
        .select("rn", F.col("ok").alias("o_orderkey"), "order_cents")
    )


SYSTEMATIC_SQL = f"""
    WITH ranked AS (
      SELECT o_orderkey,
             {cents_sql("o_totalprice")} AS order_cents,
             row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT rn, o_orderkey, order_cents
    FROM ranked WHERE rn % {SYS_K} = 1
"""


QUERIES = {
    "lineitem_spearman": q_lineitem_spearman,
    "orders_theil_sen_monthly": q_orders_theil_sen_monthly,
    "rec_user_user_topk": q_rec_user_user_topk,
    "events_dow_eta2": q_events_dow_eta2,
    "text_hapax_rate": q_text_hapax_rate,
    "text_simpson_diversity": q_text_simpson_diversity,
    "sample_systematic_orders": q_sample_systematic_orders,
}

ORACLES = {
    "lineitem_spearman": SPEARMAN_SQL,
    "orders_theil_sen_monthly": THEIL_SEN_SQL,
    "rec_user_user_topk": USER_USER_SQL,
    "events_dow_eta2": _dow_eta2_sql(),
    "text_hapax_rate": HAPAX_SQL,
    "text_simpson_diversity": SIMPSON_SQL,
    "sample_systematic_orders": SYSTEMATIC_SQL,
}
