"""Relational/analytics surface, batch 21 (round 8 growth, third
wave): robust location (trimmed mean), Holt's linear-trend forecast in
exact dyadic arithmetic, RAKE keyword extraction, k-means centroid
drift, the apriori k=3 itemset pass, and PQ reconstruction distortion.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batch 20, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors, deferred to the round-9
driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness: money in cents; every ratio integer ppm/milli via `div`;
Holt's recursion unrolled to exact 2^-16-denominator impulse
coefficients (computed once with Fraction at import and inlined into
BOTH engines, so the forecast is pure int64 arithmetic); RAKE scores
integer micro; distortion/drift go through the sequential-fold squared
L2 and snap to micro per element before any sum."""

from __future__ import annotations

from fractions import Fraction
from math import lcm

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.textfn import STOPWORDS, words
from page_rank_mapreduce_java_spark.functions.text_queries2 import WORDS_SQL
from page_rank_mapreduce_java_spark.operators.ranking import global_row_number
from page_rank_mapreduce_java_spark.plans.pairsize import (
    volume_repartition_pairs,
)


# --- exact 10% two-sided trimmed mean ----------------------------------------

TRIM_DEN = 10  # drop floor(n/10) rows from each tail


def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sided 10% trimmed mean of order value — the robust
    location estimate that ignores both tails (winsorized_chars_by_lang
    clamps; trimming DROPS). Output, one row: (n_total, n_kept,
    mean_cents, trimmed_mean_cents).

    Exactness: the trim cut is positional on the two-pass global row
    number over the total order (cents, o_orderkey) — no percentile
    interpolation — and both means are integer divisions of exact cent
    sums.

    Scale shape: one range exchange (the certified global-ranking
    chassis) plus 1-row aggregates; no single-task window."""
    o = load_table(spark, "orders", sf_dir).select(
        cents("o_totalprice").alias("v"), "o_orderkey"
    )
    ranked = global_row_number(
        o, [F.asc("v"), F.asc("o_orderkey")], out_col="rn"
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    kept = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("rn") > F.expr(f"n div {TRIM_DEN}"))
            & (F.col("rn") <= F.col("n") - F.expr(f"n div {TRIM_DEN}"))
        )
        .agg(F.count(F.lit(1)).alias("nk"), F.sum("v").alias("sk"))
    )
    return kept.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_total"),
        F.col("nk").alias("n_kept"),
        F.expr("CAST(sv div n AS BIGINT)").alias("mean_cents"),
        F.expr("CAST(sk div nk AS BIGINT)").alias("trimmed_mean_cents"),
    )


TRIMMED_MEAN_SQL = f"""
    WITH o AS (
      SELECT {cents_sql('o_totalprice')} AS v, o_orderkey FROM orders
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v ASC, o_orderkey ASC) AS rn
      FROM o
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(v) AS sv FROM ranked),
    kept AS (
      SELECT COUNT(*) AS nk, SUM(v) AS sk
      FROM ranked CROSS JOIN tot
      WHERE rn > n // {TRIM_DEN} AND rn <= n - n // {TRIM_DEN}
    )
    SELECT CAST(n AS BIGINT) AS n_total, CAST(nk AS BIGINT) AS n_kept,
           CAST(sv // n AS BIGINT) AS mean_cents,
           CAST(sk // nk AS BIGINT) AS trimmed_mean_cents
    FROM kept CROSS JOIN tot
"""


# --- Holt linear-trend forecast in exact dyadic arithmetic -------------------

HOLT_LAGS = 8


def _holt_coeffs() -> tuple[int, list[int]]:
    """Impulse-response coefficients of the one-step-ahead Holt forecast
    f_t = l_t + b_t with α = β = 1/2, unrolled over the last HOLT_LAGS
    observations, as exact integers over a power-of-two denominator.
    Contributions older than the window decay as ~(1/2)^j and are
    truncated (the EWMA_LAGS convention); the kept coefficients sum to
    ~0.997, so the forecast is a ≤0.3%-biased-low convex-ish blend —
    acceptable for a trend diagnostic and EXACT cross-engine."""
    a = be = Fraction(1, 2)
    k = HOLT_LAGS
    lc = [Fraction(0)] * k
    bc = [Fraction(0)] * k
    for _ in range(k):
        lp = [Fraction(0)] + lc[:-1]
        bp = [Fraction(0)] + bc[:-1]
        lc = [
            (a if j == 0 else Fraction(0)) + (1 - a) * (lp[j] + bp[j])
            for j in range(k)
        ]
        bc = [be * (lc[j] - lp[j]) + (1 - be) * bp[j] for j in range(k)]
    fc = [lc[j] + bc[j] for j in range(k)]
    den = lcm(*[c.denominator for c in fc])
    return den, [int(c * den) for c in fc]


HOLT_DEN, HOLT_NUM = _holt_coeffs()


def q_orders_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential smoothing) one-step-ahead
    forecast of MONTHLY revenue, in exact integer arithmetic: the
    coupled level/trend recursion with α = β = 1/2 unrolls to fixed
    dyadic impulse coefficients over the last 8 months (computed
    exactly with Fraction at import, denominator 2^16, inlined into
    both engines), so forecast·2^16 = Σ coeff_j · revenue_{t-j} is pure
    int64 — no float recursion, no drift. Months with fewer than 8
    predecessors are skipped (the truncated window is only meaningful
    once full). Output: (month, revenue_cents, forecast_x65536,
    forecast_cents).

    Scale shape: one map-side-combinable aggregate lineitem→month; the
    lag window runs on the bounded month-grain relation (calendar
    bounded-domain convention)."""
    li = load_table(spark, "lineitem", sf_dir)
    monthly = li.groupBy(
        F.to_date(F.date_trunc("month", "l_shipdate")).alias("month")
    ).agg(F.sum(cents("l_extendedprice")).alias("rc"))
    w = Window.orderBy("month")  # bounded: month grain
    lagged = monthly.select(
        "month",
        F.col("rc").alias("revenue_cents"),
        *[
            F.lag("rc", j + 1).over(w).alias(f"y{j}")
            for j in range(HOLT_LAGS)
        ],
    ).filter(F.col(f"y{HOLT_LAGS - 1}").isNotNull())
    fx = " + ".join(
        f"({HOLT_NUM[j]} * y{j})" for j in range(HOLT_LAGS)
    )
    return lagged.select(
        "month",
        "revenue_cents",
        F.expr(f"CAST({fx} AS BIGINT)").alias("forecast_x65536"),
        F.expr(f"CAST(({fx}) div {HOLT_DEN} AS BIGINT)").alias(
            "forecast_cents"
        ),
    )


def _holt_sql() -> str:
    lags = ", ".join(
        f"lag(rc, {j + 1}) OVER (ORDER BY month) AS y{j}"
        for j in range(HOLT_LAGS)
    )
    fx = " + ".join(f"({HOLT_NUM[j]} * y{j})" for j in range(HOLT_LAGS))
    return f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             SUM({cents_sql('l_extendedprice')}) AS rc
      FROM lineitem GROUP BY 1
    ),
    lagged AS (
      SELECT month, rc AS revenue_cents, {lags} FROM monthly
    )
    SELECT month, CAST(revenue_cents AS BIGINT) AS revenue_cents,
           CAST({fx} AS BIGINT) AS forecast_x65536,
           CAST(({fx}) // {HOLT_DEN} AS BIGINT) AS forecast_cents
    FROM lagged WHERE y{HOLT_LAGS - 1} IS NOT NULL
"""


# --- RAKE keyword extraction -------------------------------------------------

RAKE_MAX_PHRASE = 4
RAKE_TOP_N = 25


def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction, Rose et al. 2010) over
    the corpus: candidate phrases are maximal stopword-free token runs
    (≤ RAKE_MAX_PHRASE words); each word scores degree/frequency where
    freq counts the word's phrase occurrences and degree sums the
    lengths of the phrases it appears in; a phrase scores the sum of
    its words' scores. Top RAKE_TOP_N distinct phrases by score.
    Output: (phrase, n_words, n_occurrences, score_micro).

    Exactness: degree and frequency are exact integers; each word's
    score snaps to integer micro (degree·1e6 div freq) BEFORE the
    per-phrase sum, so phrase scores are order-independent integer
    sums; the top-N order is total (score DESC, phrase ASC).

    Scale shape: the stopword-run segmentation is the islands pattern —
    a per-doc window (high-cardinality partition) over the token
    stream; word statistics reduce to vocab-sized relations joined back
    on the word key; identical phrases merge in one hash aggregate; the
    top-N is a sink-only orderBy.limit."""
    d = load_table(spark, "documents", sf_dir)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = d.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "w")
    ).withColumn("is_stop", F.array_contains(stop_arr, F.col("w")))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    ph = (
        toks.withColumn(
            "phrase_id",
            F.sum(F.col("is_stop").cast("long")).over(
                wd.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(~F.col("is_stop") & (F.col("w") != ""))
        .select("doc_id", "phrase_id", "pos", "w")
    )
    plen = ph.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("plen")
    ).filter(F.col("plen") <= RAKE_MAX_PHRASE)
    members = ph.join(plen, ["doc_id", "phrase_id"])
    wstat = members.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    )
    scored = members.join(wstat, "w").withColumn(
        "wscore", F.expr("CAST(degree * 1000000 div freq AS BIGINT)")
    )
    phrases = (
        scored.groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.max("plen").alias("n_words"),
            F.sum("wscore").alias("score_micro"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("score_micro").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("phrase"))
        .limit(RAKE_TOP_N)
    )


def _rake_sql() -> str:
    stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH toks AS (
      SELECT doc_id, pos, w, (w IN ({stoplist})) AS is_stop FROM (
        SELECT doc_id,
               generate_subscripts({WORDS_SQL}, 1) AS pos,
               unnest({WORDS_SQL}) AS w
        FROM documents)
    ),
    ph AS (
      SELECT doc_id, phrase_id, pos, w FROM (
        SELECT doc_id, pos, w, is_stop,
               SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS phrase_id
        FROM toks)
      WHERE NOT is_stop AND w <> ''
    ),
    plen AS (
      SELECT doc_id, phrase_id, COUNT(*) AS plen
      FROM ph GROUP BY 1, 2 HAVING COUNT(*) <= {RAKE_MAX_PHRASE}
    ),
    members AS (
      SELECT ph.*, plen.plen FROM ph JOIN plen USING (doc_id, phrase_id)
    ),
    wstat AS (
      SELECT w, COUNT(*) AS freq, SUM(plen) AS degree
      FROM members GROUP BY 1
    ),
    phrases AS (
      SELECT m.doc_id, m.phrase_id,
             string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
             MAX(m.plen) AS n_words,
             SUM(CAST(ws.degree * 1000000 // ws.freq AS BIGINT))
               AS score_micro
      FROM members m JOIN wstat ws ON m.w = ws.w
      GROUP BY 1, 2
    )
    SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MAX(score_micro) AS BIGINT) AS score_micro
    FROM phrases GROUP BY phrase
    ORDER BY score_micro DESC, phrase ASC
    LIMIT {RAKE_TOP_N}
"""


# --- k-means centroid drift --------------------------------------------------


def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-drift audit: train the deterministic k-means quantizer
    independently on the even-id and odd-id halves of the corpus and
    report, for every even-half centroid, the squared-L2 distance to
    its nearest odd-half centroid — large values flag unstable cells
    (the retrain-vs-serve drift check an embedding platform runs).
    Output: (centroid_id, nearest_other_id, drift_micro).

    Exactness: both trainings are the certified Lloyd chassis
    (micro-snapped means); the 16×16 distance matrix goes through the
    sequential-fold squared L2 and rounds to integer micro; the argmin
    tiebreaks on the other centroid's id.

    Scale shape: two corpus passes (one per half — each the certified
    kmeans shape) and a 16×16 broadcast cross of the centroid
    relations."""
    from page_rank_mapreduce_java_spark.functions.vectors import sq_l2
    from page_rank_mapreduce_java_spark.similarity.ann import kmeans_train
    from page_rank_mapreduce_java_spark.similarity.queries import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
    )

    e = load_table(spark, "embeddings", sf_dir)
    ca = kmeans_train(
        e.filter(F.col("vec_id") % 2 == 0), k=IVF_CENTROIDS, iters=KMEANS_ITERS
    )
    cb = kmeans_train(
        e.filter(F.col("vec_id") % 2 == 1), k=IVF_CENTROIDS, iters=KMEANS_ITERS
    ).select(
        F.col("centroid_id").alias("other_id"), F.col("cvec").alias("ovec")
    )
    pairs = ca.join(F.broadcast(cb), F.lit(True)).select(
        "centroid_id",
        "other_id",
        F.round(sq_l2(F.col("cvec"), F.col("ovec")) * 1e6)
        .cast("long")
        .alias("d_micro"),
    )
    wr = Window.partitionBy("centroid_id").orderBy(
        F.asc("d_micro"), F.asc("other_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "centroid_id",
            F.col("other_id").alias("nearest_other_id"),
            F.col("d_micro").alias("drift_micro"),
        )
    )


def _centroid_drift_sql() -> str:
    from page_rank_mapreduce_java_spark.functions.vectors import sq_l2_sql
    from page_rank_mapreduce_java_spark.similarity.ann import kmeans_sql
    from page_rank_mapreduce_java_spark.similarity.queries import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
    )

    ctes_a, fin_a = kmeans_sql(
        k=IVF_CENTROIDS, iters=KMEANS_ITERS,
        table="(SELECT * FROM embeddings WHERE vec_id % 2 = 0)",
        prefix="ev",
    )
    ctes_b, fin_b = kmeans_sql(
        k=IVF_CENTROIDS, iters=KMEANS_ITERS,
        table="(SELECT * FROM embeddings WHERE vec_id % 2 = 1)",
        prefix="od",
    )
    d = sq_l2_sql("a.cvec", "b.cvec")
    return f"""
    WITH {ctes_a},
    {ctes_b},
    pairs AS (
      SELECT a.centroid_id, b.centroid_id AS other_id,
             CAST(ROUND({d} * 1e6, 0) AS BIGINT) AS d_micro
      FROM {fin_a} a CROSS JOIN {fin_b} b
    )
    SELECT centroid_id, other_id AS nearest_other_id,
           d_micro AS drift_micro
    FROM (
      SELECT *, row_number() OVER (PARTITION BY centroid_id
                ORDER BY d_micro ASC, other_id ASC) AS rn
      FROM pairs)
    WHERE rn = 1
"""


# --- apriori k=3 itemset pass ------------------------------------------------

TRIPLE_MIN_SUPPORT = 2
TRIPLE_CAP = 12  # tighter than BASKET_CAP: triple volume is Σ sz³/6


def q_basket_itemset3_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part TRIPLES co-ordered in the same order (support ≥ 2)
    — the k=3 apriori pass above basket_pair_counts. Baskets cap at
    TRIPLE_CAP items (tighter than the pair cap: candidate volume is
    Σ basket³/6). Output: (p1, p2, p3, support) with p1 < p2 < p3.

    Scale shape: the triple generator is a two-step same-key self-join;
    its exchange is VOLUME-SIZED on the cube bound Σ min(sz, cap)³ (the
    pairsize chassis generalized — one cheap aggregate sizes the
    explicit repartition on the triple key, and Catalyst elides the
    groupBy's own shuffle). At 100 TB the cap is what keeps one
    pathological crawler basket from emitting cap³ rows."""
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
    sizes = items.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("sz"))
    keep = sizes.filter(F.col("sz") <= TRIPLE_CAP).select("l_orderkey")
    bound_row = (
        sizes.select(
            F.sum(
                F.pow(F.least(F.col("sz"), F.lit(TRIPLE_CAP)), 3)
            ).alias("b")
        ).head()
    )
    cube_bound = int(bound_row[0] or 0) // 6 + 1
    i = items.join(keep, "l_orderkey")
    a, b, c = i.alias("a"), i.alias("b"), i.alias("c")
    triples = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("b.l_partkey") < F.col("c.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
            F.col("c.l_partkey").alias("p3"),
        )
    )
    return (
        volume_repartition_pairs(triples, ["p1", "p2", "p3"], cube_bound)
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIPLE_MIN_SUPPORT)
    )


# The pairs CTE is MATERIALIZED and the triple closes with ONE
# equi-join on l_orderkey: written as a flat 3-way join, DuckDB's
# optimizer paired b with c on the partkey INEQUALITY alone (a
# PIECEWISE_MERGE_JOIN over the full items×items range space —
# >300 s at sf0.01 where this form runs 0.2 s). Spark never had the
# hazard: its join conditions pin each step to the orderkey equi-key.
ITEMSET3_SQL = f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    keep AS (SELECT l_orderkey FROM items GROUP BY 1
             HAVING COUNT(*) <= {TRIPLE_CAP}),
    i AS MATERIALIZED (SELECT items.* FROM items JOIN keep USING (l_orderkey)),
    pairs AS MATERIALIZED (
      SELECT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
      FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
    )
    SELECT p.p1 AS p1, p.p2 AS p2, c.l_partkey AS p3,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM pairs p JOIN i c ON p.l_orderkey = c.l_orderkey
                         AND p.p2 < c.l_partkey
    GROUP BY 1, 2, 3 HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT}
"""


# --- PQ reconstruction distortion --------------------------------------------


def q_ann_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization reconstruction distortion per subspace: the
    mean squared L2 between each vector's slice and its assigned
    codeword — the codebook-quality metric that decides whether a PQ
    index needs more centroids or finer subspaces (recall falls as
    distortion rises). Output per subspace: (m, n_vectors,
    mean_distortion_micro).

    Exactness: the codebook and code assignment are the certified
    deterministic PQ chassis; each vector's squared distance goes
    through the sequential-fold sq_l2 and snaps to integer micro BEFORE
    the per-subspace mean (one correctly-rounded terminal division).

    Scale shape: encode is one narrow corpus pass against the broadcast
    codebook (certified shape); the distortion join re-reads codewords
    from the same broadcast relation and reduces map-side into M
    rows."""
    from page_rank_mapreduce_java_spark.functions.vectors import sq_l2
    from page_rank_mapreduce_java_spark.similarity.pq import (
        pq_encode,
        pq_train,
        subvector,
        PQ_M,
    )
    from page_rank_mapreduce_java_spark.similarity.queries import PQ_DIM

    e = load_table(spark, "embeddings", sf_dir)
    cb = pq_train(e, dim=PQ_DIM)
    codes = pq_encode(e, cb, dim=PQ_DIM)
    slices = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        subvector("embedding", m, PQ_M, PQ_DIM).alias("sv"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    joined = (
        slices.join(codes, ["vec_id", "m"])
        .join(
            F.broadcast(
                cb.select(
                    "m", F.col("centroid_id").alias("code"), "cvec"
                )
            ),
            ["m", "code"],
        )
        .select(
            "m",
            F.round(sq_l2(F.col("sv"), F.col("cvec")) * 1e6)
            .cast("long")
            .alias("d_micro"),
        )
    )
    return joined.groupBy(F.col("m").cast("long").alias("m")).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.expr("CAST(SUM(d_micro) div COUNT(*) AS BIGINT)").alias(
            "mean_distortion_micro"
        ),
    )


def _pq_distortion_sql() -> str:
    # Reuses the certified PQ oracle chassis (namespaced kmeans chains,
    # union codebook `cb`, per-vector slice relation `slices`) from the
    # ann_pq_codebook / ann_pq_topk oracles.
    from page_rank_mapreduce_java_spark.functions.vectors import sq_l2_sql
    from page_rank_mapreduce_java_spark.similarity.queries import (
        _pq_oracle_parts,
    )

    body, cb = _pq_oracle_parts()
    d_assign = sq_l2_sql("s.sv", "c.cvec")
    return f"""
    WITH {body},
    assigned AS (
      SELECT vec_id, m, d_micro FROM (
        SELECT s.vec_id, s.m,
               CAST(ROUND({d_assign} * 1e6, 0) AS BIGINT) AS d_micro,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY {d_assign} ASC, c.centroid_id ASC) AS rn
        FROM slices s JOIN {cb} c ON s.m = c.m)
      WHERE rn = 1
    )
    SELECT CAST(m AS BIGINT) AS m, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(d_micro) // COUNT(*) AS BIGINT)
             AS mean_distortion_micro
    FROM assigned GROUP BY 1
"""


QUERIES = {
    "agg_trimmed_mean": q_agg_trimmed_mean,
    "orders_holt_linear": q_orders_holt_linear,
    "text_rake_keywords": q_text_rake_keywords,
    "embedding_centroid_drift": q_embedding_centroid_drift,
    "basket_itemset3_support": q_basket_itemset3_support,
    "ann_pq_distortion": q_ann_pq_distortion,
}

ORACLES = {
    "agg_trimmed_mean": TRIMMED_MEAN_SQL,
    "orders_holt_linear": _holt_sql(),
    "text_rake_keywords": _rake_sql(),
    "embedding_centroid_drift": _centroid_drift_sql(),
    "basket_itemset3_support": ITEMSET3_SQL,
    "ann_pq_distortion": _pq_distortion_sql(),
}
