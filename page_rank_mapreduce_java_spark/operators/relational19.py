"""Relational/analytics surface, batch 19 (round 8 growth): survival
analysis, model-evaluation tables, rolling correlation, cluster-quality
scoring, tokenizer economics, class-balanced sampling, association-rule
confidence, cross-field DQ, a deterministic bootstrap CI, and the LSH
recall measurement.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Every query follows the repo's exactness conventions: money through
integer cents (functions/money.py), logs through the deterministic
ln-over-integers contract (functions/text_queries2.ln_int_sql), hashes
through the portable md5-60bit base (functions/hashes.py), vector math
through the sequential-fold cosine (functions/vectors.py), and every
ratio snapped to integer ppm/milli with `div` so Spark and DuckDB can
never drift.

Scale shapes are per-query (docstrings); none introduces a new shuffle
class — the heavy relations ride existing chassis (two-pass global
ranking, volume-sized pair exchange, broadcast centroids) and every
window either partitions on a high-cardinality key or runs on a
bounded-domain relation (day/week/decile/resample grids), per the
documented convention.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.hashes import md5_long, md5_long_sql
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql
from page_rank_mapreduce_java_spark.functions.textfn import words
from page_rank_mapreduce_java_spark.operators.ranking import (
    global_ntile,
    grouped_topk_low_cardinality,
)
from page_rank_mapreduce_java_spark.plans.pairsize import (
    sum_sq_group_bound,
    volume_repartition_pairs,
)


def _ln(expr: str, engine: str) -> str:
    return ln_int_sql(expr, engine)


# --- Kaplan-Meier repurchase survival ----------------------------------------

KM_BUCKET_DAYS = 7


def q_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of customer repurchase: for every pair of
    consecutive orders of a customer the gap in days is an OBSERVED
    duration (the customer "came back"); the span from each customer's
    last order to the corpus max order date is a CENSORED duration (no
    repurchase seen yet). Durations bucket into KM_BUCKET_DAYS-day weeks;
    exits are counted at the END of their bucket (the discrete-KM
    convention used here: a subject at risk in week b is one whose
    duration bucket is ≥ b). Output, one row per week with ≥1 event:
    (week, n_risk, n_events, n_censored, cum_log_surv_micro) where
    cum_log_surv_micro = Σ_{b' ≤ b} round(1e6·ln((n_risk−d)/n_risk)) —
    the log survival curve in integer micro-nats (S(b) = exp(cum/1e6)).

    Exactness: day gaps are exact integers (datediff of dates); both ln
    arguments are integers, so each per-week term goes through the
    shared deterministic ln (ln_int_sql — bit-identical doubles both
    engines) and is snapped to integer micro-nats BEFORE the cumulative
    sum, which is then order-independent integer addition. The curve is
    reported up to the last week with positive survivors: a
    risk-exhausted week (n_risk = d, survival 0) has no finite
    log-survival, no later event week can exist, and dropping it keeps
    the output NULL-free (canon-audit house rule).

    Scale shape: ONE fact shuffle — the per-customer window (LEAD over
    (o_orderdate, o_orderkey)) partitions on o_custkey, a
    high-cardinality key; the corpus max date is a 1-row broadcast. The
    duration relation reduces to a week-bucket aggregate bounded by
    date-span/7, and every subsequent window runs on that bounded
    relation (documented bounded-domain convention)."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.to_date("o_orderdate").alias("d"), "o_orderkey"
    )
    maxd = o.agg(F.max("d").alias("maxd"))
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    durs = (
        o.withColumn("nxt", F.lead("d").over(w))
        .crossJoin(F.broadcast(maxd))
        .select(
            F.when(
                F.col("nxt").isNotNull(), F.datediff("nxt", F.col("d"))
            )
            .otherwise(F.datediff("maxd", F.col("d")))
            .alias("dur"),
            F.col("nxt").isNotNull().cast("long").alias("is_event"),
        )
    )
    per_week = durs.groupBy(
        (F.col("dur") - F.col("dur") % KM_BUCKET_DAYS).alias("_wd")
    ).agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    ).select(
        (F.col("_wd") / KM_BUCKET_DAYS).cast("long").alias("week"), "d", "c"
    )
    wk = Window.orderBy("week")  # bounded: date-span/7 rows
    ln_nr = _ln("n_risk", "spark")
    ln_surv = _ln("(n_risk - d)", "spark")
    term = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
        F.expr(f"CAST(ROUND(({ln_surv} - {ln_nr}) * 1e6, 0) AS BIGINT)"),
    )
    total = per_week.agg(F.sum(F.col("d") + F.col("c")).alias("n"))
    return (
        per_week.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(
                    wk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("_term", term)
        .withColumn(
            "cum_log_surv_micro",
            F.sum("_term").over(
                wk.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        # the curve ends at the last week with positive survivors: a
        # risk-exhausted week (n_risk = d, survival 0) has no finite
        # log-survival, and no event week can follow it — dropping it
        # keeps the output NULL-free (canon-audit house rule)
        .filter((F.col("d") > 0) & (F.col("n_risk") > F.col("d")))
        .select(
            "week",
            "n_risk",
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            "cum_log_surv_micro",
        )
    )


def _km_sql() -> str:
    ln_nr = _ln("n_risk", "duckdb")
    ln_surv = _ln("(n_risk - d)", "duckdb")
    return f"""
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
      FROM orders
    ),
    maxd AS (SELECT MAX(d) AS maxd FROM o),
    durs AS (
      SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', d, nxt)
                  ELSE date_diff('day', d, (SELECT maxd FROM maxd)) END AS dur,
             CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS is_event
      FROM (SELECT d, LEAD(d) OVER (PARTITION BY o_custkey
                                    ORDER BY d, o_orderkey) AS nxt
            FROM o)
    ),
    per_week AS (
      SELECT CAST((dur - dur % {KM_BUCKET_DAYS}) / {KM_BUCKET_DAYS} AS BIGINT)
               AS week,
             SUM(is_event) AS d, SUM(1 - is_event) AS c
      FROM durs GROUP BY 1
    ),
    risk AS (
      SELECT week, d, c,
             (SELECT SUM(d + c) FROM per_week)
               - COALESCE(SUM(d + c) OVER (ORDER BY week
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_week
    ),
    terms AS (
      SELECT week, n_risk, d, c,
             CASE WHEN d > 0 AND n_risk > d THEN
               CAST(ROUND(({ln_surv} - {ln_nr}) * 1e6, 0) AS BIGINT)
             END AS term
      FROM risk
    )
    SELECT week, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
           CAST(SUM(term) OVER (ORDER BY week
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_log_surv_micro
    FROM terms
    QUALIFY d > 0 AND n_risk > d
"""


# --- model-evaluation lift & gains table -------------------------------------

LIFT_DECILES = 10


def q_orders_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift & gains table — the model-evaluation artifact a
    scoring pipeline produces: rank orders by a score (o_totalprice,
    standing in for a model score), cut into NTILE(10) deciles, and per
    decile report the response rate of the outcome (order contains a
    returned lineitem), lift vs the base rate, and cumulative gain.
    Output: (decile, n, responders, response_ppm, lift_ppm,
    cum_gain_ppm); all ratios integer ppm via `div`.

    Exactness: the score order is total (cents(o_totalprice) DESC,
    o_orderkey ASC), so NTILE is deterministic; the Spark side cuts
    deciles with the two-pass global_ntile chassis whose bucket
    arithmetic reproduces SQL-standard NTILE exactly (larger buckets
    first — certified in window_ntile r1).

    Scale shape: the outcome flag is one semi-join-shaped aggregate on
    l_orderkey; the decile cut is the two-pass global ranking chassis
    (range exchange + per-partition offsets — no single-task window);
    the lift table itself is a 10-row relation and its cumulative
    window is bounded-domain."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
    )
    scored = (
        o.select("o_orderkey", cents("o_totalprice").alias("score"))
        .join(
            returned.withColumn("resp", F.lit(1)), "o_orderkey", "left"
        )
        .select(
            "o_orderkey", "score", F.coalesce("resp", F.lit(0)).alias("resp")
        )
    )
    deciles = global_ntile(
        scored,
        LIFT_DECILES,
        [F.desc("score"), F.asc("o_orderkey")],
        out_col="decile",
    )
    per = deciles.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("resp").alias("responders")
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("responders").alias("tr")
    )
    wd = Window.orderBy("decile")  # bounded: 10 rows
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum_resp",
            F.sum("responders").over(
                wd.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select(
            "decile",
            "n",
            "responders",
            F.expr("CAST(responders * 1000000 div n AS BIGINT)").alias(
                "response_ppm"
            ),
            # responders·tn·1e6 — and at orders >~1e10 the denominator
            # n·tr too — can pass int64 at extreme SF: run BOTH sides of
            # the division in DECIMAL(38,0) (DuckDB promotes to HUGEINT;
            # ADVICE r8 — the one-sided hardening was asymmetric).
            F.expr(
                "CAST(CAST(responders AS DECIMAL(38,0)) * tn * 1000000"
                " div (CAST(n AS DECIMAL(38,0)) * tr) AS BIGINT)"
            ).alias("lift_ppm"),
            F.expr("CAST(cum_resp * 1000000 div tr AS BIGINT)").alias(
                "cum_gain_ppm"
            ),
        )
    )


LIFT_GAINS_SQL = f"""
    WITH returned AS (
      SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem
      WHERE l_returnflag = 'R'
    ),
    scored AS (
      SELECT o.o_orderkey, {cents_sql('o_totalprice')} AS score,
             CASE WHEN r.o_orderkey IS NULL THEN 0 ELSE 1 END AS resp
      FROM orders o LEFT JOIN returned r USING (o_orderkey)
    ),
    cut AS (
      SELECT resp, NTILE({LIFT_DECILES})
               OVER (ORDER BY score DESC, o_orderkey ASC) AS decile
      FROM scored
    ),
    per AS (
      SELECT decile, COUNT(*) AS n, SUM(resp) AS responders
      FROM cut GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(responders) AS tr FROM per)
    SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
           CAST(responders AS BIGINT) AS responders,
           CAST(responders * 1000000 // n AS BIGINT) AS response_ppm,
           CAST(CAST(responders AS HUGEINT) * tn * 1000000
                // (CAST(n AS HUGEINT) * tr) AS BIGINT) AS lift_ppm,
           CAST(SUM(responders) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 // tr AS BIGINT) AS cum_gain_ppm
    FROM per CROSS JOIN tot
"""


# --- rolling correlation -----------------------------------------------------

CORR_WINDOW_DAYS = 7
# Revenue unit for the variance sums: $1000 blocks (cents div 100_000).
# Keeps n·Σy² inside int64 up to ~3e8 y-units/day ≈ TPC-H sf ~100,000 —
# far past any single-table scale this engine will see; quantities stay
# in natural units (daily Σqty² is tiny by comparison).
CORR_Y_DIV = 100_000


def q_lineitem_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-active-day Pearson correlation between daily shipped
    quantity and daily revenue — the co-movement diagnostic of a demand
    dashboard. For each ship day with ≥6 preceding active days, r over
    the last 7 active days (rows frame, not calendar: days with no
    shipments are absent), in integer milli. Output: (day, x_qty,
    y_krev, r_milli).

    Exactness: daily x = Σ round(l_quantity) (quantities are integral),
    daily y = (Σ cents) div CORR_Y_DIV — all window sums are exact
    int64; the Pearson formula then runs in DOUBLE on those exact
    integers using only correctly-rounded IEEE ops (±, ×, ÷, sqrt), so
    r_milli = round(1000·(nΣxy−ΣxΣy)/√((nΣx²−Σx²)(nΣy²−Σy²))) is
    bit-identical cross-engine. Zero-variance frames emit NULL (no
    0-division; Spark double/0 is NaN-ish, DuckDB errors — both sides
    guard with CASE).

    Scale shape: one map-side-combinable aggregate lineitem→day; every
    window runs on the bounded day-grain relation (date-span rows —
    the documented bounded-domain convention)."""
    li = load_table(spark, "lineitem", sf_dir)
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("x"),
            F.sum(cents("l_extendedprice")).alias("yc"),
        )
        .select(
            "day", "x", F.expr(f"yc div {CORR_Y_DIV}").alias("y")
        )
    )
    wd = Window.orderBy("day").rowsBetween(-(CORR_WINDOW_DAYS - 1), 0)
    framed = daily.select(
        "day",
        F.col("x").alias("x_qty"),
        F.col("y").alias("y_krev"),
        F.count(F.lit(1)).over(wd).alias("nw"),
        F.sum("x").over(wd).alias("sx"),
        F.sum("y").over(wd).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(wd).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(wd).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(wd).alias("sxy"),
    ).filter(F.col("nw") == CORR_WINDOW_DAYS)
    return framed.select(
        "day",
        "x_qty",
        "y_krev",
        F.expr(
            "CASE WHEN (CAST(nw AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0"
            " AND (CAST(nw AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0 THEN"
            " CAST(ROUND(1000.0 * (CAST(nw AS DOUBLE) * sxy"
            "   - CAST(sx AS DOUBLE) * sy)"
            " / sqrt((CAST(nw AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            "      * (CAST(nw AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0)"
            " AS BIGINT) END"
        ).alias("r_milli"),
    )


ROLLING_CORR_SQL = f"""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS x,
             SUM({cents_sql('l_extendedprice')}) // {CORR_Y_DIV} AS y
      FROM lineitem GROUP BY 1
    ),
    framed AS (
      SELECT day, x AS x_qty, y AS y_krev,
             COUNT(*) OVER w AS nw,
             SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
             SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
             SUM(x * y) OVER w AS sxy
      FROM daily
      WINDOW w AS (ORDER BY day
        ROWS BETWEEN {CORR_WINDOW_DAYS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day, CAST(x_qty AS BIGINT) AS x_qty,
           CAST(y_krev AS BIGINT) AS y_krev,
           CASE WHEN (CAST(nw AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
                 AND (CAST(nw AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
           THEN CAST(ROUND(1000.0 * (CAST(nw AS DOUBLE) * sxy
                  - CAST(sx AS DOUBLE) * sy)
                / sqrt((CAST(nw AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * (CAST(nw AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                0) AS BIGINT) END AS r_milli
    FROM framed WHERE nw = {CORR_WINDOW_DAYS}
"""


# --- simplified silhouette of the k-means clustering -------------------------


def q_embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette of the certified k-means
    clustering (the clustering-quality score an embedding pipeline
    tracks): for each vector, a = cosine distance (1 − cos) to its OWN
    centroid, b = min distance to any OTHER centroid, s = (b − a) /
    max(a, b) ∈ [−1, 1]. Output per cluster: (centroid_id, n_members,
    mean_silhouette_ppm). Uses centroid distances only (the "simplified"
    variant) — the full silhouette's all-pairs a/b is O(n²) and exactly
    the shape this engine refuses at scale.

    Exactness: centroids come from the deterministic kmeans_train chassis
    (micro-snapped means, certified r2); distances go through the
    sequential-fold cosine so every double is bit-identical; each s is
    snapped to integer micro BEFORE the per-cluster sum (the money
    convention), and the mean is one correctly-rounded double division.
    A vector equidistant-at-zero (max(a,b)=0) scores 0 by convention.

    Scale shape: k centroids broadcast; per-vector scoring is one narrow
    pass emitting k distances folded map-side to (a, b) via the same
    broadcast-join + per-vector min/max aggregate the IVF assign uses;
    the output is a k-row aggregate."""
    from page_rank_mapreduce_java_spark.similarity.ann import kmeans_train
    from page_rank_mapreduce_java_spark.functions.vectors import cosine
    from page_rank_mapreduce_java_spark.similarity.queries import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
    )

    e = load_table(spark, "embeddings", sf_dir)
    cent = kmeans_train(e, k=IVF_CENTROIDS, iters=KMEANS_ITERS)
    # r12 optimization (guide §2.4): the former shape exploded the corpus
    # to |corpus|×k rows through a broadcast join and re-grouped them by
    # vec_id (min-struct + collect_list) — one full exchange of the
    # exploded distance relation. With the centroids broadcast as ONE
    # id-sorted array row, each vector computes its k distances, own
    # cluster, and b in place: the scoring pass is fully narrow and the
    # only exchange left is the final k-row aggregate. own/b selection
    # expressions are unchanged (min struct(dist, centroid_id); min dist
    # over centroid_id ≠ own).
    from page_rank_mapreduce_java_spark.similarity.ann import (
        _centroids_as_row,
        _parallel_corpus,
    )

    # r13: the in-place scoring pass runs BELOW the first exchange, so
    # its parallelism is the parquet split count — 1-2 tasks at bench
    # SFs (guide §2.5; see ann._parallel_corpus for the measurement).
    per_vec = (
        _parallel_corpus(e.select("embedding"))
        .join(F.broadcast(_centroids_as_row(cent)), F.lit(True))
        .select(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    c["centroid_id"].alias("centroid_id"),
                    (
                        F.lit(1.0) - cosine(F.col("embedding"), c["cvec"])
                    ).alias("dist"),
                ),
            ).alias("all_d")
        )
        .select(
            F.array_min(
                F.transform(
                    F.col("all_d"),
                    lambda x: F.struct(
                        x["dist"].alias("dist"),
                        x["centroid_id"].alias("centroid_id"),
                    ),
                )
            ).alias("own"),
            F.col("all_d"),
        )
    )
    s = per_vec.select(
        F.col("own.centroid_id").alias("centroid_id"),
        F.col("own.dist").alias("a"),
        F.array_min(
            F.transform(
                F.filter(
                    F.col("all_d"),
                    lambda x: x["centroid_id"] != F.col("own.centroid_id"),
                ),
                lambda x: x["dist"],
            )
        ).alias("b"),
    ).select(
        "centroid_id",
        F.when(
            F.greatest("a", "b") > 0,
            F.round(
                (F.col("b") - F.col("a")) / F.greatest("a", "b") * 1e6
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("s_micro"),
    )
    return s.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            F.sum("s_micro").cast("double") / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mean_silhouette_ppm"),
    )


def _silhouette_sql() -> str:
    from page_rank_mapreduce_java_spark.similarity.ann import kmeans_sql
    from page_rank_mapreduce_java_spark.functions.vectors import cosine_sql
    from page_rank_mapreduce_java_spark.similarity.queries import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
    )

    ctes, final = kmeans_sql(k=IVF_CENTROIDS, iters=KMEANS_ITERS)
    d = f"(1.0 - {cosine_sql('e.embedding', 'c.cvec')})"
    return f"""
    WITH {ctes},
    dists AS (
      SELECT e.vec_id, c.centroid_id, {d} AS dist
      FROM embeddings e CROSS JOIN {final} c
    ),
    own AS (
      SELECT vec_id, centroid_id, dist AS a FROM (
        SELECT vec_id, centroid_id, dist,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY dist ASC, centroid_id ASC) AS rn
        FROM dists) WHERE rn = 1
    ),
    sil AS (
      SELECT o.centroid_id,
             CASE WHEN GREATEST(o.a, m.b) > 0 THEN
               CAST(ROUND((m.b - o.a) / GREATEST(o.a, m.b) * 1e6, 0)
                    AS BIGINT)
             ELSE 0 END AS s_micro
      FROM own o JOIN (
        SELECT d.vec_id, MIN(d.dist) AS b
        FROM dists d JOIN own o2 ON d.vec_id = o2.vec_id
                                AND d.centroid_id <> o2.centroid_id
        GROUP BY 1) m ON o.vec_id = m.vec_id
    )
    SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(ROUND(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
             AS mean_silhouette_ppm
    FROM sil GROUP BY 1
"""


# --- tokenizer economics -----------------------------------------------------


def q_text_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-economics table per language: token, character, and
    byte volumes plus the two ratios an LLM data pipeline budgets with —
    fertility (tokens per character, ppm) and bytes per token (milli).
    Output: (lang, n_docs, n_tokens, n_chars, n_bytes, fertility_ppm,
    bytes_per_token_milli); ratios integer via `div`.

    Exactness: token counts use the shared `words` splitter (the
    certified text-pipeline tokenizer), chars the corpus's own n_chars
    column, bytes octet_length(text) — all integers, both ratios
    integer division.

    Scale shape: one map-side-combinable aggregate documents→lang; the
    token explode never materializes (size(words) is computed per row
    JVM-side)."""
    d = load_table(spark, "documents", sf_dir)
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words(F.col("text")))).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
    )
    return per.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_bytes",
        F.expr("CAST(n_tokens * 1000000 div n_chars AS BIGINT)").alias(
            "fertility_ppm"
        ),
        F.expr("CAST(n_bytes * 1000 div n_tokens AS BIGINT)").alias(
            "bytes_per_token_milli"
        ),
    )


def _fertility_sql() -> str:
    from page_rank_mapreduce_java_spark.functions.text_queries2 import (
        WORDS_SQL,
    )

    n_tok = f"len({WORDS_SQL})"  # WORDS_SQL tokenizes the `text` column
    return f"""
    WITH per AS (
      SELECT lang, COUNT(*) AS n_docs,
             SUM({n_tok}) AS n_tokens,
             SUM(n_chars) AS n_chars,
             SUM(strlen(text)) AS n_bytes
      FROM documents GROUP BY 1
    )
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(n_tokens * 1000000 // n_chars AS BIGINT) AS fertility_ppm,
           CAST(n_bytes * 1000 // n_tokens AS BIGINT)
             AS bytes_per_token_milli
    FROM per
"""


# --- class-balanced downsampling --------------------------------------------


def q_sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsample of the events stream — the
    majority-class undersampling step of a training-set builder: every
    event_type keeps exactly min-class-size rows, selected by the
    portable md5 hash order (md5_long(event_id), event_id) so the
    sample is deterministic, uniform-ish, and reproducible on any
    engine. Output is the per-class proof of the exact selected set:
    (event_type, n_kept, sum_event_ids) — equal classes, and the id-sum
    pins WHICH rows were kept.

    Scale shape: the min-class cap is a broadcast 1-row aggregate; the
    per-class selection runs on the two-level grouped_topk chassis
    (local top-cap per input partition, then the exact window over the
    bounded survivors — never a full-fact single-task window on the
    low-cardinality class key). The hash order is JVM expression-only.

    Note the cap is data-dependent (min class size), so the topk's k is
    resolved by a driver-side 1-row aggregate at plan-build time — same
    contract as the volume-sized pair bound."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type", "event_id", md5_long(F.col("event_id").cast("string")).alias("h")
    )
    cap = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("cap"))
        .head()[0]
    )
    kept = grouped_topk_low_cardinality(
        e, ["event_type"], [F.asc("h"), F.asc("event_id")], int(cap)
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("event_id").alias("sum_event_ids"),
    )


def _class_balanced_sql() -> str:
    h = md5_long_sql("CAST(event_id AS VARCHAR)")
    return f"""
    WITH e AS (
      SELECT event_type, event_id, {h} AS h FROM events
    ),
    cap AS (
      SELECT MIN(n) AS cap FROM (
        SELECT COUNT(*) AS n FROM e GROUP BY event_type)
    ),
    ranked AS (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
               ORDER BY h ASC, event_id ASC) AS rn
      FROM e
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
    FROM ranked WHERE rn <= (SELECT cap FROM cap)
    GROUP BY 1
"""


# --- association-rule confidence --------------------------------------------

RULE_TOP_N = 25
RULE_MIN_SUPPORT = 2


def q_basket_rule_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the basket pair stream with directional
    confidence — the rule-mining step past support counting: for each
    co-ordered part pair (support ≥ RULE_MIN_SUPPORT) emit BOTH
    directions a→b with confidence_ppm = support(a,b)·1e6 div
    baskets(a), keep the global top RULE_TOP_N by (confidence DESC,
    support DESC, antecedent, consequent). Output: (antecedent,
    consequent, support, n_antecedent, confidence_ppm).

    Scale shape: the pair generator is the certified capped-basket
    self-join with the VOLUME-SIZED pair exchange (plans/pairsize.py —
    the r7 OOM chassis); per-item basket counts are one
    map-side-combinable aggregate broadcast-joined onto the pair
    relation (item counts are dim-sized); the top-N is a sink-only
    orderBy.limit."""
    from page_rank_mapreduce_java_spark.operators.relational8 import (
        BASKET_CAP,
    )

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
        .filter(F.col("_sz") <= BASKET_CAP)
        .select("l_orderkey")
    )
    pair_bound = sum_sq_group_bound(
        items,
        ["l_orderkey"],
        size_cap=BASKET_CAP,
        cache_key=f"basket_pairs:{sf_dir}",
    )
    i = items.join(keep, "l_orderkey")
    a, b = i.alias("a"), i.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
    )
    support = (
        volume_repartition_pairs(pairs, ["p1", "p2"], pair_bound)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= RULE_MIN_SUPPORT)
    )
    item_n = i.groupBy(F.col("l_partkey").alias("antecedent")).agg(
        F.count(F.lit(1)).alias("n_antecedent")
    )
    rules = support.select(
        F.col("p1").alias("antecedent"),
        F.col("p2").alias("consequent"),
        "support",
    ).unionByName(
        support.select(
            F.col("p2").alias("antecedent"),
            F.col("p1").alias("consequent"),
            "support",
        )
    )
    return (
        rules.join(item_n, "antecedent")
        .withColumn(
            "confidence_ppm",
            F.expr("CAST(support * 1000000 div n_antecedent AS BIGINT)"),
        )
        .orderBy(
            F.desc("confidence_ppm"),
            F.desc("support"),
            F.asc("antecedent"),
            F.asc("consequent"),
        )
        .limit(RULE_TOP_N)
    )


def _rule_confidence_sql() -> str:
    from page_rank_mapreduce_java_spark.operators.relational8 import (
        BASKET_CAP,
    )

    return f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    keep AS (SELECT l_orderkey FROM items GROUP BY 1
             HAVING COUNT(*) <= {BASKET_CAP}),
    i AS (SELECT items.* FROM items JOIN keep USING (l_orderkey)),
    support AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS support
      FROM i a JOIN i b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {RULE_MIN_SUPPORT}
    ),
    item_n AS (
      SELECT l_partkey AS antecedent, COUNT(*) AS n_antecedent
      FROM i GROUP BY 1
    ),
    rules AS (
      SELECT p1 AS antecedent, p2 AS consequent, support FROM support
      UNION ALL
      SELECT p2, p1, support FROM support
    )
    SELECT antecedent, consequent, CAST(support AS BIGINT) AS support,
           CAST(n_antecedent AS BIGINT) AS n_antecedent,
           CAST(support * 1000000 // n_antecedent AS BIGINT)
             AS confidence_ppm
    FROM rules JOIN item_n USING (antecedent)
    ORDER BY confidence_ppm DESC, support DESC, antecedent, consequent
    LIMIT {RULE_TOP_N}
"""


# --- cross-field consistency DQ ----------------------------------------------

# A lineitem is "consistent" when extendedprice ≈ quantity × the part's
# retail price: ratio_milli = 1000·cents(ext) div (qty·cents(retail))
# within [PRICE_RATIO_LO, PRICE_RATIO_HI] milli. TPC-H prices extended
# ≈ qty·retail·(1±ε), so violations measure corpus noise injection.
PRICE_RATIO_LO = 800
PRICE_RATIO_HI = 1200


def q_dq_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field consistency audit — the DQ rule family that checks
    ARITHMETIC relations between columns rather than per-column ranges:
    monthly rate of lineitems whose extendedprice/(quantity·retailprice)
    ratio falls outside [0.8, 1.2]. Output per ship month: (month,
    n_lines, n_violations, violation_ppm).

    Exactness: the ratio is integer milli on exact cents; month is
    date_trunc rendered as DATE; rates integer ppm via div.

    Scale shape: one broadcast-able dim join (part is the small side;
    Spark picks broadcast under threshold, the hint pins it) feeding a
    map-side-combinable month aggregate — no second shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select(
        "p_partkey", cents("p_retailprice").alias("rc")
    )
    ratio = F.expr(
        "CAST(1000 * ec div (CAST(ROUND(l_quantity, 0) AS BIGINT) * rc)"
        " AS BIGINT)"
    )
    return (
        li.select(
            F.col("l_partkey").alias("p_partkey"),
            F.to_date(F.date_trunc("month", "l_shipdate")).alias("month"),
            cents("l_extendedprice").alias("ec"),
            "l_quantity",
        )
        .join(F.broadcast(p), "p_partkey")
        .withColumn("r", ratio)
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (
                    (F.col("r") < PRICE_RATIO_LO)
                    | (F.col("r") > PRICE_RATIO_HI)
                ).cast("long")
            ).alias("n_violations"),
        )
        .withColumn(
            "violation_ppm",
            F.expr("CAST(n_violations * 1000000 div n_lines AS BIGINT)"),
        )
    )


PRICE_CONSISTENCY_SQL = f"""
    WITH j AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             CAST(1000 * {cents_sql('l_extendedprice')}
                  // (CAST(ROUND(l_quantity, 0) AS BIGINT)
                      * {cents_sql('p_retailprice')}) AS BIGINT) AS r
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT month, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN r < {PRICE_RATIO_LO} OR r > {PRICE_RATIO_HI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CAST(SUM(CASE WHEN r < {PRICE_RATIO_LO} OR r > {PRICE_RATIO_HI}
                         THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS violation_ppm
    FROM j GROUP BY 1
"""


# --- deterministic bootstrap CI ----------------------------------------------

BOOT_B = 16  # resamples; CI from the 2nd/15th order statistics (75% CI)


def q_orders_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap confidence interval for the mean order
    value — inferential uncertainty without RNG: BOOT_B half-sample
    resamples where order o enters resample b with weight
    2·bit_b(md5(o_orderkey)) ∈ {0, 2} (mean weight 1, variance 1 — the
    half-sample bootstrap, deterministic and portable through the md5
    base hash). The CI is the 2nd/15th order statistic of the 16
    resample means (a 75% interval). Output, one row: (n_orders,
    mean_cents, ci_lo_cents, ci_hi_cents, n_resamples).

    Exactness: weights are integer, money is cents, each resample mean
    is one integer division; order statistics are exact.

    Scale shape: the fact table fans out ×BOOT_B map-side (a projection,
    no shuffle growth — the aggregate is map-side-combinable into ≤16
    groups); everything after is a 16-row relation."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        cents("o_totalprice").alias("v"),
        md5_long(F.col("o_orderkey").cast("string")).alias("h"),
    )
    overall = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("CAST(SUM(v) div COUNT(*) AS BIGINT)").alias("mean_cents"),
    )
    fan = o.select(
        "v", "h", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    ).select(
        "b", F.expr("2 * (shiftright(h, CAST(b AS INT)) & 1)").alias("w"), "v"
    )
    means = fan.groupBy("b").agg(
        F.expr("CAST(SUM(w * v) div SUM(w) AS BIGINT)").alias("m")
    )
    wb = Window.orderBy("m")  # bounded: BOOT_B rows
    ranked = means.withColumn("rk", F.row_number().over(wb))
    lo = ranked.filter(F.col("rk") == 2).select(
        F.col("m").alias("ci_lo_cents")
    )
    hi = ranked.filter(F.col("rk") == BOOT_B - 1).select(
        F.col("m").alias("ci_hi_cents")
    )
    return (
        overall.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_orders",
            "mean_cents",
            "ci_lo_cents",
            "ci_hi_cents",
            F.lit(BOOT_B).cast("long").alias("n_resamples"),
        )
    )


def _bootstrap_sql() -> str:
    h = md5_long_sql("CAST(o_orderkey AS VARCHAR)")
    return f"""
    WITH o AS (
      SELECT {cents_sql('o_totalprice')} AS v, {h} AS h FROM orders
    ),
    overall AS (
      SELECT COUNT(*) AS n_orders, SUM(v) // COUNT(*) AS mean_cents FROM o
    ),
    fan AS (
      SELECT b, 2 * ((h >> b) & 1) AS w, v
      FROM o CROSS JOIN (SELECT unnest(range(0, {BOOT_B})) AS b)
    ),
    means AS (
      SELECT b, SUM(w * v) // SUM(w) AS m FROM fan GROUP BY 1
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m) AS rk FROM means
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(mean_cents AS BIGINT) AS mean_cents,
           CAST((SELECT m FROM ranked WHERE rk = 2) AS BIGINT)
             AS ci_lo_cents,
           CAST((SELECT m FROM ranked WHERE rk = {BOOT_B - 1}) AS BIGINT)
             AS ci_hi_cents,
           CAST({BOOT_B} AS BIGINT) AS n_resamples
    FROM overall
    WHERE n_orders > 0
"""
# WHERE n_orders > 0: on an EMPTY orders table the Spark pipeline emits 0
# rows (empty broadcast ci_lo/ci_hi cross), while the ungrouped aggregate
# alone would emit one all-NULL row — degenerate-input parity (ADVICE r8).


# --- LSH recall measurement --------------------------------------------------

LSH_RECALL_PLANES = (4, 6, 8)


def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of sign-random-projection LSH as a function of plane
    count ∈ {4, 6, 8} against the exact brute-force top-10 — the LSH
    twin of the certified IVF recall sweep (more planes = smaller
    buckets = fewer candidates = lower recall but less work; the table
    shows the trade). Candidates are same-bucket corpus vectors only.
    Output per plane count: (n_planes, hits, base, n_candidates,
    recall_ppm).

    Exactness: buckets use the certified LCG-hyperplane expression
    (identical text both engines, ann_lsh_buckets r2); ranking uses the
    sequential-fold cosine with (cos DESC, neighbor_id) total order;
    ratios integer ppm.

    Scale shape: per plane count, the candidate join is an equi-join on
    the bucket key (never a cross join); queries are N_QUERY_VECS
    broadcast rows, so each candidate relation is queries ×
    bucket-size; the three levels reuse the SAME corpus relation with
    three bucket columns computed in one pass."""
    from page_rank_mapreduce_java_spark.similarity.ann import (
        brute_force_topk,
        lsh_bucket_col,
    )
    from page_rank_mapreduce_java_spark.functions.vectors import cosine
    from page_rank_mapreduce_java_spark.similarity.queries import (
        N_QUERY_VECS,
        TOP_K,
    )

    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    brute = brute_force_topk(e, q, k=TOP_K).select("query_id", "neighbor_id")
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nvec"),
        *[
            lsh_bucket_col("embedding", n_planes=np_).alias(f"bkt{np_}")
            for np_ in LSH_RECALL_PLANES
        ],
    )
    qside = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        *[
            lsh_bucket_col("embedding", n_planes=np_).alias(f"qbkt{np_}")
            for np_ in LSH_RECALL_PLANES
        ],
    )
    parts = []
    for np_ in LSH_RECALL_PLANES:
        cand = (
            F.broadcast(qside)
            .join(
                corpus, F.col(f"qbkt{np_}") == F.col(f"bkt{np_}")
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        wr = Window.partitionBy("query_id").orderBy(
            F.desc(cosine(F.col("qvec"), F.col("nvec"))),
            F.asc("neighbor_id"),
        )
        ncand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        top = (
            cand.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        parts.append(
            top.join(brute, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
            .crossJoin(F.broadcast(ncand))
            .select(
                F.lit(np_).cast("long").alias("n_planes"),
                "hits",
                "n_candidates",
            )
        )
    sweep = reduce(lambda x, y: x.unionByName(y), parts)
    base = brute.agg(F.count(F.lit(1)).alias("base"))
    return sweep.crossJoin(F.broadcast(base)).select(
        "n_planes",
        "hits",
        "base",
        "n_candidates",
        F.expr("CAST(hits * 1000000 div base AS BIGINT)").alias("recall_ppm"),
    )


def _lsh_recall_sql() -> str:
    from page_rank_mapreduce_java_spark.similarity.ann import lsh_buckets_sql
    from page_rank_mapreduce_java_spark.functions.vectors import cosine_sql
    from page_rank_mapreduce_java_spark.similarity.queries import (
        N_QUERY_VECS,
        TOP_K,
    )

    levels = []
    for np_ in LSH_RECALL_PLANES:
        levels.append(f"""
      SELECT {np_} AS n_planes, hits, n_candidates FROM (
        SELECT COUNT(*) AS n_candidates,
               (SELECT COUNT(*) FROM (
                  SELECT query_id, neighbor_id FROM (
                    SELECT c.query_id, c.neighbor_id,
                           row_number() OVER (PARTITION BY c.query_id
                             ORDER BY c.cos DESC, c.neighbor_id ASC) AS rn
                    FROM cand{np_} c) WHERE rn <= {TOP_K})
                  t JOIN brute b
                    ON t.query_id = b.query_id
                   AND t.neighbor_id = b.neighbor_id) AS hits
        FROM cand{np_})""")
    cands = []
    for np_ in LSH_RECALL_PLANES:
        qb = lsh_buckets_sql(n_planes=np_, vec_col="q.embedding")
        nb = lsh_buckets_sql(n_planes=np_, vec_col="n.embedding")
        cands.append(f"""cand{np_} AS MATERIALIZED (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             {cosine_sql('q.embedding', 'n.embedding')} AS cos
      FROM embeddings q JOIN embeddings n
        ON ({qb}) = ({nb}) AND q.vec_id <> n.vec_id
      WHERE q.vec_id < {N_QUERY_VECS})""")
    union = "\n      UNION ALL\n".join(levels)
    return f"""
    WITH brute AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {cosine_sql('q.embedding', 'n.embedding')} DESC,
                          n.vec_id ASC) AS rn
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_QUERY_VECS})
      WHERE rn <= {TOP_K}
    ),
    {', '.join(cands)},
    sweep AS ({union})
    SELECT CAST(n_planes AS BIGINT) AS n_planes, CAST(hits AS BIGINT) AS hits,
           CAST((SELECT COUNT(*) FROM brute) AS BIGINT) AS base,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(hits * 1000000 // (SELECT COUNT(*) FROM brute) AS BIGINT)
             AS recall_ppm
    FROM sweep
"""


QUERIES = {
    "survival_kaplan_meier": q_survival_kaplan_meier,
    "orders_lift_gains_deciles": q_orders_lift_gains_deciles,
    "lineitem_rolling_corr": q_lineitem_rolling_corr,
    "embedding_silhouette": q_embedding_silhouette,
    "text_token_fertility": q_text_token_fertility,
    "sample_class_balanced": q_sample_class_balanced,
    "basket_rule_confidence": q_basket_rule_confidence,
    "dq_price_consistency": q_dq_price_consistency,
    "orders_bootstrap_ci_mean": q_orders_bootstrap_ci_mean,
    "ann_lsh_recall": q_ann_lsh_recall,
}

ORACLES = {
    "survival_kaplan_meier": _km_sql(),
    "orders_lift_gains_deciles": LIFT_GAINS_SQL,
    "lineitem_rolling_corr": ROLLING_CORR_SQL,
    "embedding_silhouette": _silhouette_sql(),
    "text_token_fertility": _fertility_sql(),
    "sample_class_balanced": _class_balanced_sql(),
    "basket_rule_confidence": _rule_confidence_sql(),
    "dq_price_consistency": PRICE_CONSISTENCY_SQL,
    "orders_bootstrap_ci_mean": _bootstrap_sql(),
    "ann_lsh_recall": _lsh_recall_sql(),
}
