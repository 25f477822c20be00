"""Relational/analytics surface, batch 20 (round 8 growth, second
wave): interpolated language-model scoring, temperature-based data
mixing, market concentration, the forward as-of join, the MinHash
threshold tuning curve, a Hurst-exponent long-memory estimate, and
leave-one-out kNN label accuracy.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Registered AFTER the round-8 audit window filled (50/50 with the
chassis-edit recertifications), so these queries are locally
oracle-certified (tools/check_oracle.py sf0.01 + sf0.001) and queue
for the round-9 driver window via the audit-ordering mechanism — the
same deferral path the batch-19 tail uses.

Exactness follows the house conventions: integer cents/ppm/milli
through `div`, logs through the deterministic integer-ln contract
(every ln argument here is an integer or an integer-snapped micro
value), hashes through the portable md5 base, cosine through the
sequential fold, and sqrt only where IEEE 754 requires correct
rounding (it does for sqrt — unlike ln — so sqrt of an exact integer
is bit-identical cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.hashes import md5_long, md5_long_sql
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import (
    WORDS_SQL,
    ln_int_sql,
)
from page_rank_mapreduce_java_spark.functions.textfn import words

_LN2 = repr(0.6931471805599453)  # round-trip repr of double nearest ln 2


# --- Jelinek-Mercer interpolated bigram NLL ----------------------------------

# p(w2|w1) = 0.9·c12/c1 + 0.1·cu(w2)/T, expressed over a common integer
# denominator so BOTH ln arguments stay integers:
#   −ln p = ln(10·c1·T) − ln(9·c12·T + cu·c1)
# λ = 0.9 as the 9/10 rational keeps everything integral. The products
# stay < 2^63 up to T ≈ 3·10⁹ corpus tokens per scored shard — beyond
# that a pipeline scores against per-shard models (documented bound, the
# same class as the PCA decimal note).
INTERP_NUM = 9
INTERP_DEN = 10


def q_text_bigram_nll_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document NLL under a Jelinek-Mercer interpolated bigram model
    (0.9·bigram + 0.1·unigram) — the smoothing an LLM-pipeline quality
    scorer actually ships (add-one, the text_bigram_nll baseline,
    over-penalizes rare contexts; interpolation backs off smoothly).
    Output: (doc_id, n_bigrams, nll_interp_micro).

    Exactness: with λ = 9/10 the probability is a ratio of integers, so
    each token's −ln p = ln(10·c1·T) − ln(9·c12·T + cu·c1) runs both ln
    calls through the deterministic integer-ln contract and snaps to
    micro-nats BEFORE the per-doc sum (order-independent integer
    addition both engines).

    Scale shape: one token explode feeding the bigram LEAD window
    (partitioned by doc — high-cardinality); model counts reduce to
    vocab/vocab²-bounded relations joined back on the token keys; the
    1-row total broadcasts. The corpus is touched once."""
    d = load_table(spark, "documents", sf_dir)
    wx = d.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "w1")
    )
    wlead = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        wx.withColumn("w2", F.lead("w1").over(wlead))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "w1", "w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    cu = wx.groupBy(F.col("w1").alias("w2")).agg(
        F.count(F.lit(1)).alias("cu")
    )
    t = wx.agg(F.count(F.lit(1)).alias("t"))
    nll = (
        f"CAST(ROUND(({ln_int_sql(f'({INTERP_DEN} * c1 * t)', 'spark')} - "
        f"{ln_int_sql(f'({INTERP_NUM} * c12 * t + cu * c1)', 'spark')})"
        " * 1e6, 0) AS BIGINT)"
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(cu, "w2")
        .crossJoin(F.broadcast(t))
        .select("doc_id", F.expr(nll).alias("nll_w"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("nll_w").alias("nll_interp_micro"),
    )


def _bigram_interp_sql() -> str:
    nll = (
        f"CAST(ROUND(({ln_int_sql(f'({INTERP_DEN} * c1 * t)', 'duckdb')} - "
        f"{ln_int_sql(f'({INTERP_NUM} * c12 * t + cu * c1)', 'duckdb')})"
        " * 1e6, 0) AS BIGINT)"
    )
    return f"""
    WITH wx AS (
      SELECT doc_id, pos, w1 FROM (
        SELECT doc_id,
               generate_subscripts({WORDS_SQL}, 1) AS pos,
               unnest({WORDS_SQL}) AS w1
        FROM documents)
    ),
    bg AS (
      SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, w1,
               LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM wx) WHERE w2 IS NOT NULL
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    cu AS (SELECT w1 AS w2, COUNT(*) AS cu FROM wx GROUP BY 1),
    tot AS (SELECT COUNT(*) AS t FROM wx)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM({nll}) AS BIGINT) AS nll_interp_micro
    FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
            JOIN cu USING (w2) CROSS JOIN tot
    GROUP BY doc_id
"""


# --- temperature-scaled data mixture -----------------------------------------

# α = 0.5 temperature: sampling weight ∝ n^0.5 (the mT5/XLM-R mixing
# rule that up-weights low-resource languages). floor(sqrt(n)) keeps the
# weight integral — sqrt is correctly rounded by IEEE 754, so the floor
# is bit-identical cross-engine; quotas then stay in integer arithmetic.
MIX_TARGET_DEN = 2  # sample half the corpus


def q_sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (α = 0.5) language mixture for a training-set
    builder: per-language quotas ∝ √n_lang (flattening the en-heavy
    corpus toward low-resource languages), then a deterministic
    md5-ordered selection of each language's quota, capped at the
    language's own size (sampling without replacement). Output is the
    per-language proof of the exact selected set: (lang, n_docs,
    weight, quota, n_kept, sum_doc_ids).

    Scale shape: quotas come from a lang-cardinality aggregate
    (broadcast); selection runs the two-level prune — a LOCAL
    per-(input-partition, lang) top-maxquota window first (key
    cardinality tracks the input, never a full-fact single-task
    window), then the exact per-lang rank over the bounded survivors
    joined against the quota relation. The max quota resolves with one
    driver-side aggregate at plan-build time (the pairsize bound
    contract)."""
    d = load_table(spark, "documents", sf_dir).select(
        "lang",
        "doc_id",
        md5_long(F.col("doc_id").cast("string")).alias("h"),
    )
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    weights = counts.select(
        "lang", "n",
        F.expr("CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)").alias("w"),
    )
    tot = weights.agg(
        F.sum("n").alias("tn"), F.sum("w").alias("tw")
    )
    quotas = weights.crossJoin(F.broadcast(tot)).select(
        "lang", "n", "w",
        F.expr(
            f"least(n, (tn div {MIX_TARGET_DEN}) * w div tw)"
        ).alias("quota"),
    )
    maxq = int(quotas.agg(F.max("quota")).head()[0])
    pruned = (
        d.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrn",
            F.row_number().over(
                Window.partitionBy("_pid", "lang").orderBy(
                    F.asc("h"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("_lrn") <= maxq)
        .drop("_pid", "_lrn")
    )
    ranked = pruned.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.asc("h"), F.asc("doc_id"))
        ),
    )
    kept = ranked.join(F.broadcast(quotas), "lang").filter(
        F.col("rn") <= F.col("quota")
    )
    return kept.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        F.max("w").alias("weight"),
        F.max("quota").alias("quota"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_doc_ids"),
    )


def _temperature_mixture_sql() -> str:
    h = md5_long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH d AS (SELECT lang, doc_id, {h} AS h FROM documents),
    counts AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY 1),
    weights AS (
      SELECT lang, n,
             CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS w
      FROM counts
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(w) AS tw FROM weights),
    quotas AS (
      SELECT lang, n, w,
             LEAST(n, (tn // {MIX_TARGET_DEN}) * w // tw) AS quota
      FROM weights CROSS JOIN tot
    ),
    ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY h ASC, doc_id ASC) AS rn
      FROM d
    )
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(w) AS BIGINT) AS weight,
           CAST(MAX(quota) AS BIGINT) AS quota,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
    FROM ranked JOIN quotas USING (lang)
    WHERE rn <= quota
    GROUP BY lang
"""


# --- market concentration (CR4) ----------------------------------------------

CR_TOP_N = 4


def q_supplier_concentration_cr4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-firm concentration ratio per nation: the share of national
    supplier revenue captured by the top-4 suppliers — the antitrust
    companion of hhi_nation_revenue (CR4 reads the head of the
    distribution, HHI its whole shape). Output: (n_name, n_suppliers,
    total_rev_cents, cr4_ppm).

    Scale shape: the ONLY fact-scale work is the map-side-combinable
    revenue aggregate lineitem→supplier; everything after runs on the
    supplier-grain relation (dim-sized at any scale factor), where the
    per-nation rank window is bounded-domain by construction."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    n = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(cents("l_extendedprice")).alias("rc"))
        .join(F.broadcast(s), "l_suppkey")
        .join(F.broadcast(n), "s_nationkey")
    )
    wr = Window.partitionBy("n_name").orderBy(
        F.desc("rc"), F.asc("l_suppkey")
    )
    return (
        rev.withColumn("rk", F.row_number().over(wr))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("rc").alias("total_rev_cents"),
            F.sum(F.when(F.col("rk") <= CR_TOP_N, F.col("rc")).otherwise(0))
            .alias("_top"),
        )
        .select(
            "n_name",
            "n_suppliers",
            "total_rev_cents",
            F.expr("CAST(_top * 1000000 div total_rev_cents AS BIGINT)").alias(
                "cr4_ppm"
            ),
        )
    )


CR4_SQL = f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({cents_sql('l_extendedprice')}) AS rc
      FROM lineitem GROUP BY 1
    ),
    tagged AS (
      SELECT n.n_name, r.rc,
             row_number() OVER (PARTITION BY n.n_name
               ORDER BY r.rc DESC, r.l_suppkey ASC) AS rk
      FROM rev r
      JOIN supplier s ON r.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(rc) AS BIGINT) AS total_rev_cents,
           CAST(SUM(CASE WHEN rk <= {CR_TOP_N} THEN rc ELSE 0 END)
                * 1000000 // SUM(rc) AS BIGINT) AS cr4_ppm
    FROM tagged GROUP BY 1
"""


# --- forward as-of join ------------------------------------------------------


def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — for each order, the customer's EARLIEST
    event at or after the order date (the first-activity-after-purchase
    attribution read; the backward twin is join_asof_latest_order).
    Realized by the same single-shuffle union-sort chassis run on
    REVERSED time: backward-latest on (anchor − t) is forward-earliest
    on t. Inner join — orders never followed by an event drop. Ties on
    (user, ts) collapse to MIN event_id ("earliest") before the join so
    both engines pick the same event. Output: (o_orderkey, user_id,
    next_event_id).

    Scale shape: one exchange on user_id + one in-partition sort —
    the sort-merge-join cost envelope, no per-row range probe."""
    from page_rank_mapreduce_java_spark.operators.asof import asof_join

    # Time reversal without epoch conversion: microseconds UP TO a fixed
    # far-future anchor. Monotone decreasing in ts, NTZ-native (no
    # session-timezone dependence a unix_* conversion would introduce),
    # and identical on both relations, so backward-latest on nts is
    # forward-earliest on ts.
    anchor = "CAST('2100-01-01 00:00:00' AS TIMESTAMP_NTZ)"
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("user_id"),
        F.expr(
            f"timestampdiff(MICROSECOND, o_orderdate, {anchor})"
        ).alias("nts"),
        "o_orderkey",
    )
    e = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            "user_id",
            F.expr(f"timestampdiff(MICROSECOND, ts, {anchor})").alias(
                "nts"
            ),
        )
        .agg(F.min("event_id").alias("next_event_id"))
    )
    joined = asof_join(
        o, e, on="user_id", ts="nts", payload=["next_event_id"],
        tiebreak=["o_orderkey"],
    )
    return joined.select("o_orderkey", "user_id", "next_event_id")


ASOF_FORWARD_SQL = """
    WITH e AS (
      SELECT user_id, ts, MIN(event_id) AS next_event_id
      FROM events GROUP BY 1, 2
    )
    SELECT o.o_orderkey, o.o_custkey AS user_id, j.next_event_id
    FROM orders o
    JOIN LATERAL (
      SELECT next_event_id FROM e
      WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      ORDER BY e.ts ASC, e.next_event_id ASC LIMIT 1
    ) j ON TRUE
"""


# --- MinHash threshold tuning curve ------------------------------------------

MINHASH_THRESHOLDS = (8, 10, 12, 14, 16)  # of NUM_MINHASH=16 slots


def q_dedup_minhash_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Candidate-pair survival curve vs MinHash agreement threshold —
    the tuning table a dedup deployment reads to pick its Jaccard
    cutoff: for t ∈ {8,10,12,14,16} matching signature slots (of 16),
    how many LSH candidate pairs estimate J ≥ t/16. Output per
    threshold: (min_slots, thresh_ppm, n_pairs).

    Scale shape: the certified jaccard-estimation relation (banded
    equi-join candidates + two doc-keyed signature joins) computes
    ONCE; the curve is a single-pass 5-way conditional aggregate over
    it (map-side combinable into one row) unpivoted to the 5-row table
    with stack() — no join, no second pass."""
    from page_rank_mapreduce_java_spark.dedup.queries import (
        q_dedup_minhash_jaccard_est,
    )
    from page_rank_mapreduce_java_spark.functions.hashes import NUM_MINHASH

    est = q_dedup_minhash_jaccard_est(spark, sf_dir).select("k_agree")
    # Coalesce to 0: on an EMPTY candidate-pair relation SUM is NULL
    # while the oracle's LEFT JOIN + COUNT(e.k_agree) yields 0 per
    # threshold (ADVICE r8 degenerate-case parity).
    wide = est.agg(
        *[
            F.coalesce(
                F.sum((F.col("k_agree") >= t).cast("long")), F.lit(0)
            ).alias(f"n{t}")
            for t in MINHASH_THRESHOLDS
        ]
    )
    stack_args = ", ".join(
        f"CAST({t} AS BIGINT), n{t}" for t in MINHASH_THRESHOLDS
    )
    return wide.selectExpr(
        f"stack({len(MINHASH_THRESHOLDS)}, {stack_args})"
        " AS (min_slots, n_pairs)"
    ).selectExpr(
        "min_slots",
        f"CAST(min_slots * 1000000 div {NUM_MINHASH} AS BIGINT)"
        " AS thresh_ppm",
        "CAST(n_pairs AS BIGINT) AS n_pairs",
    )


def _threshold_curve_sql() -> str:
    from page_rank_mapreduce_java_spark.dedup.queries import _jaccard_est_sql
    from page_rank_mapreduce_java_spark.functions.hashes import NUM_MINHASH

    vals = ", ".join(f"({t})" for t in MINHASH_THRESHOLDS)
    return f"""
    WITH est AS MATERIALIZED ({_jaccard_est_sql()}),
    th(min_slots) AS (VALUES {vals})
    SELECT CAST(min_slots AS BIGINT) AS min_slots,
           CAST(min_slots * 1000000 // {NUM_MINHASH} AS BIGINT)
             AS thresh_ppm,
           CAST(COUNT(e.k_agree) AS BIGINT) AS n_pairs
    FROM th LEFT JOIN est e ON e.k_agree >= th.min_slots
    GROUP BY min_slots
"""


# --- Hurst exponent (rescaled-range) -----------------------------------------

HURST_BLOCKS = (8, 16, 32)  # active-hour block sizes


def _hurst_rs_block(hourly: DataFrame, n: int) -> DataFrame:
    """Mean R/S (integer micro) over consecutive ``n``-hour blocks of the
    active-hour count series. All block statistics are exact integers:
    Y_k = n·cumsum(c) − k·Σc (the n-scaled mean-adjusted cumulative
    deviation), R·n = max Y − min Y, S²·n² = n·Σc² − (Σc)², so
    R/S = (maxY − minY)/√(nΣc² − (Σc)²) — one correctly-rounded sqrt
    and division per block, snapped to micro before the integer mean."""
    b = hourly.select(
        F.expr(f"(rn - 1) div {n}").alias("blk"),
        F.expr(f"(rn - 1) % {n} + 1").alias("k"),
        "c",
    )
    wb = Window.partitionBy("blk").orderBy("k")
    y = (
        b.withColumn("cum", F.sum("c").over(
            wb.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot", F.sum("c").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("y", F.lit(n) * F.col("cum") - F.col("k") * F.col("tot"))
    )
    per_blk = y.groupBy("blk").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("y").alias("maxy"),
        F.min("y").alias("miny"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    ).filter(
        (F.col("cnt") == n)
        & (F.lit(n) * F.col("sc2") - F.col("sc") * F.col("sc") > 0)
    )
    rs = per_blk.select(
        F.expr(
            f"CAST(ROUND((maxy - miny) / sqrt(CAST({n} * sc2 - sc * sc"
            " AS DOUBLE)) * 1e6, 0) AS BIGINT)"
        ).alias("rs_micro")
    )
    return rs.agg(
        F.expr("CAST(SUM(rs_micro) div COUNT(*) AS BIGINT)").alias(
            f"rs{n}_micro"
        )
    )


def q_events_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-arrival series by
    rescaled-range analysis — the long-memory diagnostic (H ≈ 0.5
    memoryless, H > 0.5 persistent/bursty, H < 0.5 anti-persistent):
    mean R/S over consecutive blocks of {8,16,32} active hours, and the
    log-log slope between the extreme block sizes. With three
    log-equally-spaced sizes the least-squares slope reduces exactly to
    (ln rs₃₂ − ln rs₈)/(2·ln 2) — the micro scaling cancels in the
    difference. Output, one row: (rs8_micro, rs16_micro, rs32_micro,
    hurst_milli).

    Exactness: per-block R and S² are exact integer arithmetic (see
    _hurst_rs_block); each block's R/S snaps to integer micro before
    the integer mean; the final slope feeds the two integer means
    through the deterministic integer-ln contract, so every double in
    the pipeline is bit-identical cross-engine.

    Scale shape: one map-side-combinable aggregate events→hour;
    everything after runs on the bounded active-hour relation (the
    calendar-grain bounded-domain convention)."""
    e = load_table(spark, "events", sf_dir)
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("h"))
        )
    )
    parts = [_hurst_rs_block(hourly, n) for n in HURST_BLOCKS]
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(F.broadcast(p))
    lo, hi = HURST_BLOCKS[0], HURST_BLOCKS[-1]
    hurst = (
        f"CAST(ROUND(1000.0 * ({ln_int_sql(f'greatest(rs{hi}_micro, 1)', 'spark')}"
        f" - {ln_int_sql(f'greatest(rs{lo}_micro, 1)', 'spark')})"
        f" / (2.0 * {_LN2}), 0) AS BIGINT)"
    )
    return out.select(
        f"rs{HURST_BLOCKS[0]}_micro",
        f"rs{HURST_BLOCKS[1]}_micro",
        f"rs{HURST_BLOCKS[2]}_micro",
        F.expr(hurst).alias("hurst_milli"),
    )


def _hurst_sql() -> str:
    blocks = []
    for n in HURST_BLOCKS:
        blocks.append(f"""rs{n} AS (
      SELECT CAST(SUM(rs_micro) // COUNT(*) AS BIGINT) AS rs{n}_micro
      FROM (
        SELECT CAST(ROUND((MAX(y) - MIN(y))
                 / sqrt(CAST({n} * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE))
                 * 1e6, 0) AS BIGINT) AS rs_micro
        FROM (
          SELECT blk, k, c,
                 {n} * SUM(c) OVER (PARTITION BY blk ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - k * SUM(c) OVER (PARTITION BY blk) AS y
          FROM (
            SELECT (rn - 1) // {n} AS blk, (rn - 1) % {n} + 1 AS k, c
            FROM hourly)
        ) GROUP BY blk
        HAVING COUNT(*) = {n}
           AND {n} * SUM(c * c) - SUM(c) * SUM(c) > 0
      )
    )""")
    lo, hi = HURST_BLOCKS[0], HURST_BLOCKS[-1]
    hurst = (
        f"CAST(ROUND(1000.0 * ({ln_int_sql(f'greatest(rs{hi}_micro, 1)', 'duckdb')}"
        f" - {ln_int_sql(f'greatest(rs{lo}_micro, 1)', 'duckdb')})"
        f" / (2.0 * {_LN2}), 0) AS BIGINT)"
    )
    cols = ", ".join(f"rs{n}_micro" for n in HURST_BLOCKS)
    cross = " CROSS JOIN ".join(f"rs{n}" for n in HURST_BLOCKS)
    return f"""
    WITH hourly AS (
      SELECT c, row_number() OVER (ORDER BY h) AS rn FROM (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1)
    ),
    {', '.join(blocks)}
    SELECT {cols}, {hurst} AS hurst_milli
    FROM {cross}
"""


# --- leave-one-out kNN label accuracy ----------------------------------------

KNN_EVAL_N = 64
KNN_K = 5


def q_embedding_knn_label_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leave-one-out kNN classification accuracy of the embedding space
    — the label-coherence eval an embedding pipeline tracks (do nearby
    vectors share labels?): for the first KNN_EVAL_N vectors, predict
    the majority label of the exact cosine top-KNN_K neighbors
    (excluding self; ties by count DESC then label ASC) and compare to
    the vector's own label. Output per true label: (label, n_eval,
    n_correct, accuracy_ppm).

    Scale shape: the eval set broadcasts against the corpus (the
    certified brute-force chassis — at 100 TB the same read runs
    against the ANN index instead); voting and scoring are
    eval-set-bounded relations."""
    from page_rank_mapreduce_java_spark.similarity.ann import brute_force_topk

    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < KNN_EVAL_N)
    top = brute_force_topk(e, q, k=KNN_K).select("query_id", "neighbor_id")
    lbl = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")
    )
    votes = (
        top.join(lbl, "neighbor_id")
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("nl"))
    pred = (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("nl").alias("pred"))
    )
    own = q.select(F.col("vec_id").alias("query_id"), "label")
    return (
        own.join(pred, "query_id")
        .groupBy(F.col("label").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum((F.col("pred") == F.col("label")).cast("long")).alias(
                "n_correct"
            ),
        )
        .withColumn(
            "accuracy_ppm",
            F.expr("CAST(n_correct * 1000000 div n_eval AS BIGINT)"),
        )
    )


def _knn_accuracy_sql() -> str:
    from page_rank_mapreduce_java_spark.functions.vectors import cosine_sql

    return f"""
    WITH top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {cosine_sql('q.embedding', 'n.embedding')} DESC,
                          n.vec_id ASC) AS rn
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {KNN_EVAL_N})
      WHERE rn <= {KNN_K}
    ),
    votes AS (
      SELECT t.query_id, e.label AS nl, COUNT(*) AS v
      FROM top t JOIN embeddings e ON t.neighbor_id = e.vec_id
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT query_id, nl AS pred FROM (
        SELECT query_id, nl,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY v DESC, nl ASC) AS rk
        FROM votes) WHERE rk = 1
    )
    SELECT CAST(e.label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS accuracy_ppm
    FROM embeddings e JOIN pred p ON e.vec_id = p.query_id
    WHERE e.vec_id < {KNN_EVAL_N}
    GROUP BY 1
"""


QUERIES = {
    "text_bigram_nll_interp": q_text_bigram_nll_interp,
    "sample_temperature_mixture": q_sample_temperature_mixture,
    "supplier_concentration_cr4": q_supplier_concentration_cr4,
    "join_asof_forward": q_join_asof_forward,
    "dedup_minhash_threshold_curve": q_dedup_minhash_threshold_curve,
    "events_hurst_rs": q_events_hurst_rs,
    "embedding_knn_label_accuracy": q_embedding_knn_label_accuracy,
}

ORACLES = {
    "text_bigram_nll_interp": _bigram_interp_sql(),
    "sample_temperature_mixture": _temperature_mixture_sql(),
    "supplier_concentration_cr4": CR4_SQL,
    "join_asof_forward": ASOF_FORWARD_SQL,
    "dedup_minhash_threshold_curve": _threshold_curve_sql(),
    "events_hurst_rs": _hurst_sql(),
    "embedding_knn_label_accuracy": _knn_accuracy_sql(),
}
