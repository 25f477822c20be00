"""Relational/analytics surface, batch 37 (round 10 growth, final
wave): character-level corpus diversity (trigram entropy by language),
a Johnson-Lindenstrauss sketch-fidelity audit over the embedding
corpus, and the Benford chi-square goodness-of-fit decision statistic.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline
family). Registered in the round-10 window (demand stays ≤ 50 with
batches 35-36).

Exactness: integer quantization before every sum (micro-nats through
ln_int_sql, micro embedding elements, exact cents digit strings),
DECIMAL(38,0)/HUGEINT accumulators, `div`-`//` truncation parity, and
md5-derived sign bits (functions/hashes contract) so the projection
matrix is bit-identical across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.hashes import md5_long_sql
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql

# --- text_char_trigram_entropy_by_lang ------------------------------------------


def q_text_char_trigram_entropy_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Character-trigram entropy per language — the char-level corpus
    diversity signal (token-level measures like text_ttr_by_lang and
    text_simpson_diversity miss sub-token degeneracy: a corpus of
    shuffled words from a tiny character model reads diverse in tokens
    and collapsed in char n-grams, the standard quality tell for
    low-quality machine-generated text). H = −Σ (c/N)·ln(c/N) over the
    trigram distribution, in micro-nats. Output per language:
    (lang, n_trigrams, distinct_trigrams, entropy_micro).

    Exactness: trigram counts are exact integers; each term
    c·(ln N − ln c) goes through the deterministic ln on integer
    arguments and snaps to an integer micro-nat contribution BEFORE
    the (bounded, vocabulary-sized) sum; one terminal integer `div`
    by N.

    Scale shape: one position explode over the document scan (row
    count = corpus character count — the same order as any tokenizer
    pass) → ONE map-side-combined (lang, trigram) aggregate → a
    vocabulary-sized entropy rollup per language.
    """
    d = load_table(spark, "documents", sf_dir).filter(
        F.length("text") >= 3
    )
    tri = d.select(
        "lang",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - F.lit(2))
        ).alias("pos"),
        "text",
    ).select("lang", F.expr("substring(text, pos, 3)").alias("tri"))
    counts = tri.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("c"))
    per_lang = counts.groupBy("lang").agg(
        F.sum("c").alias("nt"), F.count(F.lit(1)).alias("nd")
    )
    term = (
        f"CAST(ROUND(CAST(c AS DOUBLE) * "
        f"({ln_int_sql('nt', 'spark')} - {ln_int_sql('c', 'spark')})"
        f" * 1e6, 0) AS BIGINT)"
    )
    terms = counts.join(F.broadcast(per_lang), "lang").select(
        "lang", "nt", "nd", F.expr(term).alias("t_micro")
    )
    return (
        terms.groupBy("lang", "nt", "nd")
        .agg(F.sum("t_micro").alias("ts"))
        .select(
            "lang",
            F.col("nt").cast("long").alias("n_trigrams"),
            F.col("nd").cast("long").alias("distinct_trigrams"),
            F.expr("CAST(ts div nt AS BIGINT)").alias("entropy_micro"),
        )
    )


def _trigram_entropy_sql() -> str:
    term = (
        f"CAST(ROUND(CAST(c AS DOUBLE) * "
        f"({ln_int_sql('nt', 'duckdb')} - {ln_int_sql('c', 'duckdb')})"
        f" * 1e6, 0) AS BIGINT)"
    )
    return f"""
    WITH positions AS (
      SELECT lang, text,
             unnest(range(1, length(text) - 1)) AS pos
      FROM documents WHERE length(text) >= 3),
    tri AS (
      SELECT lang, substr(text, CAST(pos AS INTEGER), 3) AS tri
      FROM positions),
    counts AS (
      SELECT lang, tri, COUNT(*) AS c FROM tri GROUP BY 1, 2),
    per_lang AS (
      SELECT lang, SUM(c) AS nt, COUNT(*) AS nd FROM counts GROUP BY 1),
    terms AS (
      SELECT counts.lang, nt, nd, {term} AS t_micro
      FROM counts JOIN per_lang ON counts.lang = per_lang.lang)
    SELECT lang, CAST(nt AS BIGINT) AS n_trigrams,
           CAST(nd AS BIGINT) AS distinct_trigrams,
           CAST(SUM(t_micro) // nt AS BIGINT) AS entropy_micro
    FROM terms GROUP BY lang, nt, nd
"""


# --- embedding_jl_projection_audit ----------------------------------------------

JL_K = 16  # target dimensionality of the sign projection
JL_PAIR_MOD = 20  # audit pairs (vec_id, vec_id+1) for vec_id % 20 == 0


def q_embedding_jl_projection_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson-Lindenstrauss fidelity audit of a 64→16 ±1 sign
    projection: for a deterministic sample of vector pairs, compare the
    projected squared distance ||R(a−b)||²/k against the true ||a−b||²
    — the go/no-go check before shipping a sketched (sub-linear) index
    in place of full-precision vectors (ann_pq_distortion audits the
    QUANTIZER's error; this audits the DIMENSIONALITY REDUCTION's).
    Output one row:
    (n_pairs, mean_ratio_milli, min_ratio_milli, max_ratio_milli) —
    ratio 1000 ≈ isometry; a wide min/max band means k is too small.

    Exactness: elements snap to integer micro BEFORE the difference, so
    diff vectors are exact integers; the sign matrix s(d,j) ∈ {−1,+1}
    derives from md5 (functions/hashes portability contract) and is
    bit-identical across engines; projections, squared norms, and
    per-pair milli ratios are pure integer arithmetic
    (DECIMAL(38,0)/HUGEINT, `div` truncation parity); min/max/mean run
    over exact integers.

    Scale shape: the pair sample is an equi-join on vec_id+1 filtered
    to 1/20 of vectors (never all-pairs); the projection explode is
    64·16 rows per sampled pair — linear in corpus size with a ~51×
    constant on the 1/20 sample, one map-side-combined aggregate per
    level.
    """
    e = load_table(spark, "embeddings", sf_dir)
    a = e.select(F.col("vec_id").alias("pid"), F.col("embedding").alias("ea"))
    b = e.select(
        (F.col("vec_id") - 1).alias("pid"), F.col("embedding").alias("eb")
    )
    pairs = a.filter(F.col("pid") % JL_PAIR_MOD == 0).join(b, "pid")
    elems = pairs.select(
        "pid",
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("pos"),
        "ea",
        "eb",
    ).select(
        "pid",
        "pos",
        (
            F.expr(
                "CAST(ROUND(CAST(element_at(ea, pos) AS DOUBLE) * 1e6, 0)"
                " AS BIGINT)"
            )
            - F.expr(
                "CAST(ROUND(CAST(element_at(eb, pos) AS DOUBLE) * 1e6, 0)"
                " AS BIGINT)"
            )
        ).alias("dm"),
    )
    orig = elems.groupBy("pid").agg(
        F.sum(
            F.col("dm").cast("decimal(38,0)") * F.col("dm").cast("decimal(38,0)")
        ).alias("orig2")
    )
    proj = (
        elems.select(
            "pid",
            "dm",
            "pos",
            F.explode(F.sequence(F.lit(0), F.lit(JL_K - 1))).alias("j"),
        )
        .select(
            "pid",
            "j",
            F.expr(
                "CAST((1 - 2 * (CAST(conv(substring(md5(concat(pos - 1, ':',"
                " j)), 1, 15), 16, 10) AS BIGINT) % 2)) AS BIGINT) * dm"
            ).alias("sdm"),
        )
        .groupBy("pid", "j")
        .agg(F.sum("sdm").cast("decimal(38,0)").alias("yj"))
        .groupBy("pid")
        .agg(F.sum(F.col("yj") * F.col("yj")).alias("proj2"))
    )
    ratios = orig.join(proj, "pid").filter(F.col("orig2") > 0).select(
        F.expr(
            f"CAST((1000 * proj2) div ({JL_K} * orig2) AS BIGINT)"
        ).alias("ratio_milli")
    )
    return ratios.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST(sum(ratio_milli) div count(1) AS BIGINT)").alias(
            "mean_ratio_milli"
        ),
        F.min("ratio_milli").cast("long").alias("min_ratio_milli"),
        F.max("ratio_milli").cast("long").alias("max_ratio_milli"),
    )


def _jl_audit_sql() -> str:
    sign_hash = md5_long_sql("(pos - 1) || ':' || tj.j")
    sign = f"(1 - 2 * ({sign_hash} % 2))"
    return f"""
    WITH pairs AS (
      SELECT a.vec_id AS pid, a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % {JL_PAIR_MOD} = 0),
    elems AS (
      SELECT pid, t.pos AS pos,
             CAST(ROUND(CAST(ea[CAST(t.pos AS INTEGER)] AS DOUBLE) * 1e6, 0)
                  AS HUGEINT)
             - CAST(ROUND(CAST(eb[CAST(t.pos AS INTEGER)] AS DOUBLE) * 1e6, 0)
                    AS HUGEINT) AS dm
      FROM pairs CROSS JOIN range(1, 65) t(pos)),
    orig AS (
      SELECT pid, SUM(dm * dm) AS orig2 FROM elems GROUP BY 1),
    sdm AS (
      SELECT pid, tj.j AS j, SUM({sign} * dm) AS yj
      FROM elems CROSS JOIN range({JL_K}) tj(j)
      GROUP BY 1, 2),
    proj AS (
      SELECT pid, SUM(yj * yj) AS proj2 FROM sdm GROUP BY 1),
    ratios AS (
      SELECT CAST((1000 * proj2) // ({JL_K} * orig2) AS BIGINT)
               AS ratio_milli
      FROM orig JOIN proj ON orig.pid = proj.pid
      WHERE orig2 > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ratio_milli) // COUNT(*) AS BIGINT)
             AS mean_ratio_milli,
           CAST(MIN(ratio_milli) AS BIGINT) AS min_ratio_milli,
           CAST(MAX(ratio_milli) AS BIGINT) AS max_ratio_milli
    FROM ratios
"""


# --- dq_benford_chi2_totalprice -------------------------------------------------

# Benford first-digit probabilities log10(1 + 1/d) as integer micro
# literals rendered from the same Python constants into both engines
# (the NDCG-weights convention).
_BENFORD_P = [round(1_000_000 * math.log10(1 + 1 / d)) for d in range(1, 10)]
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {_BENFORD_P[d - 1]}" for d in range(1, 10)
) + " END"

# Per-digit chi-square contribution, snapped to milli before the 9-row
# sum: (O·1e6 − N·p)² / (1e6·N·p), all inputs exact integers < 2^53.
_CHI2_TERM = f"""
    CAST(ROUND(1e3 *
      (CAST(n_d AS DOUBLE) * 1e6 - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
      * (CAST(n_d AS DOUBLE) * 1e6 - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
      / (1e6 * CAST(n AS DOUBLE) * ({_BENFORD_CASE})), 0) AS BIGINT)
"""


def q_dq_benford_chi2_totalprice(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-square goodness-of-fit of order totals against Benford's law
    — the DECISION statistic over benford_totalprice's per-digit table
    (9 deviations need a threshold; χ² with df=8 IS the threshold: the
    fabricated-numbers alarm fires on one number, not nine). Output one
    row: (n_orders, chi2_milli, df).

    Exactness: first digits come from the exact decimal string of
    integer cents (the benford_totalprice convention); expected
    probabilities are integer micro literals rendered from the same
    Python constants into both engines; each digit's χ² term is one
    shared expression over exact integers snapped to milli before the
    9-row sum. The observed counts are left-joined against the full
    1-9 digit domain with COALESCE(n_d, 0), so a digit with zero
    occurrences still contributes its (0 − N·p)²/(N·p) term — the
    textbook df=8 statistic, not the observed-digits-only understate
    (ADVICE r10).

    Scale shape: one map-side-combined groupBy to ≤9 rows; everything
    after is bounded.
    """
    o = load_table(spark, "orders", sf_dir)
    digit = F.substring(
        cents("o_totalprice").cast("string"), 1, 1
    ).cast("long")
    agg = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n_d")
    )
    full = (
        spark.range(1, 10)
        .select(F.col("id").alias("digit"))
        .join(F.broadcast(agg), "digit", "left")
        .select("digit", F.coalesce("n_d", F.lit(0)).alias("n_d"))
    )
    tot = full.agg(F.sum("n_d").alias("n"))
    terms = full.crossJoin(F.broadcast(tot)).select(
        "n", F.expr(_CHI2_TERM).alias("t_milli")
    )
    return terms.groupBy("n").agg(F.sum("t_milli").alias("chi2")).select(
        F.col("n").cast("long").alias("n_orders"),
        F.col("chi2").cast("long").alias("chi2_milli"),
        F.lit(8).cast("long").alias("df"),
    )


def _benford_chi2_sql() -> str:
    c = cents_sql("o_totalprice")
    return f"""
    WITH agg AS (
      SELECT CAST(substr(CAST({c} AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             COUNT(*) AS n_d
      FROM orders GROUP BY 1),
    filled AS (
      SELECT t.d AS digit, COALESCE(agg.n_d, 0) AS n_d
      FROM range(1, 10) t(d) LEFT JOIN agg ON agg.digit = t.d),
    tot AS (SELECT SUM(n_d) AS n FROM filled),
    terms AS (
      SELECT n, {_CHI2_TERM} AS t_milli FROM filled, tot)
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(SUM(t_milli) AS BIGINT) AS chi2_milli,
           CAST(8 AS BIGINT) AS df
    FROM terms GROUP BY n
"""


QUERIES = {
    "text_char_trigram_entropy_by_lang": q_text_char_trigram_entropy_by_lang,
    "embedding_jl_projection_audit": q_embedding_jl_projection_audit,
    "dq_benford_chi2_totalprice": q_dq_benford_chi2_totalprice,
}

ORACLES = {
    "text_char_trigram_entropy_by_lang": _trigram_entropy_sql(),
    "embedding_jl_projection_audit": _jl_audit_sql(),
    "dq_benford_chi2_totalprice": _benford_chi2_sql(),
}
