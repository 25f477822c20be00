"""Text-analysis surface, batch 2 (round 5): corpus-profile statistics
for training-data curation — lexical diversity (type-token ratio),
character-class composition (uppercase/digit/space shares), boilerplate
detection via prefix duplication, and n-gram novelty (how much of each
source's shingle mass first appears there vs repeats earlier material).
These are the slice-level health metrics a pipeline tracks per source /
language between curation steps, complementing the per-document scores
in text_queries (quality, repetition, contamination).

Beyond-reference extension surface (the reference has no text handling;
SURVEY §2.9). Tokenization parity with the rest of the engine:
whitespace-split lowercased words (functions.textfn.words ==
WORDS_SQL), 3-word shingles (word_shingles == shingles_sql).

Canonicalization: counts are exact BIGINTs; ratios leave as ROUND(x·1e6)
ppm over identical double expressions.

Scale shape: explode-then-reduce everywhere — exploded words/shingles
flow straight into a map-side-combined groupBy keyed on
high-cardinality (term/shingle) or bounded (lang/source) keys; the
novelty query's only join is shingle-keyed first-occurrence against
per-doc shingles (candidate-volume-sized, never corpus²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.textfn import (
    shingles_sql,
    word_shingles,
    words,
)

WORDS_SQL = r"regexp_split_to_array(lower(text), '\s+')"


def q_text_ttr_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per language: |vocabulary| / |tokens| in ppm —
    the classic lexical-diversity score (low TTR at fixed size flags
    template/boilerplate-heavy slices).

    Scale shape: one explode into a (lang, word)-keyed distinct +
    count — both shuffles key on high-cardinality words or bounded
    langs with map-side partials; no windows.
    """
    d = load_table(spark, "documents", sf_dir)
    wx = d.select("lang", F.explode(words(F.col("text"))).alias("word"))
    agg = wx.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("word").alias("n_types"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "n_types",
        F.round(
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double") * 1e6
        )
        .cast("long")
        .alias("ttr_ppm"),
    )


TTR_SQL = f"""
    WITH wx AS (SELECT lang, unnest({WORDS_SQL}) AS word FROM documents),
    a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types
          FROM wx GROUP BY 1)
    SELECT lang, n_tokens, n_types,
           CAST(ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6, 0)
                AS BIGINT) AS ttr_ppm
    FROM a
"""


def q_text_charclass_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per language: uppercase, digit and
    space shares of total characters, in ppm — the cheap OCR-garbage /
    machine-generated-text detector (digit-heavy or case-anomalous
    slices jump out). Class counts via length(x) − length(remove-class)
    on identical regex character classes in both engines.

    Scale shape: narrow per-row projections into one bounded-key
    groupBy; no shuffle beyond the 5-language rollup.
    """
    d = load_table(spark, "documents", sf_dir)
    n = F.length("text").cast("long")
    upper = (n - F.length(F.regexp_replace(F.col("text"), "[A-Z]", ""))).cast("long")
    digit = (n - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))).cast("long")
    space = (n - F.length(F.regexp_replace(F.col("text"), "[ ]", ""))).cast("long")
    agg = d.select(
        "lang", n.alias("_n"), upper.alias("_u"), digit.alias("_d"), space.alias("_s")
    ).groupBy("lang").agg(
        F.sum("_n").alias("n_chars"),
        F.sum("_u").alias("_su"),
        F.sum("_d").alias("_sd"),
        F.sum("_s").alias("_ss"),
    )
    def ppm(c):
        return F.round(c.cast("double") / F.col("n_chars").cast("double") * 1e6).cast(
            "long"
        )

    return agg.select(
        "lang",
        "n_chars",
        ppm(F.col("_su")).alias("upper_ppm"),
        ppm(F.col("_sd")).alias("digit_ppm"),
        ppm(F.col("_ss")).alias("space_ppm"),
    )


CHARCLASS_SQL = """
    WITH p AS (
      SELECT lang, CAST(LENGTH(text) AS BIGINT) AS n,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g'))
                  AS BIGINT) AS u,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g'))
                  AS BIGINT) AS d,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[ ]', '', 'g'))
                  AS BIGINT) AS s
      FROM documents
    ),
    a AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_chars,
                 CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(d) AS BIGINT) AS sd,
                 CAST(SUM(s) AS BIGINT) AS ss
          FROM p GROUP BY 1)
    SELECT lang, n_chars,
           CAST(ROUND(CAST(su AS DOUBLE) / CAST(n_chars AS DOUBLE) * 1e6, 0)
                AS BIGINT) AS upper_ppm,
           CAST(ROUND(CAST(sd AS DOUBLE) / CAST(n_chars AS DOUBLE) * 1e6, 0)
                AS BIGINT) AS digit_ppm,
           CAST(ROUND(CAST(ss AS DOUBLE) / CAST(n_chars AS DOUBLE) * 1e6, 0)
                AS BIGINT) AS space_ppm
    FROM a
"""

PREFIX_LEN = 64


def q_text_prefix_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplication rate per source: share of documents whose
    first 64 characters collide with an earlier document's — the
    boilerplate/header detector (exact dedup misses bodies that differ
    after a templated opening; this catches them).

    Scale shape: md5 of a fixed-length prefix (narrow projection) into
    one (source, digest)-keyed distinct + a bounded-key rollup.
    """
    d = load_table(spark, "documents", sf_dir)
    p = d.select(
        "source", F.md5(F.substring("text", 1, PREFIX_LEN)).alias("ph")
    )
    agg = p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("ph").alias("n_prefixes"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_prefixes",
        F.round(
            (F.col("n_docs") - F.col("n_prefixes")).cast("double")
            / F.col("n_docs").cast("double")
            * 1e6
        )
        .cast("long")
        .alias("dup_ppm"),
    )


PREFIX_DUP_SQL = f"""
    WITH p AS (SELECT source, md5(SUBSTR(text, 1, {PREFIX_LEN})) AS ph
               FROM documents),
    a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT ph) AS BIGINT) AS n_prefixes
          FROM p GROUP BY 1)
    SELECT source, n_docs, n_prefixes,
           CAST(ROUND(CAST(n_docs - n_prefixes AS DOUBLE)
                      / CAST(n_docs AS DOUBLE) * 1e6, 0) AS BIGINT) AS dup_ppm
    FROM a
"""


def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty per source: of each document's distinct 3-word
    shingles, the share that FIRST appears in that document (first
    occurrence = minimum doc_id across the corpus) — a corpus-level
    redundancy measure that catches cross-source recycling exact and
    near-dup passes miss (novelty → 0 means the source re-treads
    earlier material shingle by shingle).

    Scale shape: per-doc distinct shingles explode into a
    shingle-keyed MIN aggregate (map-side partials over the natural
    power-law key distribution), then one shingle-keyed equi-join back
    — both shuffles on the same high-cardinality key, so AQE reuses
    the exchange; the rollup is source-sized.
    """
    d = load_table(spark, "documents", sf_dir)
    sh = (
        d.select("doc_id", "source", words(F.col("text")).alias("w"))
        .select("doc_id", "source", F.explode(word_shingles("w")).alias("s"))
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    j = sh.join(first, "s")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(
            F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
        ).alias("n_novel"),
    )
    return agg.select(
        "source",
        "n_shingles",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles").cast("double") * 1e6
        )
        .cast("long")
        .alias("novelty_ppm"),
    )


NGRAM_NOVELTY_SQL = f"""
    WITH w AS (SELECT doc_id, source, {WORDS_SQL} AS w FROM documents),
    sh AS (SELECT doc_id, source, unnest({shingles_sql('w')}) AS s FROM w),
    first AS (SELECT s, CAST(MIN(doc_id) AS BIGINT) AS first_doc
              FROM sh GROUP BY 1),
    a AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel
      FROM sh JOIN first USING (s) GROUP BY 1
    )
    SELECT source, n_shingles, n_novel,
           CAST(ROUND(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE) * 1e6, 0)
                AS BIGINT) AS novelty_ppm
    FROM a
"""


# Deterministic ln for the NLL score (ADVICE r5: JVM Math.log and DuckDB
# libm ln may differ in the last ulp — IEEE does not require ln to be
# correctly rounded — so a token landing within an ulp of a .5 micro-nat
# boundary could flip the integer sum between engines). The fix is the
# DCT-basis strategy: ONE shared formula built only from operations that
# ARE correctly rounded (+, −, ×, ÷) plus exact integer bit arithmetic,
# rendered into both engines so every intermediate double is
# bit-identical. For integer n ≥ 1:
#   k = ⌊log₂ n⌋           (bin-string length − 1: exact integer math)
#   m = n / 2^k ∈ [1, 2)   (2^k exact; division by a power of 2 exact)
#   ln n = k·ln2 + 2·artanh(t),  t = (m−1)/(m+1) ∈ [0, 1/3)
# with artanh as its odd series to t¹⁷ (|t|<1/3 ⇒ truncation < 1e-8
# nat — two orders below the micro-nat grain). Coefficient literals are
# Python float reprs, so both parsers recover the identical doubles.
_LN2 = repr(0.6931471805599453)  # round-trip repr of double nearest ln 2
_SERIES = [repr(2.0 / (2 * j + 1)) for j in range(9)]  # 2, 2/3, ..., 2/17


def ln_int_sql(n: str, engine: str) -> str:
    """Render the deterministic ln(n) expression for integer column/expr
    ``n`` ≥ 1. ``engine`` picks the shift spelling: Spark's shiftleft()
    vs DuckDB's << (everything else is common SQL)."""
    k = f"(length(bin(CAST({n} AS BIGINT))) - 1)"
    shl = (
        f"shiftleft(CAST(1 AS BIGINT), {k})"
        if engine == "spark"
        else f"(CAST(1 AS BIGINT) << {k})"
    )
    m = f"(CAST({n} AS DOUBLE) / CAST({shl} AS DOUBLE))"
    t = f"(({m} - 1.0) / ({m} + 1.0))"
    t2 = f"({t} * {t})"
    poly = _SERIES[-1]
    for c in _SERIES[-2::-1]:  # Horner over the odd series
        poly = f"({c} + {t2} * {poly})"
    return f"(CAST({k} AS DOUBLE) * {_LN2} + {t} * {poly})"


def q_text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document negative log-likelihood under the corpus's own
    unigram language model — the perplexity-proxy quality score an LLM
    data pipeline uses to rank/filter documents (high NLL = unusual
    token mix). p(w) = corpus_count(w) / corpus_tokens; each token's
    -ln p(w) = ln(tot) − ln(cnt) is computed with the shared
    deterministic ln (ln_int_sql — identical doubles on both engines,
    no libm-ulp cert flake) and snapped to integer micro-nats BEFORE
    summation (the money convention applied to log-space), so the
    per-doc sum is order-independent integer addition on both engines.
    Output: (doc_id, n_tokens, nll_micro) — no division, callers derive
    the mean.

    Scale shape: one token explode feeding (a) the word-count aggregate
    (map-side combinable, vocab-sized result) and (b) the per-doc join
    back on the word key; the 1-row total broadcasts. The model table is
    vocab-sized — at 100 TB it is the broadcast side of the scoring
    join."""
    d = load_table(spark, "documents", sf_dir)
    wx = d.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
    counts = wx.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("tot"))
    nll_w = (
        f"CAST(ROUND(({ln_int_sql('tot', 'spark')} - "
        f"{ln_int_sql('cnt', 'spark')}) * 1e6, 0) AS BIGINT)"
    )
    # Broadcast the model: the counts relation is vocab-sized, and the
    # word key is maximally skewed (stopwords) — a shuffle join here
    # would funnel the "the"-partition through one task at scale.
    scored = (
        wx.join(F.broadcast(counts), "word")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(nll_w).alias("nll_w"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("nll_w").alias("nll_micro"),
    )


UNIGRAM_NLL_SQL = f"""
    WITH wx AS (SELECT doc_id, unnest({WORDS_SQL}) AS word FROM documents),
    counts AS (SELECT word, COUNT(*) AS cnt FROM wx GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS tot FROM counts),
    scored AS (
      SELECT doc_id,
             CAST(ROUND(({ln_int_sql('tot', 'duckdb')}
                         - {ln_int_sql('cnt', 'duckdb')}) * 1e6, 0)
                  AS BIGINT) AS nll_w
      FROM wx JOIN counts USING (word), tot)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(nll_w) AS BIGINT) AS nll_micro
    FROM scored GROUP BY 1
"""


QUERIES = {
    "text_ttr_by_lang": q_text_ttr_by_lang,
    "text_charclass_by_lang": q_text_charclass_by_lang,
    "text_prefix_dup_rate": q_text_prefix_dup_rate,
    "text_ngram_novelty": q_text_ngram_novelty,
    "text_unigram_nll": q_text_unigram_nll,
}

ORACLES = {
    "text_ttr_by_lang": TTR_SQL,
    "text_charclass_by_lang": CHARCLASS_SQL,
    "text_prefix_dup_rate": PREFIX_DUP_SQL,
    "text_ngram_novelty": NGRAM_NOVELTY_SQL,
    "text_unigram_nll": UNIGRAM_NLL_SQL,
}
