"""Text-analysis surface, batch 3 (round 6): corpus-mixture planning and
deeper language-model scoring for training-data curation — largest-
remainder token-budget apportionment (the deterministic mixture-weight
allocator every multi-source pretraining run needs), per-document bigram
NLL (the conditional-probability upgrade of text_unigram_nll), and a
readability profile per language (words/sentence, chars/word — the
Flesch-style structural signals).

Beyond-reference extension surface (SURVEY §2.9). Tokenization parity:
functions.textfn.words == text_queries2.WORDS_SQL. All log arithmetic
rides the deterministic ln (text_queries2.ln_int_sql — correctly-rounded
IEEE ops only, bit-identical across engines); every score snaps to
integer units before any summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.text_queries2 import (
    WORDS_SQL,
    ln_int_sql,
)
from page_rank_mapreduce_java_spark.functions.textfn import words

MIXTURE_BUDGET = 1_000_000


def q_text_mixture_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apportion a global token budget across sources proportionally to
    their token mass with the largest-remainder (Hamilton) method — the
    exact integer allocator for pretraining mixture weights: quotas sum
    EXACTLY to the budget, every source gets ⌊B·tok/T⌋ plus at most one
    remainder seat (ties broken by source name). Output:
    (source, n_tokens, quota).

    Scale shape: one token explode into a map-side-combined per-source
    count; the apportionment window runs over the SOURCES relation — a
    bounded small-domain attribute (the documented exception to the
    no-global-window rule, cf. skyline_parts)."""
    d = load_table(spark, "documents", sf_dir)
    tok = (
        d.select("source", F.size(words(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("n_tokens"))
    )
    t = tok.agg(F.sum("n_tokens").alias("t"))
    x = tok.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tokens",
        F.expr(f"({MIXTURE_BUDGET} * n_tokens) div t").alias("_base"),
        F.expr(f"({MIXTURE_BUDGET} * n_tokens) % t").alias("_rem"),
    )
    leftover = F.lit(MIXTURE_BUDGET) - F.sum("_base").over(Window.partitionBy())
    rk = F.row_number().over(Window.orderBy(F.desc("_rem"), F.asc("source")))
    return (
        x.withColumn("_left", leftover)
        .withColumn("_rk", rk)
        .select(
            "source",
            "n_tokens",
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            ).alias("quota"),
        )
    )


MIXTURE_QUOTA_SQL = f"""
    WITH tok AS (
      SELECT source, CAST(SUM(len({WORDS_SQL})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM tok),
    x AS (
      SELECT source, n_tokens,
             ({MIXTURE_BUDGET} * n_tokens) // t AS base,
             ({MIXTURE_BUDGET} * n_tokens) % t AS rem
      FROM tok, t
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
             {MIXTURE_BUDGET} - SUM(base) OVER () AS leftover
      FROM x
    )
    SELECT source, n_tokens,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS quota
    FROM r
"""


def q_text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram negative log-likelihood under the corpus's
    own bigram model with add-one smoothing: p(w₂|w₁) =
    (c(w₁w₂)+1) / (c(w₁·)+V), where c(w₁·) counts bigrams STARTING with
    w₁ and V is the vocabulary size — the conditional upgrade of
    text_unigram_nll (a doc can have common words in uncommon ORDER).
    Each token's −ln p = ln(c(w₁·)+V) − ln(c(w₁w₂)+1) uses the
    deterministic ln over integer arguments and snaps to micro-nats
    before the per-doc sum. Docs with < 2 tokens have no bigrams and no
    row. Output: (doc_id, n_bigrams, nll_micro).

    Scale shape: one posexplode; the bigram pairing is a lead() window
    partitioned by DOC (keyed, never global); model counts are
    vocab²-bounded and join back on the bigram key; the 1-row (V, ·)
    relation broadcasts."""
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
    v = wx.agg(F.countDistinct("w1").alias("v"))
    nll = (
        f"CAST(ROUND(({ln_int_sql('(c1 + v)', 'spark')} - "
        f"{ln_int_sql('(c12 + 1)', 'spark')}) * 1e6, 0) AS BIGINT)"
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", F.expr(nll).alias("nll_w"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("nll_w").alias("nll_micro"),
    )


def _bigram_nll_sql() -> str:
    nll = (
        f"CAST(ROUND(({ln_int_sql('(c1 + v)', 'duckdb')} - "
        f"{ln_int_sql('(c12 + 1)', 'duckdb')}) * 1e6, 0) AS BIGINT)"
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
      SELECT doc_id, w1,
             lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM wx QUALIFY w2 IS NOT NULL
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w1) AS v FROM wx),
    scored AS (
      SELECT bg.doc_id, {nll} AS nll_w
      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll_w) AS BIGINT) AS nll_micro
    FROM scored GROUP BY 1
"""


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profile per language: mean words per sentence and
    chars per word in milli-units — the structural half of a
    Flesch-style readability score (long sentences of long words rank
    hard), aggregated from exact integer counts (sentence terminators
    counted by stripping every non-.!? character; chars from the
    table's n_chars; one terminal division each). Languages whose
    script uses no .!? terminators report -1 (sentinel, NULL-free).
    Output: (lang, n_docs, n_words, n_sents, words_per_sent_milli,
    chars_per_word_milli).

    Scale shape: per-document counts are narrow JVM expressions; one
    map-side-combined aggregate to the languages relation."""
    d = load_table(spark, "documents", sf_dir)
    per = d.select(
        "lang",
        F.size(words(F.col("text"))).alias("nw"),
        F.length(F.regexp_replace(F.col("text"), "[^.!?]", "")).alias("ns"),
        F.col("n_chars").alias("nc"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nw").alias("n_words"),
        F.sum("ns").alias("n_sents"),
        F.sum("nc").alias("_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_sents",
        F.coalesce(
            F.round(
                F.lit(1e3)
                * F.col("n_words").cast("double")
                / F.nullif(F.col("n_sents"), F.lit(0)).cast("double")
            ).cast("long"),
            F.lit(-1),
        ).alias("words_per_sent_milli"),
        F.coalesce(
            F.round(
                F.lit(1e3)
                * F.col("_chars").cast("double")
                / F.nullif(F.col("n_words"), F.lit(0)).cast("double")
            ).cast("long"),
            F.lit(-1),
        ).alias("chars_per_word_milli"),
    )


READABILITY_SQL = f"""
    WITH per AS (
      SELECT lang,
             len({WORDS_SQL}) AS nw,
             length(regexp_replace(text, '[^.!?]', '', 'g')) AS ns,
             n_chars AS nc
      FROM documents
    ),
    agg AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nw) AS BIGINT) AS n_words,
             CAST(SUM(ns) AS BIGINT) AS n_sents,
             CAST(SUM(nc) AS BIGINT) AS chars
      FROM per GROUP BY 1
    )
    SELECT lang, n_docs, n_words, n_sents,
           COALESCE(CAST(ROUND(1e3 * CAST(n_words AS DOUBLE)
                    / CAST(NULLIF(n_sents, 0) AS DOUBLE), 0) AS BIGINT), -1)
             AS words_per_sent_milli,
           COALESCE(CAST(ROUND(1e3 * CAST(chars AS DOUBLE)
                    / CAST(NULLIF(n_words, 0) AS DOUBLE), 0) AS BIGINT), -1)
             AS chars_per_word_milli
    FROM agg
"""


JSD_LANG_A = "en"
JSD_LANG_B = "de"


def q_text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the word distributions of two
    language slices — the symmetric, bounded (≤ ln 2) corpus-drift
    metric a pipeline tracks between snapshots or sources. Everything
    reduces to integer ratios: with a_i, b_i the word counts and A, B
    the totals, p_i/m_i = 2·a_i·B / (a_i·B + b_i·A), so each word's
    contribution is (a_i/A)·(ln(2·a_i·B) − ln(a_i·B + b_i·A))/2 (resp.
    b-side) through the deterministic ln over integer arguments,
    snapped to micro-nats before the vocabulary-sized sum. (Integer
    bound: a_i·B stays under 2^63 while slice_tokens² does — beyond
    that the products ride DECIMAL and bin() needs a HUGEINT variant;
    documented, far past any test scale.) Output: 1 row
    (n_words_union, jsd_micro).

    Scale shape: one token explode → (lang, word) counts (map-side
    combined, vocab-sized); a full-outer word join of two vocab-sized
    relations; 1-row totals broadcast."""
    d = load_table(spark, "documents", sf_dir).filter(
        F.col("lang").isin(JSD_LANG_A, JSD_LANG_B)
    )
    wc = (
        d.select("lang", F.explode(words(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = wc.filter(F.col("lang") == JSD_LANG_A).select(
        "word", F.col("n").alias("a")
    )
    b = wc.filter(F.col("lang") == JSD_LANG_B).select(
        "word", F.col("n").alias("b")
    )
    m = (
        a.join(b, "word", "full_outer")
        .select(
            "word",
            F.coalesce("a", F.lit(0)).alias("a"),
            F.coalesce("b", F.lit(0)).alias("b"),
        )
    )
    tot = m.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    # The ln arguments materialize as THEIR OWN integer columns before
    # the Horner expansion: ln_int_sql references its argument ~20
    # times, so inlining the compound products `(a·tb + b·ta)` four
    # times built a projection whose generated Java exceeded janino's
    # method limits — Spark silently fell back to INTERPRETED
    # projection for the whole terms stage (ERROR CodeGenerator once
    # per bench pass, found in round 10). With single-attribute
    # arguments the method compiles; CollapseProject cannot re-inline
    # them because a multiply is non-cheap and each is referenced many
    # times. Values are bit-identical (same integers into the same
    # formula), so the DuckDB oracle is unchanged.
    pre = m.crossJoin(F.broadcast(tot)).select(
        "a",
        "b",
        "ta",
        "tb",
        F.expr("2 * a * tb").alias("xa"),
        F.expr("2 * b * ta").alias("xb"),
        F.expr("a * tb + b * ta").alias("s"),
    )
    term_a = (
        f"CASE WHEN a > 0 THEN CAST(ROUND(CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)"
        f" * ({ln_int_sql('xa', 'spark')} - "
        f"{ln_int_sql('s', 'spark')}) * 5e5, 0) AS BIGINT) "
        f"ELSE 0 END"
    )
    term_b = (
        f"CASE WHEN b > 0 THEN CAST(ROUND(CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)"
        f" * ({ln_int_sql('xb', 'spark')} - "
        f"{ln_int_sql('s', 'spark')}) * 5e5, 0) AS BIGINT) "
        f"ELSE 0 END"
    )
    terms = pre.select(
        F.expr(term_a).alias("tam"), F.expr(term_b).alias("tbm")
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_words_union"),
        (F.sum("tam") + F.sum("tbm")).alias("jsd_micro"),
    )


def _jsd_sql() -> str:
    term_a = (
        f"CASE WHEN a > 0 THEN CAST(ROUND(CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)"
        f" * ({ln_int_sql('(2 * a * tb)', 'duckdb')} - "
        f"{ln_int_sql('(a * tb + b * ta)', 'duckdb')}) * 5e5, 0) AS BIGINT) "
        f"ELSE 0 END"
    )
    term_b = (
        f"CASE WHEN b > 0 THEN CAST(ROUND(CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)"
        f" * ({ln_int_sql('(2 * b * ta)', 'duckdb')} - "
        f"{ln_int_sql('(a * tb + b * ta)', 'duckdb')}) * 5e5, 0) AS BIGINT) "
        f"ELSE 0 END"
    )
    return f"""
    WITH wc AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT lang, unnest({WORDS_SQL}) AS word FROM documents
        WHERE lang IN ('{JSD_LANG_A}', '{JSD_LANG_B}'))
      GROUP BY 1, 2
    ),
    m AS (
      SELECT COALESCE(x.word, y.word) AS word,
             COALESCE(x.n, 0) AS a, COALESCE(y.n, 0) AS b
      FROM (SELECT word, n FROM wc WHERE lang = '{JSD_LANG_A}') x
      FULL OUTER JOIN (SELECT word, n FROM wc WHERE lang = '{JSD_LANG_B}') y
        ON x.word = y.word
    ),
    t AS (SELECT CAST(SUM(a) AS BIGINT) AS ta,
                 CAST(SUM(b) AS BIGINT) AS tb FROM m),
    terms AS (SELECT {term_a} AS tam, {term_b} AS tbm FROM m, t)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_words_union,
           CAST(SUM(tam) + SUM(tbm) AS BIGINT) AS jsd_micro
    FROM terms
"""


# --- PMI keyword pairs --------------------------------------------------------

PMI_VOCAB_K = 50
PMI_MIN_CODOCS = 5
PMI_TOP_PAIRS = 25


def q_text_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 word pairs by pointwise mutual information over document
    co-occurrence, restricted to the top-50 document-frequency
    vocabulary — the keyword-association miner (which terms travel
    together beyond chance). PMI = ln(n_ab·N) − ln(n_a·n_b) on integer
    products through the deterministic ln (micro-nats, bit-identical
    across engines); pairs below 5 co-documents never rank. Output
    (w1, w2, n_ab, pmi_micro), w1 < w2.

    Scale shape: doc×word distinct pairs filter against the BROADCAST
    bounded vocabulary (≤50 rows) before the per-doc self-join, so
    pair volume is ≤ C(50,2) per doc — bounded fan-out, never
    vocab-quadratic over the corpus. Top-25 is TakeOrderedAndProject."""
    d = load_table(spark, "documents", sf_dir)
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("n"))
    dw = d.select(
        "doc_id", F.explode(words(F.col("text"))).alias("w")
    ).distinct()
    df_counts = dw.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # Top-k vocabulary via sort+limit (TakeOrderedAndProject — per-
    # partition top-k then a driver-side merge of k·parts rows), never
    # an unpartitioned row_number window over the full vocabulary.
    vocab = (
        df_counts.orderBy(F.desc("df"), F.asc("w"))
        .limit(PMI_VOCAB_K)
        .select("w", "df")
    )
    dv = dw.join(F.broadcast(vocab), "w")
    a = dv.select("doc_id", F.col("w").alias("w1"), F.col("df").alias("df1"))
    b = dv.select("doc_id", F.col("w").alias("w2"), F.col("df").alias("df2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).alias("n_ab"),
            F.first("df1").alias("n_a"),
            F.first("df2").alias("n_b"),
        )
        .filter(F.col("n_ab") >= PMI_MIN_CODOCS)
    )
    pmi = (
        f"CAST(ROUND(({ln_int_sql('n_ab * n', 'spark')} - "
        f"{ln_int_sql('n_a * n_b', 'spark')}) * 1e6, 0) AS BIGINT)"
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select("w1", "w2", "n_ab", F.expr(pmi).alias("pmi_micro"))
        .orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOP_PAIRS)
    )


def _pmi_sql() -> str:
    pmi = (
        f"CAST(ROUND(({ln_int_sql('n_ab * n', 'duckdb')} - "
        f"{ln_int_sql('n_a * n_b', 'duckdb')}) * 1e6, 0) AS BIGINT)"
    )
    return f"""
    WITH dw AS (
      SELECT DISTINCT doc_id, unnest({WORDS_SQL}) AS w FROM documents
    ),
    dfc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM dw GROUP BY 1),
    vocab AS (
      SELECT w, df FROM (
        SELECT *, row_number() OVER (ORDER BY df DESC, w) AS rn FROM dfc
      ) WHERE rn <= {PMI_VOCAB_K}
    ),
    dv AS (SELECT doc_id, w, df FROM dw JOIN vocab USING (w)),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2,
             CAST(COUNT(*) AS BIGINT) AS n_ab,
             ANY_VALUE(a.df) AS n_a, ANY_VALUE(b.df) AS n_b
      FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_CODOCS}
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT w1, w2, n_ab, {pmi} AS pmi_micro
    FROM pairs CROSS JOIN tot
    ORDER BY pmi_micro DESC, w1, w2 LIMIT {PMI_TOP_PAIRS}
"""


# --- sentence statistics ------------------------------------------------------


def q_text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sentence-shape profile: sentence count, mean
    sentence length in tokens and characters (milli-units) — the
    segmentation sanity check before sentence-level dedup or packing.
    Sentences split on [.!?]+ runs; whitespace-only fragments dropped.
    Output (lang, n_docs, n_sentences, tok_per_sent_milli,
    chars_per_sent_milli).

    Exactness: token/char counts accumulate as integers; the two means
    are single terminal divisions.

    Scale shape: explode per document (fan-out bounded by document
    length), one partial-agg pass to the bounded language relation."""
    d = load_table(spark, "documents", sf_dir)
    s = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.col("text"), r"[.!?]+")).alias("frag"),
    ).withColumn("sent", F.trim(F.col("frag"))).filter(F.length("sent") > 0)
    per = s.groupBy("lang").agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
        F.count(F.lit(1)).alias("n_sentences"),
        F.sum(F.size(F.split(F.col("sent"), r"\s+"))).alias("toks"),
        F.sum(F.length("sent")).alias("chars"),
    )
    mean = (
        "CAST(ROUND(CAST({num} AS DOUBLE) * 1e3"
        " / CAST(n_sentences AS DOUBLE), 0) AS BIGINT)"
    )
    return per.select(
        "lang",
        "n_docs",
        "n_sentences",
        F.expr(mean.format(num="toks")).alias("tok_per_sent_milli"),
        F.expr(mean.format(num="chars")).alias("chars_per_sent_milli"),
    )


SENTENCE_STATS_SQL = r"""
    WITH s AS (
      SELECT doc_id, lang, trim(f) AS sent
      FROM (SELECT doc_id, lang,
                   unnest(regexp_split_to_array(text, '[.!?]+')) AS f
            FROM documents)
      WHERE length(trim(f)) > 0
    ),
    per AS (
      SELECT lang,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_sentences,
             CAST(SUM(len(regexp_split_to_array(sent, '\s+'))) AS BIGINT)
               AS toks,
             CAST(SUM(length(sent)) AS BIGINT) AS chars
      FROM s GROUP BY 1
    )
    SELECT lang, n_docs, n_sentences,
           CAST(ROUND(CAST(toks AS DOUBLE) * 1e3
                / CAST(n_sentences AS DOUBLE), 0) AS BIGINT)
             AS tok_per_sent_milli,
           CAST(ROUND(CAST(chars AS DOUBLE) * 1e3
                / CAST(n_sentences AS DOUBLE), 0) AS BIGINT)
             AS chars_per_sent_milli
    FROM per
"""


# --- BPE merge-pair counts ----------------------------------------------------

BPE_TOP_PAIRS = 25


def q_text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 adjacent character pairs by corpus frequency (with
    multiplicity) — EXACTLY the statistic the first BPE training
    iteration maximizes (Sennrich et al., "Neural Machine Translation
    of Rare Words with Subword Units", ACL 2016: the merge candidate
    is argmax over adjacent-symbol pair counts). Output (pair, cnt),
    ties on pair.

    Scale shape: explode words → explode each word's length−1 adjacent
    pairs (a JVM-side transform(sequence(...)) — no Python), one
    map-side-combined count to an alphabet²-bounded relation; top-25
    is TakeOrderedAndProject."""
    d = load_table(spark, "documents", sf_dir)
    w = d.select(F.explode(words(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = w.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )


BPE_SQL = f"""
    WITH w AS (
      SELECT unnest({WORDS_SQL}) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                                   i -> substr(w, i, 2))) AS pair
      FROM w WHERE length(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY 1
    ORDER BY cnt DESC, pair LIMIT {BPE_TOP_PAIRS}
"""


# --- feature hashing ----------------------------------------------------------

FEATURE_HASH_BUCKETS = 16


def q_text_feature_hash_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick profile: tokens routed to 16 hash buckets (the
    dimensionality-free featurizer — Weinberger et al., "Feature
    Hashing for Large Scale Multitask Learning", ICML 2009), reported
    per language as bucket token counts + within-language share. A
    healthy hash shows near-uniform shares; skew means bucket
    collisions will dominate the model. Output (lang, bucket, cnt,
    share_ppm) — 5×16 bounded.

    Deterministic: the portable md5 hash family (agg_kmv_distinct's),
    so both engines route every token identically.

    Scale shape: one token explode → one map-side-combined count to
    the bounded (lang, bucket) grid; language totals broadcast back."""
    from page_rank_mapreduce_java_spark.functions.hashes import md5_long

    d = load_table(spark, "documents", sf_dir)
    t = d.select(
        "lang", F.explode(words(F.col("text"))).alias("w")
    ).select("lang", (md5_long(F.col("w")) % FEATURE_HASH_BUCKETS).alias("bucket"))
    per = t.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    share = (
        "CAST(ROUND(CAST(cnt AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0)"
        " AS BIGINT)"
    )
    return per.join(F.broadcast(tot), "lang").select(
        "lang", "bucket", "cnt", F.expr(share).alias("share_ppm")
    )


def _feature_hash_sql() -> str:
    from page_rank_mapreduce_java_spark.functions.hashes import md5_long_sql

    h = md5_long_sql("w")
    return f"""
    WITH t AS (
      SELECT lang, {h} % {FEATURE_HASH_BUCKETS} AS bucket
      FROM (SELECT lang, unnest({WORDS_SQL}) AS w FROM documents)
    ),
    per AS (
      SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM t GROUP BY 1, 2
    ),
    tot AS (SELECT lang, SUM(cnt) AS tot FROM per GROUP BY 1)
    SELECT lang, bucket, cnt,
           CAST(ROUND(CAST(cnt AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE), 0)
                AS BIGINT) AS share_ppm
    FROM per JOIN tot USING (lang)
"""


QUERIES = {
    "text_mixture_quota": q_text_mixture_quota,
    "text_bigram_nll": q_text_bigram_nll,
    "text_readability": q_text_readability,
    "text_js_divergence": q_text_js_divergence,
    "text_pmi_top_pairs": q_text_pmi_top_pairs,
    "text_sentence_stats": q_text_sentence_stats,
    "text_bpe_merge_pairs": q_text_bpe_merge_pairs,
    "text_feature_hash_profile": q_text_feature_hash_profile,
}

ORACLES = {
    "text_mixture_quota": MIXTURE_QUOTA_SQL,
    "text_bigram_nll": _bigram_nll_sql(),
    "text_readability": READABILITY_SQL,
    "text_js_divergence": _jsd_sql(),
    "text_pmi_top_pairs": _pmi_sql(),
    "text_sentence_stats": SENTENCE_STATS_SQL,
    "text_bpe_merge_pairs": BPE_SQL,
    "text_feature_hash_profile": _feature_hash_sql(),
}
