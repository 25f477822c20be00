"""Relational/analytics surface, batch 39 (round 12 growth): the
DETERMINISTIC HEAVY-HITTERS SKETCH family — the frequency counterpart
of the KMV distinct sketches (relational11-13) and the bottom-k
quantile sketches (relational38), closing the VERDICT-r11 gap ("a
deterministic heavy-hitters sketch — SpaceSaving/Misra-Gries
analogue").

Chassis: sharded top-m merge. True SpaceSaving/Misra-Gries summaries
depend on stream order (counter evictions happen in arrival order), so
their content is partition-order-dependent and violates this repo's
partition-invariance bar. The deterministic analogue keeps the same
two guarantees with a content-derived shard key instead of arrival
order:

- rows shard by ``md5(doc_id) % P`` (a fixed row→shard map — the
  deterministic stand-in for "which executor saw the row");
- each shard keeps EXACT counts of its own rows and ships only its
  top-M keys by (count DESC, key) — the per-executor summary, M
  counters per shard exactly like SpaceSaving's m counters;
- the coordinator sums surviving counts per key (``est``) and takes
  the global top-K by (est DESC, key).

Guarantees, both PROVEN ON DATA by sketch_heavy_hitters_audit rather
than assumed: (1) est(key) ≤ f(key) — every surviving count is an
exact partial count, so the estimate only ever UNDER-counts (the
mirror of SpaceSaving's overestimate bound); (2) f(key) − est(key) ≤
Σ_p cap_p where cap_p is shard p's M-th largest count — a key dropped
by shard p had at most cap_p occurrences there. Any key with
f(key) > Σ_p cap_p therefore survives somewhere — the Misra-Gries
frequent-item guarantee with n/m replaced by the measured caps.

The key domain is word BIGRAMS (collocation mining — the n-gram
heavy-hitter pass a pretraining pipeline runs for boilerplate/phrase
detection), built with the same doc-partitioned lead() pairing
text_bigram_nll certified: the synthetic corpus's unigram vocabulary
(31 words) is smaller than any useful M, which would make the sketch
vacuously exact, while its ~930 bigrams give every shard ~900 distinct
keys against M = 64 counters — the sketch genuinely evicts, so the
audit exercises the guarantee rather than an identity.

Scale shape: one doc-keyed pairing window + one shuffle to
(shard, key) exact counts with map-side combine, a PARTITIONED window
over P bounded groups, and a coordinator-sized merge (≤ P·M rows). At
1000 executors P scales with the cluster and the token facts are never
globally sorted.

Exactness: all counts are BIGINT; ordering ties break on the key
string itself, so top-M/top-K selection can never diverge between
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.hashes import md5_long, md5_long_sql
from page_rank_mapreduce_java_spark.functions.text_queries import WORDS_SQL
from page_rank_mapreduce_java_spark.functions.textfn import words

HH_SHARDS = 32  # P: deterministic "executor" count
HH_PER_SHARD = 64  # M: counters kept per shard (per-shard domain ~900)
HH_TOPK = 20  # K: reported heavy hitters
HH_LANG_TOPK = 5  # grouped form: hitters reported per language

_SHARD_SQL = f"({md5_long_sql('CAST(doc_id AS VARCHAR)')} % {HH_SHARDS})"


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per bigram instance: (lang, shard, token) — adjacent
    whitespace-token pairs of lowercased text (the words() contract,
    paired by the same doc-partitioned lead() as text_bigram_nll),
    pairs touching an empty token dropped, sharded by the document's
    60-bit hash."""
    d = load_table(spark, "documents", sf_dir)
    wx = d.select(
        "doc_id",
        "lang",
        (md5_long(F.col("doc_id").cast("string")) % HH_SHARDS).alias(
            "shard"
        ),
        F.posexplode(words(F.col("text"))).alias("pos", "w1"),
    )
    wlead = Window.partitionBy("doc_id").orderBy("pos")
    return (
        wx.withColumn("w2", F.lead("w1").over(wlead))
        .filter(
            F.col("w2").isNotNull()
            & (F.col("w1") != "")
            & (F.col("w2") != "")
        )
        .select(
            "lang",
            "shard",
            F.concat(F.col("w1"), F.lit(" "), F.col("w2")).alias("token"),
        )
    )


_TOKENS_FILTERED = f"""
    wx AS (
      SELECT doc_id, lang, {_SHARD_SQL} AS shard,
             generate_subscripts({WORDS_SQL}, 1) AS pos,
             unnest({WORDS_SQL}) AS w1
      FROM documents),
    bg AS (
      SELECT doc_id, lang, shard, w1,
             lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM wx QUALIFY w2 IS NOT NULL),
    tok AS (
      SELECT lang, shard, w1 || ' ' || w2 AS token
      FROM bg WHERE w1 <> '' AND w2 <> '')
"""


def _shard_survivors(tokens: DataFrame) -> DataFrame:
    """Per-shard exact counts, top-HH_PER_SHARD survivors by
    (count DESC, token): DataFrame[shard, token, c]."""
    sc = tokens.groupBy("shard", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("c").desc(), F.col("token")
    )
    return (
        sc.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= HH_PER_SHARD)
        .select("shard", "token", "c")
    )


_SURVIVORS_SQL = f"""
    sc AS (SELECT shard, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    surv AS (
      SELECT shard, token, c FROM (
        SELECT shard, token, c,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY c DESC, token) AS pos
        FROM sc)
      WHERE pos <= {HH_PER_SHARD})
"""


# --- sketch_heavy_hitters_topk ----------------------------------------------------


def q_sketch_heavy_hitters_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-HH_TOPK document tokens by the sharded-top-M estimate.
    Output per hitter: (token, est_count, n_shards), ordered by
    (est_count DESC, token) — est_count is the sum of the shard-exact
    counts that survived, a deterministic LOWER bound on the true
    frequency; n_shards says how many of the P shards kept the token
    (a hitter present in all P shards is structurally global, not a
    single-shard burst).

    Scale shape: (shard, token) exact counts with map-side combine →
    partitioned top-M window over P bounded groups → a ≤ P·M-row merge
    → TakeOrderedAndProject for the final top-K. The token fact table
    is never globally sorted.
    """
    est = _shard_survivors(_tokens(spark, sf_dir)).groupBy("token").agg(
        F.sum("c").cast("long").alias("est_count"),
        F.count(F.lit(1)).cast("long").alias("n_shards"),
    )
    return est.orderBy(F.col("est_count").desc(), "token").limit(HH_TOPK)


_HH_TOPK_SQL = f"""
    WITH {_TOKENS_FILTERED},
    {_SURVIVORS_SQL},
    est AS (
      SELECT token, CAST(SUM(c) AS BIGINT) AS est_count,
             CAST(COUNT(*) AS BIGINT) AS n_shards
      FROM surv GROUP BY token)
    SELECT token, est_count, n_shards
    FROM est ORDER BY est_count DESC, token LIMIT {HH_TOPK}
"""


# --- sketch_heavy_hitters_audit ---------------------------------------------------


def q_sketch_heavy_hitters_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROOF-ON-DATA of the sketch's two guarantees against the exact
    token counts. Output one row:
    (k, n_found_of_exact_topk, n_underestimated, max_underestimate,
    total_cap) where

    - n_found_of_exact_topk: how many of the EXACT top-K tokens the
      sketch's top-K also reports (set recall at K);
    - n_underestimated / max_underestimate: over the exact top-K, how
      many tokens the merged estimate undercounts and by at most how
      much (est ≤ exact always — a violation would mean the "exact
      partial counts" invariant broke);
    - total_cap: Σ_p (shard p's M-th largest count) — the theoretical
      worst-case undercount; the audit's invariant is
      max_underestimate ≤ total_cap.

    Note the guarantee's shape: a key with f > total_cap is CERTAIN to
    be reported with est > 0. The synthetic corpus's bigram counts are
    deliberately flat (max ≈ 357 vs total_cap ≈ 445 at sf0.1), so no
    key clears the certainty threshold and set recall at K is
    data-dependent — the honest regime for a frequency sketch on
    near-uniform data. The INVARIANTS (est ≤ exact, undercount ≤ cap)
    are what the oracle certifies at every SF; on a Zipfian production
    corpus the same plan reports the head exactly.

    Scale shape: the exact leg is one (token) count + top-K
    (TakeOrderedAndProject); the sketch leg reuses the sharded
    chassis; every join after aggregation is over ≤ K or ≤ P rows and
    broadcast.
    """
    tokens = _tokens(spark, sf_dir)
    surv = _shard_survivors(tokens)
    est = surv.groupBy("token").agg(F.sum("c").cast("long").alias("est"))
    est_topk = est.orderBy(F.col("est").desc(), "token").limit(HH_TOPK)

    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    exact_topk = exact.orderBy(F.col("exact").desc(), "token").limit(
        HH_TOPK
    )

    joined = exact_topk.join(F.broadcast(est), "token", "left").select(
        "token",
        "exact",
        F.coalesce("est", F.lit(0)).cast("long").alias("est"),
    )
    found = exact_topk.join(
        F.broadcast(est_topk.select("token")), "token"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_found_of_exact_topk"))
    under = joined.agg(
        F.sum((F.col("exact") > F.col("est")).cast("long"))
        .cast("long")
        .alias("n_underestimated"),
        F.max(F.col("exact") - F.col("est"))
        .cast("long")
        .alias("max_underestimate"),
    )
    # shard caps: the M-th largest count per shard (0 when a shard
    # holds fewer than M distinct tokens)
    wc = Window.partitionBy("shard").orderBy(
        F.col("c").desc(), F.col("token")
    )
    caps = (
        tokens.groupBy("shard", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("pos", F.row_number().over(wc))
        .filter(F.col("pos") == HH_PER_SHARD)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("total_cap"))
    )
    return (
        found.crossJoin(F.broadcast(under))
        .crossJoin(F.broadcast(caps))
        .select(
            F.lit(HH_TOPK).cast("long").alias("k"),
            "n_found_of_exact_topk",
            "n_underestimated",
            "max_underestimate",
            "total_cap",
        )
    )


_HH_AUDIT_SQL = f"""
    WITH {_TOKENS_FILTERED},
    {_SURVIVORS_SQL},
    est AS (SELECT token, CAST(SUM(c) AS BIGINT) AS est
            FROM surv GROUP BY token),
    est_topk AS (SELECT token FROM est
                 ORDER BY est DESC, token LIMIT {HH_TOPK}),
    exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact
              FROM tok GROUP BY token),
    exact_topk AS (SELECT token, exact FROM exact
                   ORDER BY exact DESC, token LIMIT {HH_TOPK}),
    joined AS (
      SELECT x.token, x.exact, COALESCE(e.est, 0) AS est
      FROM exact_topk x LEFT JOIN est e USING (token)),
    found AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_found_of_exact_topk
      FROM exact_topk x JOIN est_topk s USING (token)),
    under AS (
      SELECT CAST(SUM(CASE WHEN exact > est THEN 1 ELSE 0 END) AS BIGINT)
               AS n_underestimated,
             CAST(MAX(exact - est) AS BIGINT) AS max_underestimate
      FROM joined),
    caps AS (
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS total_cap FROM (
        SELECT shard, c,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY c DESC, token) AS pos
        FROM (SELECT shard, token, COUNT(*) AS c FROM tok GROUP BY 1, 2))
      WHERE pos = {HH_PER_SHARD})
    SELECT CAST({HH_TOPK} AS BIGINT) AS k,
           found.n_found_of_exact_topk,
           under.n_underestimated,
           under.max_underestimate,
           caps.total_cap
    FROM found, under, caps
"""


# --- sketch_heavy_hitters_by_lang -------------------------------------------------


def q_sketch_heavy_hitters_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The GROUPED production form: per document language, the top
    HH_LANG_TOPK tokens by the sharded-top-M estimate — the shape a
    100 TB pipeline runs per time-bucket/tenant/corpus slice. Output
    per (lang, hitter): (lang, token, est_count), ordered by
    (lang, est_count DESC, token).

    Scale shape: identical to the global form with every key extended
    by lang — (lang, shard, token) counts, a partitioned top-M window
    over lang×P bounded groups, a per-lang top-K window over
    coordinator-sized merges. No global sort of the token facts (the
    final ORDER BY sorts lang·K rows).
    """
    tokens = _tokens(spark, sf_dir)
    sc = tokens.groupBy("lang", "shard", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("lang", "shard").orderBy(
        F.col("c").desc(), F.col("token")
    )
    surv = (
        sc.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= HH_PER_SHARD)
    )
    est = surv.groupBy("lang", "token").agg(
        F.sum("c").cast("long").alias("est_count")
    )
    wk = Window.partitionBy("lang").orderBy(
        F.col("est_count").desc(), F.col("token")
    )
    return (
        est.withColumn("pos", F.row_number().over(wk))
        .filter(F.col("pos") <= HH_LANG_TOPK)
        .select("lang", "token", "est_count")
        .orderBy("lang", F.col("est_count").desc(), "token")
    )


_HH_BY_LANG_SQL = f"""
    WITH {_TOKENS_FILTERED},
    sc AS (SELECT lang, shard, token, COUNT(*) AS c
           FROM tok GROUP BY 1, 2, 3),
    surv AS (
      SELECT lang, shard, token, c FROM (
        SELECT lang, shard, token, c,
               row_number() OVER (PARTITION BY lang, shard
                                  ORDER BY c DESC, token) AS pos
        FROM sc)
      WHERE pos <= {HH_PER_SHARD}),
    est AS (SELECT lang, token, CAST(SUM(c) AS BIGINT) AS est_count
            FROM surv GROUP BY 1, 2)
    SELECT lang, token, est_count FROM (
      SELECT lang, token, est_count,
             row_number() OVER (PARTITION BY lang
                                ORDER BY est_count DESC, token) AS pos
      FROM est)
    WHERE pos <= {HH_LANG_TOPK}
    ORDER BY lang, est_count DESC, token
"""


QUERIES = {
    "sketch_heavy_hitters_topk": q_sketch_heavy_hitters_topk,
    "sketch_heavy_hitters_audit": q_sketch_heavy_hitters_audit,
    "sketch_heavy_hitters_by_lang": q_sketch_heavy_hitters_by_lang,
}

ORACLES = {
    "sketch_heavy_hitters_topk": _HH_TOPK_SQL,
    "sketch_heavy_hitters_audit": _HH_AUDIT_SQL,
    "sketch_heavy_hitters_by_lang": _HH_BY_LANG_SQL,
}
