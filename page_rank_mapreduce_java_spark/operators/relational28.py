"""Relational/analytics surface, batch 28 (round 8 growth, tenth
wave): the language-ID confusion matrix (classifier evaluation as a
query) and MinHash-LSH precision/recall against the prefix-duplicate
(template-family) ground truth (dedup-stage evaluation as a query) — the two
eval-harness operators a curation pipeline runs after every heuristic
change.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-27, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness: pure integer counting; ppm via integer `div` (truncation
parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.dedup.queries import (
    _lsh_pairs_sql,
    q_dedup_minhash_lsh_pairs,
)
from page_rank_mapreduce_java_spark.functions.text_queries import (
    ORACLES as _TEXT_ORACLES,
    q_text_lang_id,
)


# --- language-ID confusion matrix -------------------------------------------


def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram-marker language identifier
    (text_lang_id) against the labeled language — the per-class
    evaluation that a scalar accuracy hides (which languages leak into
    which). Output per (true, predicted) cell:
    (true_lang, pred_lang, n_docs).

    Exactness: pure integer counting over the certified lang-ID
    predictions.

    Scale shape: the lang-ID scan (narrow per-row JVM expressions) +
    one bounded (k² language cells) aggregate with map-side partials;
    the label join keys on doc_id (high cardinality).
    """
    pred = q_text_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    truth = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    return (
        pred.join(truth, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


LANGID_CONFUSION_SQL = f"""
    WITH pred AS ({_TEXT_ORACLES["text_lang_id"]})
    SELECT d.lang AS true_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY 1, 2
"""


# --- MinHash-LSH precision/recall vs prefix-duplicate ground truth ---------------


def q_dedup_lsh_pr_vs_prefix_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate pairs against the
    PREFIX-DUPLICATE ground truth: two docs sharing the same 80-char
    lowercased head are one boilerplate/template family (the signal
    text_prefix_dup_rate measures per doc) — a deterministic truth set
    that, unlike full-content equality, actually occurs in a
    near-dup-structured corpus. Recall = how much of the template mass
    LSH catches; precision = what share of LSH candidates are
    same-family. One row: (n_lsh_pairs, n_truth_pairs, true_positives,
    precision_ppm, recall_ppm).

    Exactness: pure integer counting; the truth-pair total is
    Σ g·(g−1) div 2 over prefix-digest group sizes — computed as an
    aggregate, the pair set itself is NEVER materialized.

    Scale shape: the certified LSH pair chassis + one digest-keyed
    count; true positives come from joining the (collision-bounded)
    LSH pair list to the doc→digest map twice on doc ids — no pair×
    pair work anywhere.
    """
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.md5(F.substring(F.lower("text"), 1, 80)).alias("digest"),
    )
    gd = F.col("g").cast("decimal(38,0)")
    exact = (
        d.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("g"))
        .agg(F.sum(gd * (gd - 1)).alias("_ex2"))
        .select(
            F.expr("CAST(_ex2 div 2 AS BIGINT)").alias("n_truth_pairs")
        )
    )
    lsh = q_dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    tagged = (
        lsh.join(d.withColumnsRenamed({"doc_id": "doc_a", "digest": "da"}), "doc_a")
        .join(d.withColumnsRenamed({"doc_id": "doc_b", "digest": "db"}), "doc_b")
    )
    counts = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_lsh_pairs"),
        F.sum((F.col("da") == F.col("db")).cast("int"))
        .cast("long")
        .alias("true_positives"),
    )
    return counts.crossJoin(F.broadcast(exact)).select(
        "n_lsh_pairs",
        "n_truth_pairs",
        "true_positives",
        F.expr(
            "CAST(1000000 * true_positives div n_lsh_pairs AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(1000000 * true_positives div n_truth_pairs AS BIGINT)"
        ).alias("recall_ppm"),
    )


MINHASH_PR_SQL = f"""
    WITH lsh AS ({_lsh_pairs_sql()}),
    dg AS (SELECT doc_id, md5(substr(lower(text), 1, 80)) AS digest
          FROM documents),
    exact AS (
      SELECT CAST(SUM(CAST(g AS HUGEINT) * (g - 1)) // 2 AS BIGINT)
               AS n_truth_pairs
      FROM (SELECT COUNT(*) AS g FROM dg GROUP BY digest)),
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh_pairs,
             CAST(SUM(CASE WHEN a.digest = b.digest THEN 1 ELSE 0 END)
                  AS BIGINT) AS true_positives
      FROM lsh JOIN dg a ON lsh.doc_a = a.doc_id
               JOIN dg b ON lsh.doc_b = b.doc_id)
    SELECT n_lsh_pairs, n_truth_pairs, true_positives,
           CAST(1000000 * true_positives // n_lsh_pairs AS BIGINT)
             AS precision_ppm,
           CAST(1000000 * true_positives // n_truth_pairs AS BIGINT)
             AS recall_ppm
    FROM counts, exact
"""


QUERIES = {
    "text_langid_confusion": q_text_langid_confusion,
    "dedup_lsh_pr_vs_prefix_dups": q_dedup_lsh_pr_vs_prefix_dups,
}

ORACLES = {
    "text_langid_confusion": LANGID_CONFUSION_SQL,
    "dedup_lsh_pr_vs_prefix_dups": MINHASH_PR_SQL,
}
