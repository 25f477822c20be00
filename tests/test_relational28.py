"""Batch-28 additions: lang-ID confusion matrix, LSH precision/recall
vs the prefix-duplicate truth. Value-level correctness is oracle-gated
(tools/check_oracle.py at sf0.001 + sf0.01 under shuffle.partitions
3/17/32); these tests pin structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational28 import (
    q_dedup_lsh_pr_vs_prefix_dups,
    q_text_langid_confusion,
)


def test_confusion_matrix_accounts_for_every_doc(spark, sf_dir):
    rows = q_text_langid_confusion(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows) == n_docs
    langs = {
        r.lang
        for r in load_table(spark, "documents", sf_dir)
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r.true_lang for r in rows} <= langs
    # diagonal mass must match the registered accuracy signal
    from page_rank_mapreduce_java_spark.functions.text_queries import (
        q_text_lang_id,
    )

    correct = (
        q_text_lang_id(spark, sf_dir).agg(F.sum("matches_label")).head()[0]
    )
    diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    assert diag == correct


def test_lsh_pr_bounds_and_identities(spark, sf_dir):
    r = q_dedup_lsh_pr_vs_prefix_dups(spark, sf_dir).head()
    assert r.true_positives <= r.n_lsh_pairs
    assert r.true_positives <= r.n_truth_pairs
    assert r.n_truth_pairs > 0  # the fixture HAS template families
    assert r.precision_ppm == 1_000_000 * r.true_positives // r.n_lsh_pairs
    assert r.recall_ppm == 1_000_000 * r.true_positives // r.n_truth_pairs
