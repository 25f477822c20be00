"""Library-level tests for dedup + similarity (oracle parity is covered by
tools/check_oracle.py; these pin semantic properties)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.dedup.queries import (
    q_dedup_exact,
    q_dedup_minhash_signatures,
    q_dedup_minhash_lsh_pairs,
)
from page_rank_mapreduce_java_spark.functions.vectors import cosine
from page_rank_mapreduce_java_spark.similarity.ann import brute_force_topk, lsh_buckets


def test_exact_dedup_flags_identical_texts(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id LONG, text STRING"
    )
    df.createOrReplaceTempView("documents")  # not used; direct api below
    from pyspark.sql.window import Window

    w = Window.partitionBy("digest").orderBy("doc_id")
    out = (
        df.select("doc_id", F.md5("text").alias("digest"))
        .withColumn("keeper", F.min("doc_id").over(w))
        .withColumn("is_dup", (F.row_number().over(w) > 1).cast("long"))
        .collect()
    )
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].is_dup == 0 and by_id[2].is_dup == 1 and by_id[2].keeper == 1
    assert by_id[3].is_dup == 0


def test_minhash_identical_docs_share_all_bands(spark, sf_dir):
    sig = q_dedup_minhash_signatures(spark, sf_dir)
    cols = sig.columns
    assert cols[0] == "doc_id" and len(cols) == 17
    rows = sig.limit(5).collect()
    assert all(0 <= r[f"mh{i}"] < 2_147_483_647 for r in rows for i in range(16))


def test_short_docs_still_get_shingles(spark):
    """<3-word docs fall back to a whole-text shingle, so identical short
    docs can still be flagged as duplicates."""
    from page_rank_mapreduce_java_spark.functions.textfn import word_shingles, words

    df = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "")], "doc_id LONG, text STRING"
    )
    sh = df.select("doc_id", words(F.col("text")).alias("w")).select(
        "doc_id", word_shingles("w").alias("sh")
    )
    got = {r.doc_id: list(r.sh) for r in sh.collect()}
    assert got[1] == ["hi there"] and got[2] == ["hi there"]


def test_lsh_pairs_are_ordered_and_distinct(spark, sf_dir):
    pairs = q_dedup_minhash_lsh_pairs(spark, sf_dir).collect()
    seen = set()
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))


def test_cosine_column_matches_numpy(spark):
    import numpy as np

    a = [0.5, -1.0, 2.0, 0.0]
    b = [1.0, 0.5, -0.5, 3.0]
    got = (
        spark.createDataFrame([(a, b)], "a ARRAY<FLOAT>, b ARRAY<FLOAT>")
        .select(cosine("a", "b").alias("c"))
        .first()["c"]
    )
    # engine semantics: float32 storage, float64 math
    af = np.array(a, dtype=np.float32).astype(np.float64)
    bf = np.array(b, dtype=np.float32).astype(np.float64)
    exp = float(np.dot(af, bf) / (np.linalg.norm(af) * np.linalg.norm(bf)))
    assert got == pytest.approx(exp, rel=1e-9)


def test_brute_force_topk_self_neighbor_excluded(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table

    e = load_table(spark, "embeddings", sf_dir)
    res = brute_force_topk(e, e.filter(F.col("vec_id") < 3), k=5).collect()
    assert all(r.query_id != r.neighbor_id for r in res)
    per_q = {}
    for r in res:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rows in per_q.items():
        assert len(rows) == 5
        cos_sorted = sorted((x.cos for x in rows), reverse=True)
        assert [x.cos for x in sorted(rows, key=lambda x: x.rn)] == cos_sorted


def test_lsh_bucket_range(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table

    e = load_table(spark, "embeddings", sf_dir)
    rows = lsh_buckets(e, n_planes=8).collect()
    assert all(0 <= r.bucket < 256 for r in rows)
    assert len({r.bucket for r in rows}) > 16  # buckets actually spread


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """Honesty metric for the approximate path: IVF@n_probe=4/16 must
    recover a solid majority of the exact cosine top-10 — and more probes
    must never lose recall. (Exact thresholds are generous floors: the
    point is catching a broken quantizer/probe join, not tuning recall.)"""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.similarity.ann import brute_force_topk, ivf_topk

    e = load_table(spark, "embeddings", sf_dir)
    queries = e.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(e, queries, k=10).collect()
    }

    def recall(n_probe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(e, queries, k=10, n_probe=n_probe, n_centroids=16).collect()
        }
        return len(got & exact) / len(exact)

    r4 = recall(4)
    assert r4 >= 0.6, f"IVF recall@n_probe=4 collapsed: {r4:.2f}"
    r16 = recall(16)  # probing every cell = exhaustive ⇒ exact
    assert r16 == 1.0, f"full-probe IVF must equal brute force, got {r16:.2f}"
    assert r16 >= r4


def test_blocked_jaccard_band_bounds_pathological_corpus(spark):
    """VERDICT r2 wrong #4: with block key (lang, len-bucket) only, a
    single-lang corpus of equal-length docs pairs quadratically —
    n=120 distinct docs would emit 7140 candidate pairs. The MinHash-band
    component must spread distinct content across buckets so candidate
    volume tracks near-dup volume: the 3 planted duplicate pairs survive
    (identical text ⇒ identical band), while distinct-content collisions
    stay near zero."""
    import random

    from page_rank_mapreduce_java_spark.dedup.queries import blocked_jaccard_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for doc_id in range(120):
        text = " ".join(rng.choice(vocab) for _ in range(30))
        rows.append((doc_id, "en", 180, text))
    # Planted exact dups: same text as docs 0..2.
    for k in range(3):
        rows.append((1000 + k, "en", 180, rows[k][3]))
    d = spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, n_chars LONG, text STRING"
    )
    pairs = blocked_jaccard_pairs(d).collect()
    n_pairs = len(pairs)
    exact = sum(1 for r in pairs if r["jac"] == 1.0)
    assert exact == 3, f"planted duplicate pairs lost: {exact}/3"
    # Bound: all pairs must come from band collisions, not the block
    # cross-product. Allow a small constant of chance collisions.
    assert n_pairs <= 3 + 10, (
        f"{n_pairs} candidate pairs on a 123-doc pathological corpus — "
        f"the band component is not bounding the block"
    )
