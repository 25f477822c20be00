"""Property-based tests (hypothesis): engine invariants on arbitrary
inputs, not just fixtures."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.functions.hashes import md5_long, minhash_slot
from page_rank_mapreduce_java_spark.functions.textfn import word_shingles, words
from page_rank_mapreduce_java_spark.graph.pagerank import pagerank
from tests.test_pagerank import python_pagerank

edge_lists = st.lists(
    st.tuples(st.integers(1, 12), st.integers(1, 12)),
    min_size=1,
    max_size=30,
).map(lambda e: sorted(set(e)))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists, iters=st.integers(1, 4))
def test_pagerank_matches_oracle_on_arbitrary_digraphs(spark, edges, iters):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    res = pagerank(df, num_iterations=iters)
    got = {r.id: r.rank for r in res.ranks.collect()}
    exp = python_pagerank(edges, iters)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-10)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    text=st.text(
        alphabet=st.sampled_from("ab cd"), min_size=1, max_size=60
    ).filter(lambda t: t.strip())
)
def test_identical_texts_share_minhash_signature(spark, text):
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id LONG, text STRING")
    sh = df.select("doc_id", words(F.col("text")).alias("w")).select(
        "doc_id", F.explode(word_shingles("w", n=1)).alias("s")
    )
    base = md5_long(F.col("s"))
    sig = sh.groupBy("doc_id").agg(
        *[F.min(minhash_slot(base, i)).alias(f"mh{i}") for i in range(4)]
    )
    rows = {r.doc_id: tuple(r)[1:] for r in sig.collect()}
    if rows:  # all-space texts produce no shingles
        assert rows.get(1) == rows.get(2)
