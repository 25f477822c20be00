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


rows_with_groups = st.lists(
    st.tuples(
        st.integers(0, 2),          # low-cardinality partition key
        st.integers(-50, 50),       # order value (negatives + heavy ties)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_with_groups)
def test_scalable_rank_family_matches_windows_on_arbitrary_data(spark, rows):
    """global_cume_dist / global_percent_rank must equal the naive
    single-task window forms on any distribution — negatives, all-ties,
    single-row partitions included."""
    from pyspark.sql.window import Window

    from page_rank_mapreduce_java_spark.operators.ranking import (
        global_cume_dist,
        global_percent_rank,
    )

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id LONG, g LONG, v LONG"
    )
    w = Window.partitionBy("g").orderBy("v")
    want_cd = {
        (r.id, round(r.cd, 9))
        for r in df.withColumn("cd", F.cume_dist().over(w)).collect()
    }
    got_cd = {
        (r.id, round(r.cd, 9))
        for r in global_cume_dist(df, "g", "v", [F.asc("id")], out_col="cd").collect()
    }
    assert got_cd == want_cd
    want_pr = {
        (r.id, round(r.pr, 9))
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    got_pr = {
        (r.id, round(r.pr, 9))
        for r in global_percent_rank(df, "g", "v", [F.asc("id")], out_col="pr").collect()
    }
    assert got_pr == want_pr


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_with_groups, radius=st.integers(1, 30))
def test_banded_range_count_matches_window_on_arbitrary_data(spark, rows, radius):
    from pyspark.sql.window import Window

    from page_rank_mapreduce_java_spark.operators.ranking import banded_range_count

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id LONG, g LONG, v LONG"
    )
    w = Window.partitionBy("g").orderBy("v").rangeBetween(-radius, radius)
    want = {
        (r.id, r.n) for r in df.withColumn("n", F.count(F.lit(1)).over(w)).collect()
    }
    got = {
        (r.id, r.n)
        for r in banded_range_count(
            df, ["g"], F.col("v"), radius=radius, out_col="n", chunk_radii=2
        ).collect()
    }
    assert got == want


intervals = st.lists(
    st.tuples(
        st.integers(0, 1),            # key
        st.integers(-40, 40),         # start
        st.integers(0, 50),           # span (0 -> empty, filtered out)
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=intervals, chunk=st.integers(2, 12))
def test_interval_overlap_matches_naive_join(spark, rows, chunk):
    """Chunked interval self-overlap must equal the naive quadratic join
    on arbitrary intervals — negative starts, spans far exceeding the
    chunk width (multi-chunk replication + arithmetic dedup), empties."""
    from page_rank_mapreduce_java_spark.operators.intervals import (
        interval_self_overlap_pairs,
    )

    df = spark.createDataFrame(
        [(i, k, s, s + span) for i, (k, s, span) in enumerate(rows)],
        "rid LONG, k LONG, s LONG, e LONG",
    )
    got = {
        (r.k, r.a_rid, r.b_rid, r.overlap_len)
        for r in interval_self_overlap_pairs(
            df, ["k"], "rid", F.col("s"), F.col("e"), chunk_width=chunk
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.rid") < F.col("b.rid"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e"))
            & (F.col("a.e") > F.col("a.s"))
            & (F.col("b.e") > F.col("b.s")),
        )
        .select(
            F.col("a.k").alias("k"),
            F.col("a.rid").alias("a_rid"),
            F.col("b.rid").alias("b_rid"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("ol"),
        )
        .collect()
    )
    want = {(r.k, r.a_rid, r.b_rid, r.ol) for r in naive}
    assert got == want


points = st.lists(
    st.tuples(st.integers(0, 200), st.integers(1, 10), st.integers(50, 150)),
    min_size=1,
    max_size=40,
).map(lambda ps: sorted({(i, s, c) for i, s, c in ps}))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=points)
def test_skyline_plan_matches_dominance_on_arbitrary_points(spark, pts):
    """relational8's per-size-min + strictly-larger running-min skyline
    == the quadratic NOT-EXISTS dominance definition, on arbitrary
    (id, size, price) sets including duplicates and single-size data."""
    from pyspark.sql.window import Window

    p = spark.createDataFrame(pts, "p_partkey LONG, p_size INT, price_c LONG")
    persize = p.groupBy("p_size").agg(F.min("price_c").alias("_minp"))
    w = Window.orderBy(F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    fr = persize.withColumn("_cm", F.min("_minp").over(w))
    got = sorted(
        map(
            tuple,
            p.join(F.broadcast(fr), "p_size")
            .filter(
                (F.col("price_c") == F.col("_minp"))
                & (F.col("_cm").isNull() | (F.col("price_c") < F.col("_cm")))
            )
            .select("p_partkey", "p_size", "price_c")
            .collect(),
        )
    )
    want = sorted(
        (i, s, c)
        for i, s, c in pts
        if not any(
            s2 >= s and c2 <= c and (s2 > s or c2 < c) for _, s2, c2 in pts
        )
    )
    assert got == want


grouped_rows = st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(0, 500), st.integers(0, 50)),
    min_size=1,
    max_size=60,
).map(lambda rs: [(g, i, v) for i, (g, _, v) in enumerate(rs)])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=grouped_rows, k=st.integers(1, 8), parts=st.integers(1, 9))
def test_grouped_topk_matches_window_on_arbitrary_data(spark, rows, k, parts):
    """ranking.grouped_topk_low_cardinality == naive per-group window
    for arbitrary data, k, and input partitioning."""
    from pyspark.sql.window import Window

    from page_rank_mapreduce_java_spark.operators.ranking import (
        grouped_topk_low_cardinality,
    )

    df = spark.createDataFrame(rows, "g STRING, id LONG, v LONG").repartition(
        parts
    )
    order = [F.asc("v"), F.asc("id")]
    got = sorted(
        map(
            tuple,
            grouped_topk_low_cardinality(df, ["g"], order, k).collect(),
        )
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        map(
            tuple,
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
            .collect(),
        )
    )
    assert got == want
