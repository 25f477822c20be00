"""Property-based tests for the round-5 operators: k-truss against a
pure-Python peel, count-min/Bloom structural equality against their
Python twins, and hash-walk replay."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from page_rank_mapreduce_java_spark.graph.motifs import ktruss

edge_lists = st.lists(
    st.tuples(st.integers(1, 10), st.integers(1, 10)),
    min_size=1,
    max_size=25,
).map(lambda e: sorted({(min(a, b), max(a, b)) for a, b in e if a != b}))


def _python_ktruss(edges: list[tuple[int, int]], k: int, rounds: int):
    """Reference peel: per round compute each edge's triangle support in
    the surviving edge set, drop edges with support < k-2."""
    cur = set(edges)
    sup: dict[tuple[int, int], int] = {}
    for _ in range(rounds):
        adj: dict[int, set[int]] = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b])
            for a, b in cur
        }
        cur = {e for e in cur if sup[e] >= k - 2}
    return {e: sup[e] for e in cur}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists, k=st.integers(3, 4))
def test_ktruss_matches_python_peel(spark, edges, k):
    if not edges:
        return
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {(r.src, r.dst): r.support for r in ktruss(df, k=k, rounds=4).collect()}
    exp = _python_ktruss(edges, k, rounds=4)
    assert got == exp


interactions = st.lists(
    st.tuples(st.integers(1, 5), st.integers(1, 40)),  # (user, item)
    min_size=1,
    max_size=60,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=interactions)
def test_cms_structure_matches_python_twin(spark, rows):
    """The Spark-built count-min counters must equal a Python-built CMS
    bit for bit (same md5 slot function) — construction, not just the
    one-sided-error property."""
    from pyspark.sql import functions as F

    from page_rank_mapreduce_java_spark.functions.hashes import md5_long
    from page_rank_mapreduce_java_spark.operators.relational11 import (
        CMS_DEPTH,
        CMS_WIDTH,
    )

    df = spark.createDataFrame(rows, "user LONG, k LONG")
    built = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (md5_long(F.concat_ws(":", F.lit(i), F.col("k"))) % CMS_WIDTH).alias(
                            "slot"
                        ),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("h")
    ).groupBy("h.i", "h.slot").count()
    got = {(r.i, r.slot): r["count"] for r in built.collect()}

    exp: dict[tuple[int, int], int] = {}
    for _, key in rows:
        for i in range(CMS_DEPTH):
            h = hashlib.md5(f"{i}:{key}".encode()).hexdigest()
            slot = int(h[:15], 16) % CMS_WIDTH
            exp[(i, slot)] = exp.get((i, slot), 0) + 1
    assert got == exp


member_probe_sets = st.tuples(
    st.sets(st.integers(1, 200), min_size=1, max_size=30),
    st.sets(st.integers(1, 200), min_size=1, max_size=30),
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(sets_=member_probe_sets)
def test_bloom_bits_match_python_twin_and_never_false_negative(spark, sets_):
    """The Spark-built Bloom bit set must equal the Python twin exactly,
    and every true member among the probes must hit."""
    from pyspark.sql import functions as F

    from page_rank_mapreduce_java_spark.functions.hashes import md5_long
    from page_rank_mapreduce_java_spark.operators.relational11 import (
        BLOOM_BITS,
        BLOOM_HASHES,
    )

    members, probes = sets_
    mdf = spark.createDataFrame([(k,) for k in members], "k LONG")
    bits_df = mdf.select(
        F.explode(
            F.array(
                *[
                    (md5_long(F.concat_ws(":", F.lit(j), F.col("k"))) % BLOOM_BITS)
                    for j in range(BLOOM_HASHES)
                ]
            )
        ).alias("bit")
    ).distinct()
    got_bits = {r.bit for r in bits_df.collect()}
    exp_bits = {
        int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:15], 16) % BLOOM_BITS
        for k in members
        for j in range(BLOOM_HASHES)
    }
    assert got_bits == exp_bits
    # no false negatives: every true member's bits are all present
    for k in probes & members:
        pk = {
            int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:15], 16) % BLOOM_BITS
            for j in range(BLOOM_HASHES)
        }
        assert pk <= got_bits


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
def test_hash_walks_replay_in_python(spark, edges):
    """A pure-Python replay of the deterministic walk (same md5 choice
    over the dst-sorted adjacency) must reproduce the Spark trace."""
    if not edges:
        return
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from page_rank_mapreduce_java_spark.functions.hashes import md5_long

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    und = df.unionByName(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    outdeg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("src").orderBy("dst")
    ranked = und.withColumn("idx", F.row_number().over(w) - 1)
    state = outdeg.select(F.col("id").alias("walk_id"), F.col("id").alias("node"))
    for t in range(1, 3):
        choice = md5_long(
            F.concat_ws(":", F.col("walk_id"), F.lit(t), F.col("node"))
        ) % F.col("n")
        st_ = state.join(outdeg, state.node == outdeg.id).withColumn("c", choice)
        state = st_.join(
            ranked, (st_.node == ranked.src) & (st_.c == ranked.idx)
        ).select("walk_id", F.col("dst").alias("node"))
    got = {r.walk_id: r.node for r in state.collect()}

    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for v in adj:
        adj[v] = sorted(adj[v])
    exp = {}
    for start in adj:
        node = start
        for t in range(1, 3):
            h = hashlib.md5(f"{start}:{t}:{node}".encode()).hexdigest()
            node = adj[node][int(h[:15], 16) % len(adj[node])]
        exp[start] = node
    assert got == exp
