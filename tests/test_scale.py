"""Scale-shaped regression tests: the reference's EMR workload, skew
utilities, and partitioning ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.graph.generators import chain_edges
from page_rank_mapreduce_java_spark.graph.ops import secondary_sort, top_k_per_group
from page_rank_mapreduce_java_spark.graph.pagerank import pagerank
from page_rank_mapreduce_java_spark.plans.skew import (
    salted_aggregate,
    salted_join,
    with_salt,
)


def test_emr_scale_workload(spark):
    """The reference's full production run (Makefile aws.k=1000,
    aws.iterations=10; 1 master + 5 core m6a.xlarge on EMR) — here on one
    local session. Mass conservation to 1e-9 after 10 supersteps."""
    res = pagerank(chain_edges(spark, 1000), num_iterations=10)
    assert res.num_nodes == 1_000_001
    mass = res.ranks.agg(F.sum("rank")).first()[0]
    assert mass == pytest.approx(1.0, abs=1e-9)
    # sink node 0 (every chain tail's target) accumulates the most rank
    top = res.ranks.orderBy(F.desc("rank")).first()
    assert top["id"] == 0


def test_reliable_checkpoint_requires_dir(spark):
    # Must run before any test that sets the session checkpoint dir
    # (a set dir cannot be unset on a live SparkContext).
    if spark.sparkContext.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            pagerank(chain_edges(spark, 3), num_iterations=2, reliable_checkpoint_every=1)


def test_emr_workload_with_reliable_checkpoints(spark, tmp_path):
    """The same k=1000 × 10-iteration production workload with the
    fault-tolerant lineage cut: checkpoint() to a reliable dir every 5
    supersteps (the cadence a 1000-executor run needs — localCheckpoint
    blocks die with any executor). Results must be identical to the
    localCheckpoint run; timing delta recorded in PERF.md."""
    import time

    sc = spark.sparkContext
    prev_dir = sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        t0 = time.time()
        res = pagerank(
            chain_edges(spark, 1000), num_iterations=10, reliable_checkpoint_every=5
        )
        elapsed = time.time() - t0
        assert res.num_nodes == 1_000_001
        mass = res.ranks.agg(F.sum("rank")).first()[0]
        assert mass == pytest.approx(1.0, abs=1e-9)
        base = pagerank(chain_edges(spark, 1000), num_iterations=10)
        diff = (
            res.ranks.alias("a")
            .join(base.ranks.alias("b"), "id")
            .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
            .first()["d"]
        )
        assert diff == pytest.approx(0.0, abs=1e-15)
        assert elapsed < 300
    finally:
        if prev_dir is not None:
            sc.setCheckpointDir(prev_dir)


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 100).alias("v")
    )
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        r.k: r.s
        for r in salted_aggregate(df, "k", F.sum("v"), "s", buckets=8).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.range(5_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = big.join(small, "k").agg(F.sum(F.col("payload") * F.col("w"))).first()[0]
    salted = salted_join(big, small, "k", buckets=8).agg(
        F.sum(F.col("payload") * F.col("w"))
    ).first()[0]
    assert plain == salted
    # retry-deterministic variant: salt from a stable unique column
    salted2 = salted_join(big, small, "k", buckets=8, salt_on="payload").agg(
        F.sum(F.col("payload") * F.col("w"))
    ).first()[0]
    assert plain == salted2


def test_salted_aggregate_min_merge(spark):
    df = spark.range(1000).select((F.col("id") % 5).alias("k"), (F.col("id") % 37).alias("v"))
    plain = {r.k: r.m for r in df.groupBy("k").agg(F.min("v").alias("m")).collect()}
    salted = {
        r.k: r.m
        for r in salted_aggregate(df, "k", F.min("v"), "m", buckets=4, merge="min").collect()
    }
    assert plain == salted


def test_secondary_sort_order_within_partitions(spark):
    df = spark.createDataFrame(
        [(1, 3), (1, 1), (2, 9), (1, 2), (2, 4)], "pk LONG, sk LONG"
    )
    out = secondary_sort(df, "pk", "sk", num_partitions=2)
    # within each partition, rows are (pk, sk)-sorted
    def check(it):
        rows = list(it)
        assert rows == sorted(rows, key=lambda r: (r.pk, r.sk))
        return rows

    for part in out.rdd.glom().collect():
        assert part == sorted(part, key=lambda r: (r.pk, r.sk))


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 9), ("a", 1), ("b", 7), ("b", 2)], "g STRING, v LONG"
    )
    out = top_k_per_group(df, "g", "v", k=2).collect()
    got = sorted((r.g, r.v) for r in out)
    assert got == [("a", 5), ("a", 9), ("b", 2), ("b", 7)]
