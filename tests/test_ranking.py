"""Two-pass global ranking (operators/ranking.py) vs the single-task
window built-ins it replaces — identical results, scalable plan."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.operators.ranking import (
    banded_range_count,
    global_cume_dist,
    global_dense_rank,
    global_ntile,
    global_row_number,
)


def _sample(spark, n=997):
    # Collision-heavy value column so dense_rank/ntile tie paths are hit;
    # unique id for the total-order tiebreak.
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )


def test_global_row_number_matches_window(spark):
    df = _sample(spark)
    order = [F.desc("v"), F.asc("id")]
    got = {
        (r["id"], r["rn"])
        for r in global_row_number(df, order, num_partitions=7).collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["id"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


def test_global_ntile_matches_window(spark):
    # 997 % 4 == 1: exercises the uneven-bucket arithmetic.
    df = _sample(spark)
    order = [F.desc("v"), F.asc("id")]
    got = {(r["id"], r["bucket"]) for r in global_ntile(df, 4, order).collect()}
    w = Window.orderBy(*order)
    want = {
        (r["id"], r["q"])
        for r in df.withColumn("q", F.ntile(4).over(w).cast("long")).collect()
    }
    assert got == want


def test_global_dense_rank_matches_window(spark):
    df = _sample(spark)
    got = {
        (r["id"], r["rnk"])
        for r in global_dense_rank(df, F.col("v"), "_v").collect()
    }
    w = Window.orderBy(F.desc("v"))
    want = {
        (r["id"], r["rnk"])
        for r in df.withColumn("rnk", F.dense_rank().over(w).cast("long")).collect()
    }
    assert got == want


def test_global_cume_dist_matches_window(spark):
    # Two low-cardinality partitions with heavy value ties.
    df = _sample(spark).withColumn("g", (F.col("id") % 2).cast("string"))
    got = {
        (r["id"], round(r["cd"], 9))
        for r in global_cume_dist(df, "g", "v", [F.asc("id")]).collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    want = {
        (r["id"], round(r["cd"], 9))
        for r in df.withColumn("cd", F.cume_dist().over(w)).collect()
    }
    assert got == want


def test_banded_range_count_matches_window(spark):
    # Radius comparable to the value spread so frames straddle chunk
    # edges; chunk_radii=2 forces many boundary replications.
    df = _sample(spark).withColumn("g", (F.col("id") % 2).cast("string"))
    got = {
        (r["id"], r["n"])
        for r in banded_range_count(
            df, ["g"], F.col("v"), radius=7, out_col="n", chunk_radii=2
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v").rangeBetween(-7, 7)
    want = {
        (r["id"], r["n"])
        for r in df.withColumn("n", F.count(F.lit(1)).over(w)).collect()
    }
    assert got == want


def test_ranking_plan_has_single_full_data_exchange(spark):
    """The ranked output must not funnel the data through one task, and
    both chassis branches must read ONE pinned partitioning: the
    persist() caches the range-partitioned relation, so the data branch
    and the counts branch both scan the SAME InMemoryRelation, whose
    child contains the plan's ONLY range exchange (one boundary
    sampling — no independent re-sampling, no silent rank corruption).
    """
    from page_rank_mapreduce_java_spark.plans.explain import formatted_plan

    import re

    df = global_row_number(_sample(spark), [F.asc("v"), F.asc("id")])
    plan = formatted_plan(df)
    # Node details print once per unique node id: a shared cached child
    # yields exactly ONE rangepartitioning detail. Two independent
    # exchanges (the pre-r8 hazard) would print two.
    assert plan.lower().count("rangepartitioning") == 1, plan
    assert "InMemoryRelation" in plan
    # Both branches must reference the same cached subtree: every
    # InMemoryRelation rendering is followed by the same child node id.
    kids = re.findall(r"InMemoryRelation \(\d+\)\n\s*[:+ -]*(\w+) \((\d+)\)", plan)
    assert len({k[1] for k in kids}) == 1, kids
    # The only Window node is the offsets prefix-sum over per-partition
    # counts (one row per partition), never the full input.
    assert len(re.findall(r"(?m)^\(\d+\) Window", plan)) <= 1


def test_global_percent_rank_matches_window(spark):
    from page_rank_mapreduce_java_spark.operators.ranking import global_percent_rank

    df = _sample(spark).withColumn("g", (F.col("id") % 2).cast("string"))
    got = {
        (r["id"], round(r["pr"], 9))
        for r in global_percent_rank(df, "g", "v", [F.asc("id")]).collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    want = {
        (r["id"], round(r["pr"], 9))
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert got == want
