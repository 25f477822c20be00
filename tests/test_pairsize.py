"""plans/pairsize.py — the shared volume-sized pair-exchange chassis
(round 8: the r7 sf10-OOM fix lifted out of item_item_topk and applied
to every Σ-bound pair stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.plans import pairsize
from page_rank_mapreduce_java_spark.plans.pairsize import (
    pair_exchange_partitions,
    sum_sq_group_bound,
    volume_repartition_pairs,
)


def _groups(spark, sizes: dict[str, int]):
    rows = [(k, i) for k, n in sizes.items() for i in range(n)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_sum_sq_bound_exact(spark):
    df = _groups(spark, {"a": 3, "b": 2, "c": 1})
    assert sum_sq_group_bound(df, ["k"]) == 9 + 4 + 1


def test_sum_sq_bound_cap_drops_oversized_groups(spark):
    # cap mirrors the basket generators: groups ABOVE the cap are
    # dropped before pairing, not truncated
    df = _groups(spark, {"a": 5, "b": 2})
    assert sum_sq_group_bound(df, ["k"], size_cap=4) == 4


def test_sum_sq_bound_empty(spark):
    df = _groups(spark, {"a": 1}).filter(F.col("k") == "zzz")
    assert sum_sq_group_bound(df, ["k"]) == 0


def test_bound_memoized_per_cache_key(spark):
    df = _groups(spark, {"a": 2})
    key = "test_pairsize_memo"
    pairsize._BOUND_CACHE.pop(
        (spark.sparkContext.applicationId, key), None
    )
    assert sum_sq_group_bound(df, ["k"], cache_key=key) == 4
    # second call must come from the memo, not a job: poison the input
    poisoned = _groups(spark, {"a": 100})
    assert sum_sq_group_bound(poisoned, ["k"], cache_key=key) == 4
    pairsize._BOUND_CACHE.pop((spark.sparkContext.applicationId, key))


def test_partition_count_clamps(spark):
    floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert pair_exchange_partitions(spark, 0) == floor
    assert pair_exchange_partitions(spark, 10**7) == max(floor, 10)
    assert (
        pair_exchange_partitions(spark, 10**12)
        == pairsize.PAIR_MAX_PARTITIONS
    )


def test_volume_repartition_elides_downstream_agg_exchange(spark):
    """The contract the chassis exists for: repartitioning on the pair
    key immediately before the pair aggregate leaves ONE pair-key
    exchange in the plan (REPARTITION_BY_NUM), with the aggregate's own
    shuffle elided."""
    df = _groups(spark, {"a": 4, "b": 3}).select(
        F.col("k").alias("p1"), (F.col("v") % 2).alias("p2")
    )
    agg = (
        volume_repartition_pairs(df, ["p1", "p2"], 2 * 10**9)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert len(exchanges) == 1
    assert "REPARTITION_BY_NUM" in exchanges[0]
    # and the count is sized by volume (2e9/1e6), not the session conf
    assert "2000)" in exchanges[0]
    assert agg.count() == 4  # (a,0),(a,1),(b,0),(b,1)
