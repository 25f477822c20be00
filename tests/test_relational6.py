"""Semantics tests for batch 6: funnel ordering and salted-join parity
(oracle parity is covered by tools/check_oracle.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.plans.skew import salted_join_hot_keys


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def test_funnel_requires_temporal_order(spark):
    """A user whose purchase precedes their click must not count as
    converted; same-instant progression does count (>=)."""
    rows = [
        # u1: clean view -> click -> purchase
        (1, "view", _ts(0)), (1, "click", _ts(5)), (1, "purchase", _ts(9)),
        # u2: purchase BEFORE click -> stops at click stage
        (2, "view", _ts(0)), (2, "purchase", _ts(1)), (2, "click", _ts(2)),
        # u3: click before view -> stops at view stage
        (3, "click", _ts(0)), (3, "view", _ts(1)),
        # u4: same-instant view+click+purchase -> fully converted
        (4, "view", _ts(0)), (4, "click", _ts(0)), (4, "purchase", _ts(0)),
    ]
    e = spark.createDataFrame(rows, "user_id LONG, event_type STRING, ts TIMESTAMP")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t0"))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    assert {r.user_id for r in v.collect()} == {1, 2, 3, 4}
    assert {r.user_id for r in c.collect()} == {1, 2, 4}
    assert {r.user_id for r in p.collect()} == {1, 4}


def test_salted_join_matches_plain_join_and_spreads_hot_key(spark):
    # Key 7 is pathologically hot on the fact side.
    fact = spark.createDataFrame(
        [(7, i) for i in range(400)] + [(k, k * 10) for k in range(1, 6)],
        "k LONG, payload LONG",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 10)], "k LONG, attr STRING"
    )
    hot = spark.createDataFrame([(7,)], "k LONG")
    got = salted_join_hot_keys(fact, dim, "k", hot, n_salts=8, salt_src=F.col("payload"))
    want = fact.join(dim, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # The hot key's fact rows must actually spread across salts...
    hot_salts = (
        fact.join(F.broadcast(hot.withColumn("_hot", F.lit(1))), "k", "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(), F.pmod(F.xxhash64("payload"), F.lit(8))).otherwise(F.lit(0)),
        )
        .filter(F.col("k") == 7)
        .select("_salt")
        .distinct()
        .count()
    )
    assert hot_salts >= 6
    # ...and the dim side must replicate ONLY the hot row.
    assert got.count() == want.count()


def test_kmv_estimate_within_sketch_error(spark):
    """KMV with K=64 must land within ~3 standard errors (~40%) of the
    true distinct count on a 1000-member group, and be EXACT below K."""
    from page_rank_mapreduce_java_spark.functions.hashes import md5_long
    from page_rank_mapreduce_java_spark.operators.ranking import global_row_number
    from page_rank_mapreduce_java_spark.operators.relational6 import KMV_K

    rows = [("big", i) for i in range(1000)] + [("small", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g STRING, member LONG")
    d = df.select("g", md5_long(F.col("member").cast("string")).alias("hv")).distinct()
    r = global_row_number(d, [F.asc("g"), F.asc("hv")], out_col="_grn")
    stats = r.groupBy("g").agg((F.min("_grn") - 1).alias("_off"))
    pos = r.join(F.broadcast(stats), "g").withColumn("_pos", F.col("_grn") - F.col("_off"))
    agg = (
        pos.filter(F.col("_pos") <= KMV_K)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("hk"))
    )
    est_col = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
        F.round(F.lit(float(KMV_K - 1)) * F.lit(float(2**60)) / F.col("hk").cast("double")).cast("long")
    )
    est = {r["g"]: r["e"] for r in agg.select("g", est_col.alias("e")).collect()}
    assert est["small"] == 40
    assert 600 <= est["big"] <= 1400, est["big"]
