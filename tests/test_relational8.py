"""Semantics tests for batch 8 (statistical mining): the scalable
plans are checked against their NAIVE definitions on small randomized
inputs (oracle parity at corpus scale is covered by
tools/check_oracle.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.operators.ranking import (
    grouped_topk_low_cardinality,
)


def test_grouped_topk_matches_naive_window(spark):
    """Two-level pruned top-k == plain per-group window top-k, across
    partition layouts (local-prune correctness must not depend on how
    rows landed in partitions)."""
    rng = random.Random(7)
    rows = [(rng.choice("abc"), i, rng.randrange(1000)) for i in range(500)]
    for n_parts in (1, 3, 13):
        df = spark.createDataFrame(
            rows, "g STRING, id LONG, v LONG"
        ).repartition(n_parts)
        order = [F.asc("v"), F.asc("id")]
        got = grouped_topk_low_cardinality(df, ["g"], order, 7)
        w = Window.partitionBy("g").orderBy(*order)
        want = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 7)
            .drop("_rn")
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_grouped_topk_short_groups(spark):
    """Groups smaller than k come back whole."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g STRING, v LONG"
    ).repartition(4)
    got = grouped_topk_low_cardinality(df, ["g"], [F.asc("v")], 10)
    assert sorted(map(tuple, got.collect())) == [("a", 1), ("a", 2), ("b", 3)]


def _naive_skyline(points):
    """All-pairs dominance: keep p iff no q is >= in size, <= in price,
    strict somewhere."""
    out = []
    for pk, s, c in points:
        dominated = any(
            s2 >= s and c2 <= c and (s2 > s or c2 < c)
            for _, s2, c2 in points
        )
        if not dominated:
            out.append((pk, s, c))
    return sorted(out)


def test_skyline_matches_naive_dominance(spark):
    """The per-size-min + running-min plan == the quadratic dominance
    definition, including duplicate (size, price) points (mutually
    non-dominating: both stay)."""
    from page_rank_mapreduce_java_spark.operators.relational8 import (
        q_skyline_parts,  # noqa: F401  (plan under test built inline below)
    )

    rng = random.Random(11)
    pts = [(i, rng.randrange(1, 8), rng.randrange(100, 200)) for i in range(60)]
    pts += [(100, 5, 150), (101, 5, 150)]  # exact duplicate pair
    p = spark.createDataFrame(pts, "p_partkey LONG, p_size INT, price_c LONG")

    persize = p.groupBy("p_size").agg(F.min("price_c").alias("_minp"))
    w = Window.orderBy(F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    fr = persize.withColumn("_cm", F.min("_minp").over(w))
    got = (
        p.join(F.broadcast(fr), "p_size")
        .filter(
            (F.col("price_c") == F.col("_minp"))
            & (F.col("_cm").isNull() | (F.col("price_c") < F.col("_cm")))
        )
        .select("p_partkey", "p_size", "price_c")
    )
    assert sorted(map(tuple, got.collect())) == _naive_skyline(pts)


def test_rolling_distinct_fanout_matches_naive(spark):
    """Explode-fanout trailing-7-day distinct == per-day brute force."""
    import datetime as dt

    rng = random.Random(3)
    base = dt.date(2024, 3, 1)
    rows = [
        (base + dt.timedelta(days=rng.randrange(20)), rng.randrange(12))
        for _ in range(300)
    ]
    pairs_df = spark.createDataFrame(rows, "day DATE, user_id LONG").distinct()
    days = pairs_df.select("day").distinct().withColumnRenamed("day", "anchor")
    fanned = pairs_df.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "anchor"
        ),
        "user_id",
    )
    got = dict(
        fanned.join(F.broadcast(days), "anchor")
        .groupBy("anchor")
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    )
    pairs = set(map(tuple, pairs_df.collect()))
    all_days = sorted({d for d, _ in pairs})
    want = {
        d: len(
            {u for (d2, u) in pairs if (d - d2).days in range(7)}
        )
        for d in all_days
    }
    assert got == want


def test_ntile_rfm_buckets_are_balanced(spark):
    """global_ntile-based RFM: every quartile key in 1..4 and the three
    marginals each split |customers| into near-equal quarters."""
    from page_rank_mapreduce_java_spark.operators.relational8 import (
        RFM_TILES,
        q_rfm_segments,
    )

    seg = q_rfm_segments(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_customers for r in seg)
    for axis in ("r_q", "f_q", "m_q"):
        marg = {}
        for r in seg:
            marg[r[axis]] = marg.get(r[axis], 0) + r.n_customers
        assert set(marg) <= set(range(1, RFM_TILES + 1))
        assert max(marg.values()) - min(marg.values()) <= 1
        assert sum(marg.values()) == total


def test_basket_cap_bounds_pair_volume(spark):
    """A pathological giant basket must be EXCLUDED by the cap, not
    explode into |basket|² pairs — the 100 TB guard of the association
    miner (one crawler cart must not emit 10¹⁰ pairs)."""
    from page_rank_mapreduce_java_spark.operators.relational8 import BASKET_CAP

    # 40 normal 3-item baskets + one 200-item monster
    rows = [(o, p) for o in range(40) for p in (o, o + 1, o + 2)]
    rows += [(999, p) for p in range(200)]
    items = spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG").distinct()
    keep = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") <= BASKET_CAP)
        .select("l_orderkey")
    )
    i = items.join(keep, "l_orderkey")
    a, b = i.alias("a"), i.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    n = pairs.count()
    # 40 baskets × C(3,2)=3 pairs; the monster contributes ZERO
    assert n == 120
    # monster order never appears on either side
    assert pairs.filter(F.col("a.l_orderkey") == 999).count() == 0


def test_entropy_and_information_stat_bounds(spark, sf_dir):
    """Analytic invariants of the information statistics: per-user
    entropy in [0, ln(#event types)]·1e6; a single-type user scores
    exactly 0; chi-square is non-negative."""
    import math

    from page_rank_mapreduce_java_spark.operators.relational8 import (
        q_chi2_flag_status,
        q_user_event_entropy,
    )
    from page_rank_mapreduce_java_spark.catalog import load_table

    ent = q_user_event_entropy(spark, sf_dir).collect()
    n_types = (
        load_table(spark, "events", sf_dir)
        .select("event_type")
        .distinct()
        .count()
    )
    hi = math.log(n_types) * 1e6 + 1  # +1 for the rounding ulp
    assert all(0 <= r.entropy_micro <= hi for r in ent)

    # a synthetic one-type user has exactly zero entropy
    one = spark.createDataFrame(
        [(1, "view", i) for i in range(5)], "user_id LONG, event_type STRING, n LONG"
    )
    c = one.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    z = (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(F.round(F.sum(-p * F.log(p)) * 1e6).cast("long").alias("e"))
        .first()
    )
    assert z.e == 0

    chi = q_chi2_flag_status(spark, sf_dir).first()
    assert chi.chi2_milli >= 0


def test_mode_tiebreak_is_deterministic(spark):
    """Equal counts must resolve to the lexicographically LARGEST type —
    the documented tie rule the oracle mirrors (ORDER BY n DESC, type
    DESC), never engine-dependent MODE() roulette."""
    rows = [(1, "click"), (1, "view"), (1, "view"), (1, "click"), (2, "view")]
    e = spark.createDataFrame(rows, "user_id LONG, event_type STRING")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    best = c.groupBy("user_id").agg(
        F.max(F.struct(F.col("n"), F.col("event_type"))).alias("_b")
    )
    got = {
        r.user_id: (r._b.event_type, r._b.n) for r in best.collect()
    }
    assert got == {1: ("view", 2), 2: ("view", 1)}


def test_global_running_sum_matches_naive_window(spark):
    """Two-pass prefix sum == naive unpartitioned SUM window, across
    input partitionings and shuffle-partition settings."""
    from page_rank_mapreduce_java_spark.operators.ranking import (
        global_running_sum,
    )

    rng = random.Random(23)
    # Mixed-sign weights: partition totals must be SUM(w), not the max
    # of the running sum (those differ as soon as any weight is negative).
    rows = [(i, rng.randrange(1, 100)) for i in range(400)] + [
        (i, rng.randrange(-50, 50)) for i in range(400, 600)
    ]
    df0 = spark.createDataFrame(rows, "id LONG, w LONG")
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = sorted(
        (r.id, r.cum)
        for r in df0.withColumn("cum", F.sum("w").over(w)).collect()
    )
    for parts in (1, 3, 13):
        got = sorted(
            (r.id, r.cum)
            for r in global_running_sum(
                df0.repartition(parts), "w", [F.asc("id")], out_col="cum"
            ).collect()
        )
        assert got == want


def test_pps_sample_is_proportional_and_bounded(spark, sf_dir):
    """Systematic PPS: at most k rows; every row with weight ≥ total/k
    is ALWAYS selected (its interval must cross a boundary); and the
    selection is invariant under repartitioning."""
    from page_rank_mapreduce_java_spark.operators.relational8 import (
        PPS_K,
        q_sample_pps_orders,
    )
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents

    sel = q_sample_pps_orders(spark, sf_dir).collect()
    assert 0 < len(sel) <= PPS_K

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", cents("o_totalprice").alias("wt")
    )
    total = o.agg(F.sum("wt")).first()[0]
    heavy = {
        r.o_orderkey
        for r in o.filter(F.col("wt") * PPS_K >= total).collect()
    }
    selected = {r.o_orderkey for r in sel}
    assert heavy <= selected
