"""Batch-23 additions: Kruskal–Wallis H, Yule's K, record days,
exposure Gini, inter-purchase quantiles, embedding dim variance.
Value-level correctness is oracle-gated (tools/check_oracle.py at
sf0.001 + sf0.01 under shuffle.partitions 3/17/32); these tests pin
structural invariants and the exactness contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational23 import (
    q_embedding_dim_variance,
    q_events_record_days,
    q_kruskal_wallis_value_by_type,
    q_orders_interpurchase_median,
    q_rec_exposure_gini,
    q_text_yule_k,
)


def test_kruskal_wallis_matches_reference_formula(spark, sf_dir):
    """Recompute H with plain-Python ties-averaged ranks and assert
    the engine's milli values match to the rounding boundary."""
    rows = (
        load_table(spark, "events", sf_dir)
        .select(
            "event_type",
            F.round(F.col("value") * 1e6).cast("long").alias("vm"),
        )
        .collect()
    )
    vals = [r.vm for r in rows]
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r2 = [0] * len(vals)  # doubled ties-averaged ranks (exact ints)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        rr = (i + 1) + (j + 1)  # 2 * average of positions i+1..j+1
        for k in range(i, j + 1):
            r2[order[k]] = rr
        i = j + 1
    groups: dict[str, list[int]] = {}
    for r, row in zip(r2, rows):
        groups.setdefault(row.event_type, []).append(r)
    n = len(vals)
    u = 0.0
    for t in sorted(groups):
        s2 = sum(groups[t])
        u += 3000.0 * float(s2) * float(s2) / len(groups[t])
    h = u / (n * (n + 1.0)) - 3000.0 * (n + 1.0)
    from collections import Counter

    tsum = sum(c**3 - c for c in Counter(vals).values())
    h_adj = h / ((1e6 - 1e6 * tsum / (n**3 - n)) / 1e6)
    got = q_kruskal_wallis_value_by_type(spark, sf_dir).head()
    assert got.n == n and got.n_groups == len(groups)
    assert abs(got.h_milli - round(h)) <= 1
    assert abs(got.h_adj_milli - round(h_adj)) <= 1
    assert got.h_milli >= 0 or got.h_milli > -1000  # H ≥ 0 up to rounding


def test_yule_k_agrees_with_simpson_scan(spark, sf_dir):
    """Yule's K and Simpson share the frequency spectrum: both derive
    from Σc² over the same tf relation, so K must equal
    10⁷·(Σc²−N) div N² recomputed here from raw counts."""
    from page_rank_mapreduce_java_spark.functions.textfn import words

    d = load_table(spark, "documents", sf_dir)
    tf = (
        d.select("lang", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .count()
        .collect()
    )
    stats: dict[str, list[int]] = {}
    for r in tf:
        stats.setdefault(r.lang, []).append(r["count"])
    got = {r.lang: r for r in q_text_yule_k(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for lang, cnts in stats.items():
        n, c2 = sum(cnts), sum(c * c for c in cnts)
        assert got[lang].n_tokens == n
        assert got[lang].yule_k_milli == (10_000_000 * (c2 - n)) // (n * n)


def test_record_days_are_strictly_increasing(spark, sf_dir):
    rows = q_events_record_days(spark, sf_dir).collect()
    assert rows
    rows.sort(key=lambda r: r.record_no)
    assert rows[0].record_no == 1
    cs = [r.c for r in rows]
    assert cs == sorted(cs) and len(set(cs)) == len(cs)  # strict highs
    days = [r.day for r in rows]
    assert days == sorted(days)


def test_exposure_gini_bounds_and_slots(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.recommend import (
        _interactions,
        item_item_topk,
    )

    r = q_rec_exposure_gini(spark, sf_dir).head()
    assert 0 <= r.gini_ppm < 1_000_000
    sims = item_item_topk(_interactions(spark, sf_dir))
    assert r.total_slots == sims.count()
    assert r.n_recommended == sims.select("neighbor_id").distinct().count()


def test_interpurchase_quantiles_are_nearest_rank(spark, sf_dir):
    r = q_orders_interpurchase_median(spark, sf_dir).head()
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.to_date("o_orderdate").alias("day"), "o_orderkey"
    )
    rows = sorted(
        (x.o_custkey, x.day, x.o_orderkey) for x in o.collect()
    )
    gaps = []
    prev = None
    for ck, day, ok in rows:
        if prev is not None and prev[0] == ck:
            gaps.append((day - prev[1]).days)
        prev = (ck, day)
    gaps.sort()
    assert r.n_gaps == len(gaps)
    assert r.median_gap_days == gaps[(len(gaps) + 1) // 2 - 1]
    assert r.p90_gap_days == gaps[(9 * len(gaps) + 9) // 10 - 1]
    assert r.median_gap_days <= r.p90_gap_days


def test_dim_variance_shape_and_rank(spark, sf_dir):
    rows = q_embedding_dim_variance(spark, sf_dir).collect()
    assert len(rows) == 64
    n_vecs = load_table(spark, "embeddings", sf_dir).count()
    by_rank = sorted(rows, key=lambda r: r.var_rank)
    assert [r.var_rank for r in by_rank] == list(range(1, 65))
    vs = [r.var_micro2 for r in by_rank]
    assert vs == sorted(vs, reverse=True)
    assert all(r.n == n_vecs and r.var_micro2 >= 0 for r in rows)
