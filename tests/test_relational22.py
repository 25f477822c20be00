"""Batch-22 additions: Spearman rank correlation, Theil–Sen slope,
user-user CF, day-of-week eta², hapax rate, Simpson diversity,
systematic sampling. Value-level correctness is oracle-gated
(tools/check_oracle.py, certified at sf0.001 + sf0.01 under
shuffle.partitions 3/17/32); these tests pin structural invariants
and the exactness contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational22 import (
    SYS_K,
    UU_ITEM_CAP,
    UU_TOP_K,
    q_events_dow_eta2,
    q_lineitem_spearman,
    q_orders_theil_sen_monthly,
    q_rec_user_user_topk,
    q_sample_systematic_orders,
    q_text_hapax_rate,
    q_text_simpson_diversity,
)


def test_spearman_in_range_and_counts_all_rows(spark, sf_dir):
    """rho must be a valid correlation in ppm and cover every lineitem
    row (in this synthetic corpus quantity and price are drawn
    independently, so the value itself sits near zero — the
    reference-formula test below pins it exactly)."""
    r = q_lineitem_spearman(spark, sf_dir).head()
    assert -1_000_000 <= r.rho_ppm <= 1_000_000
    n = load_table(spark, "lineitem", sf_dir).count()
    assert r.n == n


def test_spearman_matches_reference_formula(spark, sf_dir):
    """Recompute Spearman with scipy-free exact Python arithmetic on
    the collected (quantity, price-cents) pairs — ties-averaged ranks
    via sort — and assert the engine's ppm matches to the half-ulp
    rounding boundary (±1 ppm)."""
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        )
        .collect()
    )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    qs = [r.q for r in li]
    ps = [r.p for r in li]
    ra, rb = avg_ranks(qs), avg_ranks(ps)
    n = len(ra)
    sa, sb = sum(ra), sum(rb)
    saa = sum(x * x for x in ra)
    sbb = sum(x * x for x in rb)
    sab = sum(x * y for x, y in zip(ra, rb))
    rho = (n * sab - sa * sb) / (
        (n * saa - sa * sa) ** 0.5 * (n * sbb - sb * sb) ** 0.5
    )
    got = q_lineitem_spearman(spark, sf_dir).head().rho_ppm
    assert abs(got - round(rho * 1e6)) <= 1


def test_theil_sen_is_a_realized_pairwise_slope(spark, sf_dir):
    r = q_orders_theil_sen_monthly(spark, sf_dir).head()
    assert r.n_pairs == r.n_months * (r.n_months - 1) // 2
    # the median is an element of the multiset, not an interpolation:
    # recompute the pair multiset and assert membership + position
    o = load_table(spark, "orders", sf_dir)
    monthly = (
        o.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m")
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"))
        .collect()
    )
    def tdiv(a: int, b: int) -> int:
        # truncation toward zero — the engines' BIGINT div/// semantics
        s = -1 if (a < 0) != (b < 0) else 1
        return s * (abs(a) // abs(b))

    ms = sorted((row.m, row.rev) for row in monthly)
    slopes = sorted(
        tdiv(1000 * (rj - ri), mj - mi)
        for i, (mi, ri) in enumerate(ms)
        for (mj, rj) in ms[i + 1 :]
    )
    assert r.slope_milli_per_month in slopes
    assert slopes[(len(slopes) + 1) // 2 - 1] == r.slope_milli_per_month


def test_user_user_topk_shape(spark, sf_dir):
    rows = q_rec_user_user_topk(spark, sf_dir).collect()
    assert rows
    per_user: dict[int, list] = {}
    for r in rows:
        assert r.user_id != r.neighbor_id
        assert r.dot >= 2
        assert 0 <= r.cos2_micro <= 1_000_000
        per_user.setdefault(r.user_id, []).append(r)
    for user, lst in per_user.items():
        assert len(lst) <= UU_TOP_K
        scores = [x.cos2_micro for x in lst]
        assert scores == sorted(scores, reverse=True)


def test_user_user_pairs_share_a_kept_item(spark, sf_dir):
    """Every returned neighbor pair must be witnessed by at least one
    item UNDER the popularity cap — the structural guarantee that
    capped items never contribute similarity mass."""
    from page_rank_mapreduce_java_spark.operators.recommend import _interactions

    inter = _interactions(spark, sf_dir)
    kept_items = (
        inter.groupBy("item_id")
        .count()
        .filter(F.col("count") <= UU_ITEM_CAP)
        .select("item_id")
    )
    inter2 = inter.join(kept_items, "item_id", "left_semi")
    res = q_rec_user_user_topk(spark, sf_dir).select("user_id", "neighbor_id")
    witnessed = (
        res.join(
            inter2.select(F.col("user_id"), F.col("item_id")), "user_id"
        )
        .join(
            inter2.select(
                F.col("user_id").alias("neighbor_id"),
                F.col("item_id"),
            ),
            ["neighbor_id", "item_id"],
        )
        .select("user_id", "neighbor_id")
        .distinct()
    )
    assert res.count() == witnessed.count()


def test_dow_eta2_bounds(spark, sf_dir):
    rows = q_events_dow_eta2(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n > 0
        # eta² is a variance share: [0, 1] in ppm (sentinel -2e6 only
        # for a degenerate zero-variance slice, which this corpus lacks)
        assert 0 <= r.eta2_ppm <= 1_000_000


def test_hapax_and_simpson_consistency(spark, sf_dir):
    """The two lexical queries share the same tf relation: vocab and
    token counts must agree exactly, hapax ≤ vocab, and Simpson must be
    inside (0, 1e6)."""
    h = {r.lang: r for r in q_text_hapax_rate(spark, sf_dir).collect()}
    s = {r.lang: r for r in q_text_simpson_diversity(spark, sf_dir).collect()}
    assert set(h) == set(s) and h
    for lang in h:
        assert h[lang].n_tokens == s[lang].n_tokens
        assert h[lang].vocab_size == s[lang].vocab_size
        assert 0 <= h[lang].hapax_count <= h[lang].vocab_size
        assert h[lang].hapax_ppm == 1_000_000 * h[lang].hapax_count // h[lang].vocab_size
        assert 0 < s[lang].simpson_ppm < 1_000_000
    # NOTE: the synthetic corpus draws from a closed ~31-word vocabulary,
    # so hapax_count = 0 everywhere is the CORRECT value here (verified
    # against DuckDB); the ppm identity above is the real invariant.


def test_systematic_sample_positions(spark, sf_dir):
    rows = q_sample_systematic_orders(spark, sf_dir).collect()
    n_orders = load_table(spark, "orders", sf_dir).count()
    assert len(rows) == (n_orders + SYS_K - 1) // SYS_K
    rns = sorted(r.rn for r in rows)
    assert rns[0] == 1
    assert all(rn % SYS_K == 1 for rn in rns)
    assert len(set(r.o_orderkey for r in rows)) == len(rows)
