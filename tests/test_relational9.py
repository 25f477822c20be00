"""Semantics tests for batch 9 (distribution analytics): the scalable
chassis are checked against naive definitions on small randomized
inputs; statistic values are sanity-bounded and cross-checked against
closed forms computed in plain Python (oracle parity at corpus scale is
tools/check_oracle.py's job)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.operators.ranking import (
    global_running_sums,
)


def test_global_running_sums_matches_per_column_naive(spark):
    """The shared-order multi-column prefix sum equals the per-column
    window result, with mixed-sign values and across partitionings."""
    rng = random.Random(11)
    rows = [
        (i, rng.randrange(-20, 100), rng.randrange(-5, 5)) for i in range(300)
    ]
    want_u = {}
    want_v = {}
    cu = cv = 0
    for i, u, v in rows:
        cu += u
        cv += v
        want_u[i], want_v[i] = cu, cv
    for parts in (1, 4, 11):
        df = spark.createDataFrame(rows, "id LONG, u LONG, v LONG").repartition(
            parts
        )
        got = global_running_sums(
            df, ["u", "v"], [F.asc("id")], out_cols=["cu", "cv"]
        ).collect()
        assert {r.id: r.cu for r in got} == want_u
        assert {r.id: r.cv for r in got} == want_v


def _python_gini(ws: list[int]) -> float:
    ws = sorted(ws)
    n = len(ws)
    s = sum(ws)
    t = sum((i + 1) * w for i, w in enumerate(ws))
    return (2 * t - (n + 1) * s) / (n * s)


def test_gini_matches_closed_form(spark, sf_dir):
    """Engine Gini per nation == the sorted closed form computed in
    Python over the same per-customer spends."""
    from page_rank_mapreduce_java_spark.operators.relational9 import (
        _customer_spend,
        q_gini_nation_spend,
    )

    spends = _customer_spend(spark, sf_dir).collect()
    by_nation: dict[str, list[int]] = {}
    for r in spends:
        by_nation.setdefault(r.n_name, []).append(r.spend)
    got = {r.n_name: r.gini_ppm for r in q_gini_nation_spend(spark, sf_dir).collect()}
    assert set(got) == set(by_nation)
    for nation, ws in by_nation.items():
        assert got[nation] == round(_python_gini(ws) * 1e6)


def test_lorenz_shares_are_monotone_and_close(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational9 import (
        q_lorenz_deciles_spend,
    )

    rows = sorted(
        q_lorenz_deciles_spend(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # ascending-spend deciles: per-decile share must be non-decreasing,
    # cumulative share must end at ~100%.
    shares = [r.share_ppm for r in rows]
    assert shares == sorted(shares)
    assert abs(rows[-1].cum_share_ppm - 1_000_000) <= 5
    # bucket sizes differ by at most one
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_ks_and_auc_match_python_reference(spark, sf_dir):
    """KS distance and AUC equal scipy-free reference implementations
    over the collected samples."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational9 import (
        q_auc_flag_quantity,
        q_ks_flag_price,
    )

    rows = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag").isin("R", "A"))
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .collect()
    )
    pr = sorted(r.p for r in rows if r.l_returnflag == "R")
    pa = sorted(r.p for r in rows if r.l_returnflag == "A")
    values = sorted(set(pr) | set(pa))
    import bisect

    d = max(
        abs(bisect.bisect_right(pr, v) * len(pa) - bisect.bisect_right(pa, v) * len(pr))
        for v in values
    )
    ks = q_ks_flag_price(spark, sf_dir).collect()[0]
    assert (ks.n_r, ks.n_a) == (len(pr), len(pa))
    assert ks.ks_ppm == round(d / (len(pr) * len(pa)) * 1e6)

    qr = [r.q for r in rows if r.l_returnflag == "R"]
    qa = sorted(r.q for r in rows if r.l_returnflag == "A")
    # AUC = P(R > A) + 0.5 P(R == A), exact via bisect counts
    num2 = 0  # doubled numerator
    for v in qr:
        lt = bisect.bisect_left(qa, v)
        eq = bisect.bisect_right(qa, v) - lt
        num2 += 2 * lt + eq
    auc = q_auc_flag_quantity(spark, sf_dir).collect()[0]
    assert (auc.n_r, auc.n_a) == (len(qr), len(qa))
    assert auc.auc_ppm == round(num2 / (2 * len(qr) * len(qa)) * 1e6)


def test_cramers_v_bounds_and_benford_shares(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational9 import (
        q_benford_totalprice,
        q_cramers_v_flag_status,
    )

    v = q_cramers_v_flag_status(spark, sf_dir).collect()[0]
    assert 0 <= v.v_ppm <= 1_000_000
    assert v.df_min == 1

    rows = q_benford_totalprice(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.share_ppm for r in rows) - 1_000_000) <= len(rows)
    for r in rows:
        assert r.benford_ppm == round(math.log10(1 + 1 / r.digit) * 1e6)
        assert r.dev_ppm == r.share_ppm - r.benford_ppm


def test_skew_kurt_and_ols_match_python(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational9 import (
        q_ols_price_on_quantity,
        q_skew_kurtosis_quantity,
    )

    rows = (
        load_table(spark, "lineitem", sf_dir)
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append((r.q, r.y))
    sk = {r.l_returnflag: r for r in q_skew_kurtosis_quantity(spark, sf_dir).collect()}
    ols = {r.l_returnflag: r for r in q_ols_price_on_quantity(spark, sf_dir).collect()}
    assert set(sk) == set(by_flag) == set(ols)
    for flag, pairs in by_flag.items():
        qs = [p[0] for p in pairs]
        n = len(qs)
        m = sum(qs) / n
        m2 = sum(q * q for q in qs) / n - m * m
        m3 = sum(q**3 for q in qs) / n - 3 * m * (sum(q * q for q in qs) / n) + 2 * m**3
        skew = m3 / math.sqrt(m2**3)
        # milli-rounding tolerance 1 for float-path differences between
        # this reference (fractions-free Python floats) and the engines
        assert abs(sk[flag].skew_milli - round(skew * 1e3)) <= 1
        xs = [p[0] for p in pairs]
        ys = [p[1] for p in pairs]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in pairs)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert abs(ols[flag].slope_milli - round(slope * 1e3)) <= 1
