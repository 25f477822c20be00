"""Hand-computed math pins for the batch 36/37 statistics.

The driver gate certifies Spark ≡ oracle-SQL; these tests certify the
oracle SQL ≡ the STATISTIC'S DEFINITION on tiny hand-computed inputs —
the two together pin the Spark side to the textbook formula. Pure
DuckDB (no Spark session), so they run in milliseconds.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from page_rank_mapreduce_java_spark.operators import relational36, relational37


def _con_with_lineitem(rows):
    """rows: list of (l_quantity, l_returnflag, l_extendedprice)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem (l_quantity DOUBLE, l_returnflag VARCHAR,"
        " l_extendedprice DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?)", rows)
    return con


def test_cliffs_delta_hand_computed():
    # R quantities [1, 2], N quantities [1, 3]:
    # pairs (r, n): (1,1) tie, (1,3) r<n, (2,1) r>n, (2,3) r<n
    # delta = (#r>n - #r<n) / 4 = (1 - 2) / 4 = -0.25
    rows = [(1, "R", 10.0), (2, "R", 10.0), (1, "N", 10.0), (3, "N", 10.0)]
    con = _con_with_lineitem(rows)
    (n_a, n_b, delta) = con.execute(
        relational36.ORACLES["cliffs_delta_quantity"]
    ).fetchone()
    assert (n_a, n_b) == (2, 2)
    assert delta == -250_000


def test_auc_pr_hand_computed():
    # Scores (quantity): R at 3, A at 2, R at 1.
    # Threshold sweep descending: v=3 -> TP=1, FP=0, prec=1;
    # v=2 -> prec=1/2 (no new TP); v=1 -> TP=2, FP=1, prec=2/3.
    # AP = (1*1 + 1*(2/3)) / 2 = 5/6; in ppm with per-threshold
    # truncation: prec(3)=1000000, prec(1)=666666 -> (1000000+666666)//2
    rows = [(3, "R", 1.0), (2, "A", 1.0), (1, "R", 1.0)]
    con = _con_with_lineitem(rows)
    (n_pos, n_neg, ap_ppm, baseline_ppm) = con.execute(
        relational36.ORACLES["auc_pr_flag_quantity"]
    ).fetchone()
    assert (n_pos, n_neg) == (2, 1)
    assert ap_ppm == (1_000_000 + 666_666) // 2
    assert baseline_ppm == 666_666


def test_effect_size_hand_computed():
    # R prices [1.00, 3.00] (cents 100, 300): mean 200, var 20000
    # N prices [1.00, 1.00, 1.00]: mean 100, var 0
    # pooled sd^2 = (1*20000 + 2*0) / 3; d = 100 / sqrt(20000/3)
    rows = [
        (1, "R", 1.0),
        (1, "R", 3.0),
        (1, "N", 1.0),
        (1, "N", 1.0),
        (1, "N", 1.0),
    ]
    con = _con_with_lineitem(rows)
    (n_a, n_b, d_milli, g_milli, glass) = con.execute(
        relational36.ORACLES["effect_size_price_flag"]
    ).fetchone()
    assert (n_a, n_b) == (2, 3)
    d = 100.0 / math.sqrt(20000.0 / 3.0)
    assert d_milli == round(1e3 * d)
    assert g_milli == round(1e3 * d * (1 - 3.0 / (4 * 5 - 9)))
    # Glass delta divides by the N-group SD, which is zero in this
    # synthetic table (real price data never has a zero-variance
    # group); d and g above are the pinned values — glass is
    # intentionally unchecked here.
    del glass


def test_runs_test_hand_computed():
    # Six days with counts 5,1,5,1,5,1 (median 3): signs +,-,+,-,+,-
    # -> 6 runs, n1 = n2 = 3, mu = 2*9/6 + 1 = 4,
    # var = 2*3*3*(18-6)/(36*5) = 1.2, z = 2/sqrt(1.2) = 1.8257
    con = duckdb.connect()
    con.execute("CREATE TABLE orders (o_orderdate TIMESTAMP)")
    for day, cnt in enumerate([5, 1, 5, 1, 5, 1], start=1):
        for _ in range(cnt):
            con.execute(
                f"INSERT INTO orders VALUES (TIMESTAMP '2024-01-0{day}')"
            )
    (n_used, n_above, n_below, n_runs, z_milli) = con.execute(
        relational36.ORACLES["orders_runs_test_daily"]
    ).fetchone()
    assert (n_used, n_above, n_below, n_runs) == (6, 3, 3, 6)
    assert z_milli == round(1e3 * 2.0 / math.sqrt(1.2))


def test_runs_test_degenerate_guard():
    # A single repeated count: every day equals the median -> all rows
    # drop -> z must be the guarded 0, not a division error.
    con = duckdb.connect()
    con.execute("CREATE TABLE orders (o_orderdate TIMESTAMP)")
    for day in (1, 2, 3):
        con.execute(f"INSERT INTO orders VALUES (TIMESTAMP '2024-01-0{day}')")
    row = con.execute(
        relational36.ORACLES["orders_runs_test_daily"]
    ).fetchone()
    # Empty SUMs are NULL on both engines (identical, so hash-safe);
    # the guarded z is 0, never a division error.
    assert row == (0, None, None, None, 0)


def test_ndcg_discount_constants():
    # w_1 = 1e6 exactly (log2(2) = 1); weights strictly decreasing;
    # IDCG prefixes strictly increasing and consistent with the weights.
    from page_rank_mapreduce_java_spark.operators.relational35 import (
        _IDCG_PREFIX,
        _NDCG_W,
        NDCG_K,
    )

    assert len(_NDCG_W) == NDCG_K and _NDCG_W[0] == 1_000_000
    assert all(a > b for a, b in zip(_NDCG_W, _NDCG_W[1:]))
    assert _IDCG_PREFIX == [
        sum(_NDCG_W[: m + 1]) for m in range(NDCG_K)
    ]


def test_benford_probability_constants():
    # The nine micro probabilities must sum to 1e6 within rounding slack
    # and reproduce log10(1 + 1/d).
    ps = relational37._BENFORD_P
    assert len(ps) == 9
    assert abs(sum(ps) - 1_000_000) <= 5
    for d, p in enumerate(ps, start=1):
        assert p == round(1e6 * math.log10(1 + 1 / d))


def test_calibration_hand_computed():
    # All rows qty=5 (conf 100000 ppm), none returned -> acc 0,
    # single bin, gap = ECE = MCE = 100000.
    rows = [(5, "N", 1.0)] * 4
    con = _con_with_lineitem(rows)
    from page_rank_mapreduce_java_spark.operators import relational35

    (n_bins, n_total, ece, mce) = con.execute(
        relational35.ORACLES["calibration_return_by_quantity"]
    ).fetchone()
    assert (n_bins, n_total) == (1, 4)
    assert ece == 100_000 and mce == 100_000


def test_jl_sign_matrix_is_balanced_and_deterministic():
    # The md5-derived 64x16 sign matrix must be deterministic (pure
    # function of (pos, j)) and roughly balanced — a degenerate
    # all-ones matrix would make the projection a rank-1 sum.
    import hashlib

    def sign(pos, j):
        h = hashlib.md5(f"{pos}:{j}".encode()).hexdigest()
        return 1 - 2 * (int(h[:15], 16) % 2)

    signs = [sign(d, j) for d in range(64) for j in range(16)]
    ones = sum(1 for s in signs if s == 1)
    assert 0.4 < ones / len(signs) < 0.6
    # determinism across calls
    assert signs == [sign(d, j) for d in range(64) for j in range(16)]
