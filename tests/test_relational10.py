"""Semantics tests for batch 10 (time-series diagnostics): naive-Python
cross-checks of the windowable CUSUM identity, the changepoint argmax,
and structural invariants of the seasonality/burstiness outputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _daily(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        _daily_counts,
    )

    rows = _daily_counts(spark, sf_dir).collect()
    return sorted((r.day, r.c) for r in rows)


def test_cusum_equals_recursive_definition(spark, sf_dir):
    """The windowed form (cum − min-prefix floor) must equal the
    textbook recursion C_k = max(0, C_{k−1} + d_k) unrolled in Python."""
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        q_events_cusum,
    )

    series = _daily(spark, sf_dir)
    n = len(series)
    s = sum(c for _, c in series)
    want = {}
    ck = 0
    for day, c in series:
        ck = max(0, ck + n * c - s)
        if ck > 0:
            want[day] = ck
    got = {r.day: r.cusum_scaled for r in q_events_cusum(spark, sf_dir).collect()}
    assert got == want


def test_changepoint_matches_bruteforce(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        q_events_changepoint,
    )

    series = _daily(spark, sf_dir)
    n = len(series)
    s = sum(c for _, c in series)
    best = None
    sk = 0
    for k, (day, c) in enumerate(series, start=1):
        sk += c
        if k >= n:
            break
        a = n * sk - k * s
        t = round(a * a / (n * k * (n - k)) * 1e3)
        # same key both engines use: (t desc, day asc)
        if best is None or (t, [d for d, _ in series][k - 1]) > (best[0], best[1]):
            if best is None or t > best[0]:
                best = (t, day, k)
    got = q_events_changepoint(spark, sf_dir).collect()[0]
    assert (got.t_milli, got.day, got.n_before) == best


def test_dow_seasonality_averages_to_unity(spark, sf_dir):
    """Weighted by day counts, the seasonality indices must average to
    1e6 (the index is volume-share over day-share)."""
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        q_events_dow_seasonality,
    )

    rows = q_events_dow_seasonality(spark, sf_dir).collect()
    assert {r.dow for r in rows} <= set(range(7))
    td = sum(r.n_days for r in rows)
    weighted = sum(r.idx_ppm * r.n_days for r in rows) / td
    # exact identity holds pre-rounding; post-rounding stays within ppm noise
    assert abs(weighted - 1_000_000) < 1_000


def test_bollinger_flags_match_bruteforce(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        q_events_bollinger,
    )

    series = _daily(spark, sf_dir)
    want = {}
    for i in range(6, len(series)):
        win = series[i - 6 : i + 1]
        c = series[i][1]
        s = sum(x for _, x in win)
        q = sum(x * x for _, x in win)
        if 4 * (7 * c - s) ** 2 > 9 * (7 * q - s * s):
            want[series[i][0]] = "hi" if 7 * c > s else "lo"
    got = {r.day: r.band for r in q_events_bollinger(spark, sf_dir).collect()}
    assert got == want


def test_burstiness_bounded_and_gap_counts(spark, sf_dir):
    """B ∈ (−1, 1); per-type gap counts equal n_events − n_(user,type)
    streams (one lost row per stream head)."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational10 import (
        q_events_burstiness,
    )

    rows = q_events_burstiness(spark, sf_dir).collect()
    for r in rows:
        assert -1_000_000 < r.b_ppm < 1_000_000
    e = load_table(spark, "events", sf_dir)
    counts = {
        r.event_type: (r.n, r.streams)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("streams"),
        )
        .collect()
    }
    got = {r.event_type: r.n_gaps for r in rows}
    want = {t: n - st for t, (n, st) in counts.items() if n - st > 0}
    assert got == want
