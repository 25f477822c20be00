"""Batch-29 additions: session-type lift, second-digit Benford,
supplier mix entropy. Value-level correctness is oracle-gated
(tools/check_oracle.py at sf0.001 + sf0.01 under shuffle.partitions
3/17/32); these tests pin structural invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational29 import (
    _BENFORD2_PPM,
    MIX_MIN_ITEMS,
    MIX_TOP_N,
    q_benford_second_digit,
    q_events_session_type_lift,
    q_supplier_mix_entropy_top25,
)


def test_session_lift_pairs_are_canonical(spark, sf_dir):
    rows = q_events_session_type_lift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_sessions_both > 0
        assert r.lift_ppm > 0


def test_benford_expected_constants_sum_to_one(spark, sf_dir):
    assert abs(sum(_BENFORD2_PPM) - 1_000_000) <= 5  # rounding only
    rows = q_benford_second_digit(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(10))
    n = load_table(spark, "orders", sf_dir).count()
    assert sum(r.n for r in rows) == n  # every total has >= 2 digits in cents
    for r in rows:
        assert r.dev_ppm == r.share_ppm - r.expected_ppm


def test_mix_entropy_bounds(spark, sf_dir):
    rows = q_supplier_mix_entropy_top25(spark, sf_dir).collect()
    assert 0 < len(rows) <= MIX_TOP_N
    ent = [r.entropy_micronat for r in rows]
    assert ent == sorted(ent, reverse=True)
    for r in rows:
        assert r.n_items >= MIX_MIN_ITEMS
        # 0 <= H <= ln(n_types), within the micro-nat snap tolerance
        # (per-term rounding can accumulate to a few micro-nats)
        assert -20 <= r.entropy_micronat
        assert r.entropy_micronat <= int(math.log(r.n_types) * 1e6) + 20
