"""Property tests for the round-6 deterministic-ln contract
(functions/text_queries2.ln_int_sql): the shared formula must stay
accurate (≤ 1e-7 nat of libm ln), monotone, and ENGINE-IDENTICAL —
the DuckDB rendering and the Spark rendering are the same arithmetic,
so checking the DuckDB evaluation against Python floats (which share
IEEE semantics with the JVM for +,−,×,÷,√) pins both."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=2**62))
def test_ln_accuracy_against_libm(n):
    con = duckdb.connect()
    v = con.execute(f"SELECT {ln_int_sql(str(n), 'duckdb')}").fetchone()[0]
    assert abs(v - math.log(n)) < 1e-7


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=10**8))
def test_ln_monotone_at_neighbors(n):
    """Strict monotonicity is only mathematically guaranteed while the
    neighbor gap 1/n dwarfs the formula's ~1e-10 nat error (and double
    resolution) — beyond ~1e8 even libm ln ties neighbors."""
    con = duckdb.connect()
    a, b = (
        con.execute(
            f"SELECT {ln_int_sql(str(n), 'duckdb')}, "
            f"{ln_int_sql(str(n + 1), 'duckdb')}"
        ).fetchone()
    )
    assert a < b


def test_ln_python_replication_is_exact(con):
    """Replicate the formula in pure Python (same op order) — results
    must be BIT-identical to DuckDB's evaluation, demonstrating the
    engine-independence the micro-nat snapping relies on."""
    from page_rank_mapreduce_java_spark.functions.text_queries2 import (
        _LN2,
        _SERIES,
    )

    ln2 = float(_LN2)
    series = [float(c) for c in _SERIES]

    def py_ln(n: int) -> float:
        k = n.bit_length() - 1
        m = float(n) / float(1 << k)
        t = (m - 1.0) / (m + 1.0)
        t2 = t * t
        poly = series[-1]
        for c in series[-2::-1]:
            poly = c + t2 * poly
        return float(k) * ln2 + t * poly

    for n in [1, 2, 3, 7, 100, 12345, 10**6, 2**40 - 1, 2**40, 17**13]:
        got = con.execute(f"SELECT {ln_int_sql(str(n), 'duckdb')}").fetchone()[0]
        assert got == py_ln(n), n
