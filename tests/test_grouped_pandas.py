"""applyInPandas escape hatch: UDF path must agree with the relational path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.grouped_pandas import (
    trend_by_group,
    zscore_by_group_pandas,
    zscore_by_group_relational,
)


def test_zscore_pandas_matches_relational(spark, sf_dir):
    e = load_table(spark, "events", sf_dir)
    a = {
        (r.user_id, r.value): r.z
        for r in zscore_by_group_pandas(e, "user_id", "value").collect()
    }
    b = {
        (r.user_id, r.value): r.z
        for r in zscore_by_group_relational(e, "user_id", "value").collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


def test_trend_by_group_recovers_known_slope(spark):
    rows = [(g, float(x), 3.0 * x + g) for g in (1, 2) for x in range(10)]
    df = spark.createDataFrame(rows, "g LONG, x DOUBLE, y DOUBLE")
    got = {r.g: (r.slope, r.intercept, r.n) for r in trend_by_group(df, "g", "x", "y").collect()}
    for g in (1, 2):
        slope, intercept, n = got[g]
        assert slope == pytest.approx(3.0, abs=1e-9)
        assert intercept == pytest.approx(float(g), abs=1e-9)
        assert n == 10


def test_trend_degenerate_single_point(spark):
    df = spark.createDataFrame([(1, 5.0, 7.0)], "g LONG, x DOUBLE, y DOUBLE")
    r = trend_by_group(df, "g", "x", "y").first()
    assert r.slope == 0.0 and r.intercept == 7.0 and r.n == 1
