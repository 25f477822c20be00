"""Semantics of the as-of join operator on literal frames: inclusive
backward match, no-match behavior for inner vs left, multi-payload carry,
and determinism under left-side ts ties."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-05"), 100),  # after both orders -> latest (k=1,01-03)
            (1, _ts("2024-01-03"), 101),  # exactly at an order ts -> inclusive
            (1, _ts("2024-01-01"), 102),  # before any order -> no match
            (2, _ts("2024-06-01"), 103),  # key with no right rows at all
        ],
        "k long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-02"), 7, "a"),
            (1, _ts("2024-01-03"), 9, "b"),
        ],
        "k long, ts timestamp, oid long, tag string",
    )
    return left, right


def test_backward_inclusive_inner(spark, frames):
    left, right = frames
    got = {
        r["event_id"]: (r["oid"], r["tag"])
        for r in asof_join(
            left, right, on="k", ts="ts", payload=["oid", "tag"]
        ).collect()
    }
    # 102 (before any order) and 103 (unmatched key) drop under inner
    assert got == {100: (9, "b"), 101: (9, "b")}


def test_left_keeps_unmatched_with_null_payload(spark, frames):
    left, right = frames
    rows = asof_join(
        left, right, on="k", ts="ts", payload=["oid", "tag"], how="left"
    ).collect()
    got = {r["event_id"]: r["oid"] for r in rows}
    assert got == {100: 9, 101: 9, 102: None, 103: None}
    assert len(rows) == left.count()


def test_left_ts_ties_each_get_same_match(spark, frames):
    _, right = frames
    left = right.sparkSession.createDataFrame(
        [(1, _ts("2024-01-04"), 201), (1, _ts("2024-01-04"), 202)],
        "k long, ts timestamp, event_id long",
    )
    got = {
        r["event_id"]: r["oid"]
        for r in asof_join(
            left, right, on="k", ts="ts", payload=["oid"], tiebreak=["event_id"]
        ).collect()
    }
    assert got == {201: 9, 202: 9}


def test_rejects_unknown_how(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, on="k", ts="ts", payload=["oid"], how="full").collect()


# --- property: cross-oracle vs pandas.merge_asof ---------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_lefts = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50)), min_size=1, max_size=25
)
_rights = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50), st.integers(0, 999)),
    min_size=1,
    max_size=25,
).map(lambda rows: list({(k, t): (k, t, v) for k, t, v in rows}.values()))
# rights dedup on (key, ts): the operator's contract leaves right-side
# (key, ts) ties to the caller (pandas.merge_asof would pick the last).


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lefts=_lefts, rights=_rights)
def test_asof_matches_pandas_merge_asof(spark, lefts, rights):
    import pandas as pd

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, ts long, row_id long"
    )
    right = spark.createDataFrame(rights, "k long, ts long, v long")
    got = {
        r["row_id"]: r["v"]
        for r in asof_join(
            left, right, on="k", ts="ts", payload=["v"], how="left",
            tiebreak=["row_id"],
        ).collect()
    }
    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], columns=["k", "ts", "row_id"]
    ).sort_values(["ts", "row_id"], kind="mergesort")
    rp = pd.DataFrame(rights, columns=["k", "ts", "v"]).sort_values(
        ["ts"], kind="mergesort"
    )
    exp_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    exp = {
        int(r.row_id): (None if pd.isna(r.v) else int(r.v))
        for r in exp_df.itertuples()
    }
    assert got == exp


def test_null_payload_right_row_still_matches_inner(spark):
    """A right row whose payload value is legitimately NULL must still
    count as a match for inner semantics (the marker column, not payload
    nullability, decides matched-ness); the NULL column itself carries
    the previous observation per the documented LOCF contract."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-04"), 500)], "k long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01"), 7, "old"), (1, _ts("2024-01-03"), None, "new")],
        "k long, ts timestamp, oid long, tag string",
    )
    rows = asof_join(left, right, on="k", ts="ts", payload=["oid", "tag"]).collect()
    assert len(rows) == 1  # matched despite oid IS NULL on the latest row
    assert rows[0]["tag"] == "new"
    assert rows[0]["oid"] == 7  # per-column LOCF: NULL skips to prior value


def test_null_payload_only_right_row_matches(spark):
    """Even when the ONLY preceding right row is all-NULL payload, inner
    keeps the left row (pre-marker versions silently dropped it)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-02"), 1)], "k long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01"), None, None)],
        "k long, ts timestamp, oid long, tag string",
    )
    rows = asof_join(left, right, on="k", ts="ts", payload=["oid", "tag"]).collect()
    assert len(rows) == 1
    assert rows[0]["oid"] is None and rows[0]["tag"] is None
