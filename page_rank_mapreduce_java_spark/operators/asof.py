"""AS-OF join as a reusable operator.

Spark has no ASOF JOIN (the reference has no general join operator at all
— SURVEY.md SS2.4); the scalable realization is the union-sort pattern:
tag both sides, shuffle ONCE on the key, sort within partitions by
(ts, side), and carry the most recent right-side payload forward with a
running ``last(..., ignorenulls)`` window. Cost envelope = one hash
exchange + one within-partition sort — the same as a sort-merge join,
with no per-row range probe and no interval blow-up. This is the
standard formulation used by time-series stores (kdb's aj, Flink's
temporal join) expressed in pure DataFrame ops.

Skew note: a celebrity key concentrates its whole timeline in one task.
If a key's combined row count can exceed a task's memory, pre-bucket by
time range (coarse ts bucket appended to the key) and stitch the bucket
boundaries with a second pass; at typical key cardinalities AQE's
post-shuffle coalescing keeps partitions even.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: Sequence[str],
    how: str = "inner",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach the latest right row with the same ``on``
    key and ``right.ts <= left.ts`` (backward as-of, inclusive).

    ``payload``: right-side columns to carry (must not collide with left
    columns). ``how``: 'inner' drops unmatched left rows, 'left' keeps
    them with null payload. ``tiebreak``: extra left-side columns added to
    the sort for deterministic output when (on, ts) repeats on the left.

    Right-side ties on (on, ts) are NOT resolved here — pre-aggregate the
    right side (e.g. keep max id per (key, ts)) so "latest" is well
    defined; otherwise whichever duplicate sorts last wins.

    NULL payload values: each payload column is carried forward
    independently with ``last(..., ignorenulls=True)``, so a right row
    whose value in some payload column is NULL contributes the *previous*
    row's value for that column (per-column last-observation-carried-
    forward). Match detection does not depend on payload nullability — an
    internal always-non-null marker decides inner vs unmatched.
    """
    left_cols = [c for c in left.columns if c not in (on, ts)]
    rights = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(1).alias("_m"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in payload],
    )
    lefts = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("int").alias("_m"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    # side 0 (right) sorts before side 1 (left) at equal ts => inclusive <=
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", *[F.col(c) for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = rights.unionByName(lefts)
    for c in (*payload, "_m"):
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        F.col("_k").alias(on), F.col("_ts").alias(ts), *left_cols, *payload
    )
