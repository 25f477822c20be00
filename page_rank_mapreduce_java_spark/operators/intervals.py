"""Interval-overlap join as a reusable operator (interval algebra).

Spark has no interval/overlap join: the naive formulation
``a JOIN b ON a.start < b.end AND b.start < a.end`` has no equi-key, so
Catalyst plans a (possibly key-anchored) nested-loop — quadratic per
key group. The scalable realization chunks the value axis, the same
boundary trick as operators/ranking.banded_range_count:

1. every interval is replicated into each width-W chunk it touches
   (``sequence(floor(s/W), floor((e-1)/W))`` — replication factor is
   1 + span/W, bounded for bounded spans);
2. candidate pairing is an EQUI-join on (key, chunk) — one shuffle,
   never a cross product;
3. a pair overlapping across several shared chunks is deduplicated
   arithmetically, not with DISTINCT: it is kept only in the chunk
   containing max(a.start, b.start) (the overlap's left edge), which
   both sides share by construction.

Parallelism scales with the time axis (#chunks × #keys); pick W a few
multiples of the typical span so replication stays near 1. This is the
standard interval-index decomposition (bioinformatics overlap joins,
Databricks' range-join hint) in pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_self_overlap_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    start: Column,
    end: Column,
    chunk_width: int,
) -> DataFrame:
    """All pairs of rows (same ``key_cols``, ``a.id < b.id``) whose
    half-open integer intervals [start, end) overlap. Returns the paired
    frame with columns ``key_cols + [a_<id>, b_<id>, overlap_len]``.

    ``start``/``end`` must be integer-valued Columns (epoch days/seconds
    — exact arithmetic, no float drift)."""
    w = int(chunk_width)
    base = df.select(
        *key_cols, F.col(id_col).alias("_id"),
        start.cast("long").alias("_s"), end.cast("long").alias("_e"),
    ).filter(F.col("_e") > F.col("_s"))
    spans = base.withColumn(
        "_c",
        F.explode(
            F.sequence(F.floor(F.col("_s") / w), F.floor((F.col("_e") - 1) / w))
        ),
    )
    a, b = spans.alias("a"), spans.alias("b")
    key_eq = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
    cond = key_eq + [
        F.col("a._c") == F.col("b._c"),
        F.col("a._id") < F.col("b._id"),
        F.col("a._s") < F.col("b._e"),
        F.col("b._s") < F.col("a._e"),
        # count each overlapping pair exactly once: only in the chunk
        # holding the overlap's left edge
        F.floor(F.greatest(F.col("a._s"), F.col("b._s")) / w) == F.col("a._c"),
    ]
    overlap = F.least(F.col("a._e"), F.col("b._e")) - F.greatest(
        F.col("a._s"), F.col("b._s")
    )
    return a.join(b, _and(cond)).select(
        *[F.col(f"a.{k}").alias(k) for k in key_cols],
        F.col("a._id").alias(f"a_{id_col}"),
        F.col("b._id").alias(f"b_{id_col}"),
        overlap.cast("long").alias("overlap_len"),
    )


def _and(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
