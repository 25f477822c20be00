"""Multi-dimensional data layout: Morton (Z-order) clustering.

Sorting a table by ONE column gives perfect data skipping on that
column and none on any other; interleaving the bits of two key columns
(the Morton curve) gives every file a small bounding box in BOTH
dimensions, so min/max footer stats prune scans filtered on either —
the technique behind lakehouse `OPTIMIZE ZORDER BY`. Pure integer bit
arithmetic (shiftleft/AND/OR), identical in Spark and DuckDB, so the
code column itself is oracle-checkable.

Scale: the clustered write is one range-exchange on the morton column
(repartitionByRange + sortWithinPartitions) — the same cost as any
sorted write; the benefit is paid back on every filtered scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` to even bit positions 0,2,..,30
    (classic mask-shift ladder)."""
    out = v.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def morton_interleave16(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit non-negative integers: x's bits
    at even positions, y's at odd. Monotone along the Z-curve."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1)).cast("long")


def _spread16_sql(expr: str) -> str:
    out = f"({expr} & 65535)"
    for shift, mask in _SPREAD_MASKS:
        out = f"(({out} | ({out} << {shift})) & {mask})"
    return out


def morton_interleave16_sql(x: str, y: str) -> str:
    """DuckDB rendering of ``morton_interleave16`` (same ladder)."""
    return f"CAST(({_spread16_sql(x)} | ({_spread16_sql(y)} << 1)) AS BIGINT)"


def write_morton_clustered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    partitions: int,
) -> None:
    """Write parquet clustered along the Z-curve of (x, y): range-
    partition + sort on the morton code, so each output file covers a
    compact rectangle in both dimensions and footer min/max stats prune
    scans filtered on either column."""
    (
        df.withColumn("_z", morton_interleave16(x, y))
        .repartitionByRange(partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
