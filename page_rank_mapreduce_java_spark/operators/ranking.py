"""Scalable global ranking — total-order analytics without the
single-task window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole input
through ONE task: fine on a dimension table, a scale-killer on a fact
table (VERDICT r1 wrong #4). The operators here re-express global
row_number / ntile / dense_rank as the classic two-pass range-partitioned
ranking (the reference's total sort, SURVEY §2.7 O1, generalized — the
DataFrame form of RDD ``zipWithIndex``):

1. range-partition + sort on the order keys (``repartitionByRange`` — the
   same machinery a total-sort ``orderBy`` uses);
2. within-partition positions from ``monotonically_increasing_id`` (upper
   bits = partition id, lower 33 bits = row index in partition — valid up
   to 2^33 rows/partition);
3. count rows per range partition (tiny aggregate), prefix-sum the counts
   into offsets (a window over ≤ num-partitions rows), broadcast back.

Exactly ONE full-data exchange (the range partitioning); the only
single-task step operates on one row per partition. The order keys MUST
form a total order (append a unique tiebreak column) or ranks at
partition boundaries are nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PARTITION_MASK = (1 << 33) - 1


def global_row_number(
    df: DataFrame, order: list[Column], out_col: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Append a 1-based global row number following ``order`` (which must
    be a total order — include a unique tiebreak)."""
    spark = df.sparkSession
    n_parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # monotonically_increasing_id is non-deterministic to Catalyst, so the
    # projection cannot be pushed below the sort — the id is assigned in
    # sorted order, which is what makes the arithmetic below valid.
    d = (
        df.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (F.col("_off") + F.col("_mid").bitwiseAND(F.lit(_PARTITION_MASK)) + 1).cast("long"),
        )
        .drop("_pid", "_mid", "_off")
    )


def global_ntile(
    df: DataFrame, n: int, order: list[Column], out_col: str = "bucket"
) -> DataFrame:
    """SQL-standard NTILE(n) over a global order, scalably: bucket sizes
    differ by at most one, larger buckets first. Derived arithmetically
    from the two-pass global row number plus the total count."""
    ranked = global_row_number(df, order, out_col="_rn")
    total = ranked.agg(F.count(F.lit(1)).alias("_total"))
    base = (F.col("_total") - (F.col("_total") % n)) / n  # total div n
    rem = F.col("_total") % n
    big = rem * (base + 1)  # rows living in the (base+1)-sized buckets
    bucket = (
        F.when(F.col("_rn") <= big, F.ceil(F.col("_rn") / (base + 1)))
        .otherwise(rem + F.ceil((F.col("_rn") - big) / base))
        .cast("long")
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket)
        .drop("_rn", "_total")
    )


def global_dense_rank(
    df: DataFrame, order_col: Column, value_alias: str, out_col: str = "rnk", ascending: bool = False
) -> DataFrame:
    """DENSE_RANK over one global key, scalably: rank the DISTINCT values
    (a far smaller relation) with the two-pass row number, then join the
    ranks back on the value — no whole-table single-partition window."""
    vals = df.select(order_col.alias(value_alias)).distinct()
    direction = F.asc(value_alias) if ascending else F.desc(value_alias)
    ranked_vals = global_row_number(vals, [direction], out_col=out_col)
    return df.join(ranked_vals, order_col == F.col(value_alias)).drop(value_alias)
