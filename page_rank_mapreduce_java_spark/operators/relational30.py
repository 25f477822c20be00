"""Relational/analytics surface, batch 30 (round 8 growth, twelfth
wave): the quantity × price-decile 2-D profile heatmap and the
part supplier-redundancy histogram (single-sourcing risk).

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-29, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness: pure integer counting; decile edges are nearest-rank picks
on the two-pass global ranking chassis (no interpolation); ppm via
integer `div` (truncation parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.operators.ranking import global_ntile


# --- quantity × price-decile heatmap -----------------------------------------

QTY_BAND = 10  # quantity bands of width 10 (domain 1..50 → 5 bands)


def q_lineitem_qty_price_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D profile of the fact table: quantity band × extended-price
    decile cell counts — the joint-distribution heatmap that catches
    what the two marginals (agg_value_histogram, percentiles) hide
    (e.g. high-quantity lines concentrating in low price deciles =
    bulk-discount structure). Output per cell:
    (qty_band, price_decile, n, cell_ppm).

    Exactness: the price decile is the SQL-standard NTILE(10) over the
    (cents, orderkey, linenumber) total order, computed scalably by
    the certified arithmetic global-ntile chassis (bucket sizes differ
    by at most one, larger buckets first — identical tie policy in the
    oracle's NTILE); quantity bands are exact integer division; ppm is
    integer `div`.

    Scale shape: one range exchange (the global-ranking chassis under
    global_ntile) + one bounded (5×10 cells) aggregate with map-side
    partials; no single-task window.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_quantity").cast("long").alias("q"),
        cents("l_extendedprice").alias("p"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    tiled = global_ntile(
        li, 10, [F.asc("p"), F.asc("ok"), F.asc("ln")], out_col="price_decile"
    )
    cells = (
        tiled.groupBy(
            F.expr(f"(q - 1) div {QTY_BAND}").alias("qty_band"),
            F.col("price_decile"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.agg(F.sum("n").alias("_t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("qty_band").cast("long").alias("qty_band"),
        F.col("price_decile").cast("long").alias("price_decile"),
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(1000000 * n div _t AS BIGINT)").alias("cell_ppm"),
    )


HEATMAP_SQL = f"""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             {cents_sql("l_extendedprice")} AS p,
             l_orderkey AS ok, l_linenumber AS ln
      FROM lineitem),
    tiled AS (
      SELECT q, NTILE(10) OVER (ORDER BY p, ok, ln) AS price_decile
      FROM li),
    cells AS (
      SELECT (q - 1) // {QTY_BAND} AS qty_band, price_decile,
             COUNT(*) AS n
      FROM tiled GROUP BY 1, 2),
    t AS (SELECT SUM(n) AS tn FROM cells)
    SELECT CAST(qty_band AS BIGINT) AS qty_band,
           CAST(price_decile AS BIGINT) AS price_decile,
           CAST(n AS BIGINT) AS n,
           CAST(1000000 * n // tn AS BIGINT) AS cell_ppm
    FROM cells, t
"""


# --- part supplier-redundancy histogram -----------------------------------------


def q_part_supplier_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sourcing-redundancy histogram: how many parts are supplied by
    exactly k distinct suppliers (observed in the order history) — the
    single-sourcing-risk census (k = 1 parts are supply-chain single
    points of failure; TPC-H q16 counts suppliers per part attribute
    slice, this is the corpus-wide distribution). Output per k:
    (n_suppliers, n_parts, share_ppm).

    Exactness: pure integer counting; ppm via integer `div`.

    Scale shape: one (part, supplier) distinct (map-side combinable on
    the high-cardinality part key) → a part-keyed count → the bounded
    k domain; no joins, no windows.
    """
    ps = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    per_part = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    hist = per_part.groupBy("n_suppliers").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    tot = hist.agg(F.sum("n_parts").alias("_t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.expr("CAST(1000000 * n_parts div _t AS BIGINT)").alias("share_ppm"),
    )


REDUNDANCY_SQL = """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    per_part AS (
      SELECT l_partkey, COUNT(*) AS n_suppliers FROM ps GROUP BY 1),
    hist AS (
      SELECT n_suppliers, COUNT(*) AS n_parts FROM per_part GROUP BY 1),
    t AS (SELECT SUM(n_parts) AS tn FROM hist)
    SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(n_parts AS BIGINT) AS n_parts,
           CAST(1000000 * n_parts // tn AS BIGINT) AS share_ppm
    FROM hist, t
"""


QUERIES = {
    "lineitem_qty_price_heatmap": q_lineitem_qty_price_heatmap,
    "part_supplier_redundancy": q_part_supplier_redundancy,
}

ORACLES = {
    "lineitem_qty_price_heatmap": HEATMAP_SQL,
    "part_supplier_redundancy": REDUNDANCY_SQL,
}
