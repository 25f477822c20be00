"""Batch-30 additions: qty × price-decile heatmap, supplier-redundancy
histogram. Value-level correctness is oracle-gated
(tools/check_oracle.py at sf0.001 + sf0.01 under shuffle.partitions
3/17/32); these tests pin structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational30 import (
    q_lineitem_qty_price_heatmap,
    q_part_supplier_redundancy,
)


def test_heatmap_covers_every_row_with_balanced_deciles(spark, sf_dir):
    rows = q_lineitem_qty_price_heatmap(spark, sf_dir).collect()
    n = load_table(spark, "lineitem", sf_dir).count()
    assert sum(r.n for r in rows) == n
    assert {r.price_decile for r in rows} == set(range(1, 11))
    assert all(0 <= r.qty_band <= 4 for r in rows)
    # NTILE balance: decile populations differ by at most one
    per_decile: dict[int, int] = {}
    for r in rows:
        per_decile[r.price_decile] = per_decile.get(r.price_decile, 0) + r.n
    assert max(per_decile.values()) - min(per_decile.values()) <= 1


def test_redundancy_accounts_for_every_part(spark, sf_dir):
    rows = q_part_supplier_redundancy(spark, sf_dir).collect()
    assert rows
    n_parts = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in rows) == n_parts
    assert all(r.n_suppliers >= 1 for r in rows)
    assert sum(r.share_ppm for r in rows) <= 1_000_000  # floor division
