"""Batch-31 additions: first-value → LTV correlation, domain-violation
audit. Value-level correctness is oracle-gated (tools/check_oracle.py
at sf0.001 + sf0.01 under shuffle.partitions 3/17/32); these tests pin
structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.operators.relational31 import (
    DOMAIN_RULES,
    q_customer_first_value_ltv_corr,
    q_dq_domain_violations,
)


def test_first_ltv_corr_counts_repeat_customers(spark, sf_dir):
    r = q_customer_first_value_ltv_corr(spark, sf_dir).head()
    repeat = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .count()
        .filter(F.col("count") >= 2)
        .count()
    )
    assert r.n_customers == repeat
    assert -1_000_000 <= r.corr_ppm <= 1_000_000


def test_domain_audit_runs_every_rule_clean_fixture(spark, sf_dir):
    rows = {r.rule: r for r in q_dq_domain_violations(spark, sf_dir).collect()}
    assert set(rows) == {rule for rule, _, _ in DOMAIN_RULES}
    for r in rows.values():
        assert r.n_checked > 0
        assert r.violation_ppm == 1_000_000 * r.n_violations // r.n_checked
    # the synthetic fixture satisfies its own schema contract
    assert all(r.n_violations == 0 for r in rows.values())
