"""Relational/analytics surface, batch 31 (round 8 growth, thirteenth
wave): first-order-value → lifetime-value correlation (the acquisition-
quality signal) and the declarative domain-violation audit.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-30, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness: exact cent/integer sufficient statistics in
DECIMAL(38,0)/HUGEINT; the correlation terminal is the identical
correctly-rounded a/√(b·c) double expression (the corr_pairs
contract); violation counts are pure integers with `div` ppm."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql


# --- first-order value vs lifetime value ------------------------------------


def q_customer_first_value_ltv_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Does a customer's FIRST order value predict their remaining
    lifetime value? Pearson correlation between first-order cents and
    the sum of all SUBSEQUENT orders' cents, over customers with ≥ 2
    orders — the acquisition-quality question behind first-purchase
    incentives. One row: (n_customers, corr_ppm).

    Exactness: per-customer first/rest split is positional (the
    (date, orderkey) total order per customer); the five sufficient
    statistics ride DECIMAL(38,0)/HUGEINT; only the terminal a/(√b·√c)
    is floating — the identical correctly-rounded expression on both
    engines (the corr_pairs contract).

    Scale shape: one row_number window per CUSTOMER (high-cardinality
    keyed window convention) → one customer-keyed aggregate → one
    1-row aggregate with map-side partials.
    """
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        cents("o_totalprice").alias("v"),
        "o_orderdate",
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn("rn", F.row_number().over(w))
    per_c = (
        seq.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.when(F.col("rn") == 1, F.col("v")).otherwise(0)).alias(
                "first_v"
            ),
            F.sum(F.when(F.col("rn") > 1, F.col("v")).otherwise(0)).alias(
                "rest_v"
            ),
        )
        .filter(F.col("k") >= 2)
    )
    xd = F.col("first_v").cast("decimal(38,0)")
    yd = F.col("rest_v").cast("decimal(38,0)")
    s = per_c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(yd * yd).alias("_syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    rho = F.try_divide(
        nd * sxy - sx * sy,
        F.sqrt(F.greatest(nd * sxx - sx * sx, F.lit(0.0)))
        * F.sqrt(F.greatest(nd * syy - sy * sy, F.lit(0.0))),
    )
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.coalesce(F.round(rho * 1e6).cast("long"), F.lit(-2_000_000)).alias(
            "corr_ppm"
        ),
    )


FIRST_LTV_SQL = f"""
    WITH seq AS (
      SELECT o_custkey, {cents_sql("o_totalprice")} AS v,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders),
    per_c AS (
      SELECT o_custkey,
             SUM(CASE WHEN rn = 1 THEN v ELSE 0 END) AS first_v,
             SUM(CASE WHEN rn > 1 THEN v ELSE 0 END) AS rest_v
      FROM seq GROUP BY 1
      HAVING COUNT(*) >= 2),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(first_v AS HUGEINT)) AS sx,
             SUM(CAST(rest_v AS HUGEINT)) AS sy,
             SUM(CAST(first_v AS HUGEINT) * first_v) AS sxx,
             SUM(CAST(first_v AS HUGEINT) * rest_v) AS sxy,
             SUM(CAST(rest_v AS HUGEINT) * rest_v) AS syy
      FROM per_c)
    SELECT CAST(n AS BIGINT) AS n_customers,
           COALESCE(CAST(ROUND(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (SQRT(GREATEST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                * SQRT(GREATEST(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE),
                                0.0)))
             * 1e6, 0) AS BIGINT), -2000000) AS corr_ppm
    FROM s
"""


# --- declarative domain-violation audit ---------------------------------------

# (rule name, table, SQL boolean violation predicate — identical text in
# both engines; every predicate is pure integer/column arithmetic)
DOMAIN_RULES: list[tuple[str, str, str]] = [
    ("lineitem.quantity_in_1_50", "lineitem",
     "l_quantity < 1 OR l_quantity > 50"),
    ("lineitem.discount_in_0_10pct", "lineitem",
     "l_discount < 0 OR l_discount > 0.1"),
    ("lineitem.tax_in_0_8pct", "lineitem", "l_tax < 0 OR l_tax > 0.08"),
    ("lineitem.price_positive", "lineitem", "l_extendedprice <= 0"),
    ("orders.total_positive", "orders", "o_totalprice <= 0"),
    ("events.value_non_negative", "events", "value < 0"),
    ("documents.n_chars_matches_text", "documents",
     "n_chars <> length(text)"),
]


def q_dq_domain_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative domain-assertion audit: one row per rule with its
    violation count — the schema-contract check a pipeline runs on
    every ingest batch (rules are SQL predicates shared verbatim by
    both engines, so the audit itself is oracle-checked). Output:
    (rule, n_checked, n_violations, violation_ppm).

    Exactness: pure integer counting; ppm via integer `div`.

    Scale shape: one conditional-count aggregate per table (each rule
    rides its table's single scan — rules on the same table share it
    via one aggregate), unioned into a bounded rule relation.
    """
    by_table: dict[str, list[tuple[str, str]]] = {}
    for rule, table, pred in DOMAIN_RULES:
        by_table.setdefault(table, []).append((rule, pred))
    out = None
    for table, rules in by_table.items():
        t = load_table(spark, table, sf_dir)
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, (_, pred) in enumerate(rules):
            aggs.append(
                F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(f"_v{i}")
            )
        agg = t.agg(*aggs)
        stack = ", ".join(
            f"'{rule}', _v{i}" for i, (rule, _) in enumerate(rules)
        )
        part = agg.select(
            F.expr(
                f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
            ),
            F.col("_n").alias("n_checked"),
        ).select(
            "rule",
            F.col("n_checked").cast("long").alias("n_checked"),
            F.col("n_violations").cast("long").alias("n_violations"),
            F.expr(
                "CAST(1000000 * n_violations div n_checked AS BIGINT)"
            ).alias("violation_ppm"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def _domain_sql() -> str:
    parts = []
    for rule, table, pred in DOMAIN_RULES:
        parts.append(f"""
    SELECT '{rule}' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(1000000 * SUM(CASE WHEN {pred} THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS violation_ppm
    FROM {table}""")
    return "\nUNION ALL\n".join(parts)


QUERIES = {
    "customer_first_value_ltv_corr": q_customer_first_value_ltv_corr,
    "dq_domain_violations": q_dq_domain_violations,
}

ORACLES = {
    "customer_first_value_ltv_corr": FIRST_LTV_SQL,
    "dq_domain_violations": _domain_sql(),
}
