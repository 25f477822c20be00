"""Relational/analytics surface, batch 15 (round 7 close-out): the
point-in-time SCD2 dimension lookup (the warehouse op the as-of family
didn't yet cover: versioned-dim attribution at event time), the weekly
cohort retention triangle, Heaps-law vocabulary growth over corpus
order (a training-data curation diagnostic: is the corpus still
contributing new token types?), and monthly revenue up/down streak
run-lengths.

Beyond-reference extension surface (SURVEY §2.9). Exactness follows
the module-13 contract: every accumulation is integer (cents, counts,
day/week arithmetic); there is NO floating-point step anywhere in this
module, so cross-engine parity is exact by construction.

Scale shape notes per query, but the common rule: the only windows are
over bounded domains (≤10 corpus deciles, ≤#months of the order
calendar) — the fact-scale work is equi-joins and groupBys that AQE can
re-plan, and the SCD2 lookup's row amplification is bounded by the
version count per key (2 here; versions-per-key in general), never a
cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql
from page_rank_mapreduce_java_spark.functions.textfn import words


# --- point-in-time SCD2 lookup ------------------------------------------------

# Each customer gets a deterministic two-version SCD2 history: version 0
# from the beginning of time, version 1 cutting over on a per-customer
# date spread across two years ('1997-01-01' + c_custkey % 731 days), so
# roughly half the fact rows resolve to each version at sf0.1's
# 1995-2001 order span.
_SCD2_CUTOVER_DAYS = 731


def q_join_pit_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each order is attributed the
    customer-version attribute that was valid ON ITS ORDER DATE — the
    SCD2 "as of event time" join that batch-processing warehouses run
    constantly (and that a naive is_current join silently gets wrong
    for restated history). Versions are synthesized deterministically
    (v0 = acctbal cents, v1 = acctbal cents + 1000, cutover spread by
    customer key). Output per order year: n_orders, n_v1 (orders that
    resolved to the post-cutover version), attr_cents (sum of the
    looked-up attribute).

    Scale shape: the lookup is an equi-join on the customer key with
    row amplification bounded by versions-per-key (2), then a validity
    filter — never a range join against an unbounded history; the
    yearly rollup is a bounded groupBy. At 100 TB the dim side is
    dimension-sized × versions and the fact side shuffles once on the
    join key."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        _cents("c_acctbal").alias("bal_cents"),
        F.date_add(
            F.lit("1997-01-01").cast("date"),
            (F.col("c_custkey") % _SCD2_CUTOVER_DAYS).cast("int"),
        ).alias("cutover"),
    )
    # Two-version dim: validity encoded as [valid_from, valid_to) with
    # open ends represented by sentinel dates outside the order span.
    v0 = c.select(
        "c_custkey",
        F.col("bal_cents").alias("attr_cents"),
        F.lit("1900-01-01").cast("date").alias("valid_from"),
        F.col("cutover").alias("valid_to"),
        F.lit(0).cast("long").alias("version"),
    )
    v1 = c.select(
        "c_custkey",
        (F.col("bal_cents") + 1000).alias("attr_cents"),
        F.col("cutover").alias("valid_from"),
        F.lit("2999-01-01").cast("date").alias("valid_to"),
        F.lit(1).cast("long").alias("version"),
    )
    dim = v0.unionByName(v1)
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    hit = o.join(dim, o.o_custkey == dim.c_custkey).filter(
        (F.col("od") >= F.col("valid_from")) & (F.col("od") < F.col("valid_to"))
    )
    return (
        hit.groupBy(F.year("od").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("version").alias("n_v1"),
            F.sum("attr_cents").alias("attr_cents"),
        )
        .select(
            F.col("year").cast("long").alias("year"),
            "n_orders",
            "n_v1",
            F.col("attr_cents").cast("long").alias("attr_cents"),
        )
    )


PIT_SCD2_SQL = f"""
    WITH dim AS (
      SELECT c_custkey, {cents_sql("c_acctbal")} AS attr_cents,
             DATE '1900-01-01' AS valid_from,
             DATE '1997-01-01'
               + CAST(c_custkey % {_SCD2_CUTOVER_DAYS} AS INTEGER) AS valid_to,
             CAST(0 AS BIGINT) AS version
      FROM customer
      UNION ALL
      SELECT c_custkey, {cents_sql("c_acctbal")} + 1000,
             DATE '1997-01-01'
               + CAST(c_custkey % {_SCD2_CUTOVER_DAYS} AS INTEGER),
             DATE '2999-01-01', CAST(1 AS BIGINT)
      FROM customer
    )
    SELECT CAST(year(od) AS BIGINT) AS year,
           COUNT(*) AS n_orders,
           CAST(SUM(version) AS BIGINT) AS n_v1,
           CAST(SUM(attr_cents) AS BIGINT) AS attr_cents
    FROM (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders) o
      JOIN dim ON o_custkey = c_custkey
                AND od >= valid_from AND od < valid_to
    GROUP BY 1
"""


# --- weekly cohort retention triangle -----------------------------------------


def q_events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users cohorted by the ISO week
    of their first event; for each (cohort_week, offset_weeks) the
    number of distinct cohort members active that week — the standard
    product-retention matrix. Output (cohort_week, offset_weeks,
    n_users).

    Scale shape: first-event per user is one keyed min; the triangle is
    a fact→cohort equi-join on user_id then a bounded groupBy
    (#weeks² rows). countDistinct re-shuffles on the composite key —
    two shuffles total, both on high-cardinality keys; no window
    anywhere."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    cohort = e.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        e.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / F.lit(7))
            .cast("long")
            .alias("offset_weeks"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
    WITH wk AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(wk) AS cohort_week FROM wk GROUP BY 1
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT)
             AS offset_weeks,
           CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_users
    FROM wk JOIN cohort ON wk.user_id = cohort.user_id
    GROUP BY 1, 2
"""


# --- Heaps-law vocabulary growth ----------------------------------------------

_VOCAB_BUCKETS = 10


def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: the corpus is cut into 10
    equal-width doc_id buckets (corpus order); each distinct token is
    charged to the bucket where it FIRST appears; output per bucket the
    token volume, the new distinct types introduced, and the cumulative
    vocabulary — the curation diagnostic for "is more data still adding
    vocabulary?". Output (bucket, bucket_tokens, new_types, cum_types).

    Scale shape: token-grain groupBy(token) → min(bucket) is the one
    fact-scale shuffle (map-side combine collapses repeats); the
    min/max doc_id bounds ride a broadcast 1-row aggregate; the
    cumulative sum windows over ≤10 rows (bounded-domain convention).
    All-integer arithmetic — bucket math uses integer div, never
    ntile/percentles."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    bounds = d.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    bucketed = d.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"CAST((doc_id - lo) * {_VOCAB_BUCKETS} DIV (hi - lo + 1) AS BIGINT)"
        ).alias("bucket"),
        F.explode(words(F.col("text"))).alias("tok"),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("bucket_tokens")
    )
    first_seen = (
        bucketed.groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(first_seen, "bucket", "left")
        .select(
            "bucket",
            "bucket_tokens",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .withColumn("cum_types", F.sum("new_types").over(w))
    )


from page_rank_mapreduce_java_spark.functions.text_queries import (  # noqa: E402
    WORDS_SQL,
)

VOCAB_GROWTH_SQL = f"""
    WITH bounds AS (
      SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
    ),
    toks AS (
      SELECT CAST((doc_id - lo) * {_VOCAB_BUCKETS} // (hi - lo + 1) AS BIGINT)
               AS bucket,
             unnest({WORDS_SQL}) AS tok
      FROM documents CROSS JOIN bounds
    ),
    per_bucket AS (
      SELECT bucket, COUNT(*) AS bucket_tokens FROM toks GROUP BY 1
    ),
    first_seen AS (
      SELECT bucket, COUNT(*) AS new_types FROM (
        SELECT tok, MIN(bucket) AS bucket FROM toks GROUP BY 1
      ) GROUP BY 1
    )
    SELECT p.bucket, CAST(bucket_tokens AS BIGINT) AS bucket_tokens,
           CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types,
           CAST(SUM(COALESCE(new_types, 0)) OVER (ORDER BY p.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_types
    FROM per_bucket p LEFT JOIN first_seen f ON p.bucket = f.bucket
"""


# --- monthly revenue up/down streaks ------------------------------------------


def q_orders_updown_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of the monthly revenue direction series:
    consecutive months where revenue rose (dir=1), fell (dir=-1) or
    held (dir=0) are grouped into streaks via the row_number-difference
    trick; output per direction the streak count, the longest streak,
    and the months covered. The first month (no predecessor) is
    excluded. Output (dir, n_streaks, max_len, months).

    Scale shape: the fact scan reduces to the ≤#months relation before
    ANY window; every window here orders the bounded month series
    (bounded-domain convention), and the run-length trick is two rank
    windows + a groupBy on that same ≤#months relation."""
    o = load_table(spark, "orders", sf_dir)
    monthly = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.sum(_cents("o_totalprice")).alias("rev"))
    seq = monthly.select((F.col("y") * 12 + F.col("m")).alias("t"), "rev")
    w = Window.orderBy("t")
    d = (
        seq.withColumn("prev", F.lag("rev").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "t",
            F.signum(F.col("rev") - F.col("prev")).cast("long").alias("dir"),
        )
    )
    grp = d.select(
        "dir",
        (
            F.row_number().over(Window.orderBy("t"))
            - F.row_number().over(Window.partitionBy("dir").orderBy("t"))
        ).alias("g"),
    )
    streaks = grp.groupBy("dir", "g").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("dir").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("max_len"),
        F.sum("len").alias("months"),
    )


UPDOWN_SQL = f"""
    WITH monthly AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS t,
             SUM({cents_sql("o_totalprice")}) AS rev
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT t, CAST(sign(rev - prev) AS BIGINT) AS dir FROM (
        SELECT t, rev, lag(rev) OVER (ORDER BY t) AS prev FROM monthly
      ) WHERE prev IS NOT NULL
    ),
    grp AS (
      SELECT dir,
             row_number() OVER (ORDER BY t)
               - row_number() OVER (PARTITION BY dir ORDER BY t) AS g
      FROM d
    ),
    streaks AS (
      SELECT dir, g, COUNT(*) AS len FROM grp GROUP BY 1, 2
    )
    SELECT dir, COUNT(*) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS max_len,
           CAST(SUM(len) AS BIGINT) AS months
    FROM streaks GROUP BY 1
"""


QUERIES = {
    "join_pit_scd2_lookup": q_join_pit_scd2_lookup,
    "events_retention_triangle": q_events_retention_triangle,
    "text_vocab_growth": q_text_vocab_growth,
    "orders_updown_streaks": q_orders_updown_streaks,
}

ORACLES = {
    "join_pit_scd2_lookup": PIT_SCD2_SQL,
    "events_retention_triangle": RETENTION_SQL,
    "text_vocab_growth": VOCAB_GROWTH_SQL,
    "orders_updown_streaks": UPDOWN_SQL,
}
