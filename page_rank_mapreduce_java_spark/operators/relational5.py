"""Relational operator surface, batch 5: TPC-H completion suite.

Round 1 shipped q1/q3/q5/q10/q18 (relational.py, relational4.py); this
batch adapts the REST of the classic 22 to the fixture schema. The
fixture is a slim TPC-H (TESTDATA.md): no ``partsupp`` table and no
``l_shipmode``/``l_commitdate``/``l_receiptdate``/``o_comment``/
``c_phone``/``p_container`` columns, so queries that need them are
*adapted* — the join/subquery/aggregation SHAPE of each original is
preserved (that shape is what exercises the optimizer), with predicates
re-targeted at columns the fixture has. For the partsupp-pivoted trio
the supplier⇄part relation comes from lineitem (as q16 already does):
q2's supplycost becomes the pair's minimum observed unit price, q11's
availqty·supplycost becomes the pair's shipped value, q20's availqty
becomes the pair's all-time shipped quantity. With those substitutions
all 22 classic shapes are covered.

The reference (a 417-LoC Hadoop PageRank — SURVEY.md §0) has none of
this surface; the suite exists because the brief's north star is a
complete analytics engine a reference user could switch onto.

Determinism conventions follow relational4.py: money in exact integer
cents (functions.money), revenue in integer cent-percent units summed
exactly, ratios emitted as exact numerator/denominator BIGINT pairs
(never a float division whose rendering could drift between engines),
LIMITs fully tie-broken.

Scale notes (100 TB design point):
- Every date/flag predicate sits directly on the scan (PushedFilters).
- EXISTS / NOT-EXISTS shapes (q4, q21, q22) are expressed as left-semi /
  left-anti joins — Spark's own decorrelation target — never as
  collect-and-filter.
- Correlated scalar aggregates (q17's per-part avg quantity) become an
  aggregate + equi-join, the same decorrelation DuckDB performs.
- Group-wise maxima (q15) use a broadcast 1-row scalar, not a window
  over an unpartitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.functions.money import cents_sql as _c

_REV_SQL = f"{_c('l_extendedprice')} * (100 - {_c('l_discount')})"


def _revenue_cp() -> F.Column:
    """Exact integer revenue in cent-percent units (see relational4.py)."""
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: for each target part, the EUROPE supplier(s)
    offering it at minimum cost — the correlated MIN subquery of the
    original, decorrelated into a per-part minimum re-joined with tie
    preservation (same device as q15, per-group instead of global).
    Cost = min observed unit price (exact integer division of cents by
    integral quantity; both engines use integral div, no float quotient).
    Dims (supplier⋈nation⋈region, target parts) broadcast; the one
    fact-sized shuffle is the (part, supplier) aggregation. Top 100
    fully tie-broken like the original."""
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    target = (
        load_table(spark, "part", sf_dir)
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 15))
        .select("p_partkey")
    )
    uc = F.expr(f"{_c('l_extendedprice')} div CAST(l_quantity AS BIGINT)")
    cost = (
        l.select("l_partkey", "l_suppkey", uc.alias("uc"))
        .join(F.broadcast(eur.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("uc").alias("unit_cost_cents"))
        .join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey"))
    )
    min_cost = cost.groupBy("p_partkey").agg(F.min("unit_cost_cents").alias("mc"))
    return (
        cost.join(min_cost, "p_partkey")
        .filter(F.col("unit_cost_cents") == F.col("mc"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            _cents("s_acctbal").alias("s_acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "unit_cost_cents",
        )
        .orderBy(F.desc("s_acctbal_cents"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


IMPORTANT_NATION = "NATION_3"
IMPORTANT_PERMILLE = 1  # parts worth > 0.1% of the nation's shipped value


def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: the parts representing a significant fraction of
    one nation's shipped value — group-sum HAVING > fraction × the SAME
    sum unfiltered (the original's scalar subquery over an identical
    FROM clause). The global total rides as a broadcast 1-row aggregate
    computed FROM the grouped result (one pass over the fact); the
    threshold compares integer·1000 > integer — no float fraction."""
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == IMPORTANT_NATION)
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    value = (
        l.join(F.broadcast(nat_supp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    total = value.agg(F.sum("value_cents").alias("t"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("t") * IMPORTANT_PERMILLE)
        .select("l_partkey", "value_cents")
    )


def q_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: per line-class, how many critical- vs
    normal-priority orders it carried — the two conditional counts in one
    aggregate. The fixture has no l_shipmode, so the class is the
    ship-delay bucket (≤60 days = fast, else slow), which preserves the
    original's point: a CASE-driven double count over a year of the
    lineitem⋈orders join, year predicate pushed to the line scan."""
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60), "slow"
            ).otherwise("fast").alias("ship_bucket"),
            high.cast("long").alias("is_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("is_high")).alias("low_line_count"),
        )
    )


def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: revenue from three OR-ed conjunctive predicate
    groups, each spanning BOTH sides of the lineitem⋈part join (brand and
    size from part, quantity from the line). The per-side halves of each
    conjunct push into their scans; the residual OR evaluates post-join.
    One broadcast join, one 1-row aggregate — the query exists to prove
    disjunctive pushdown, not join strategy."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(g1 | g2 | g3)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_revenue_cp()).alias("revenue_cp"),
        )
    )


SURPLUS_NATION = "NATION_1"


def q_q20_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: suppliers of one nation holding a surplus of
    name-matched parts — the doubly-nested IN of the original. availqty
    becomes the (part, supplier) all-time shipped quantity; the threshold
    (half the part's 1997 shipped quantity) keeps the original's
    half-of-one-year form. Both inner aggregates are widget-part-sized
    (the name filter semi-joins BEFORE any aggregation); quantities are
    integral, compared as qty·2 > qty97 — all integer."""
    l = load_table(spark, "lineitem", sf_dir)
    wparts = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    lw = l.join(F.broadcast(wparts), l.l_partkey == F.col("p_partkey"), "semi")
    q97 = (
        lw.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty97"))
    )
    ps = lw.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    surplus_supp = (
        ps.join(q97, "l_partkey")
        .filter(F.col("qty") * 2 > F.col("qty97"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == SURPLUS_NATION)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(surplus_supp, s.s_suppkey == F.col("l_suppkey"), "semi")
        .select("s_suppkey", "s_name")
    )


def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: order counts per priority for one quarter, keeping
    only orders where EXISTS a late line (shipped >60 days after the
    order date — the fixture's substitute for commitdate<receiptdate).

    The EXISTS compiles to a left-semi join on o_orderkey: lineitem never
    multiplies the order rows, and the date predicate prunes orders at
    the scan before the shuffle."""
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    l = load_table(spark, "lineitem", sf_dir)
    late = l.join(
        o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey")
    ).filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
    return (
        o.join(late.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6: the single-scan revenue-forecast aggregate. Every
    predicate (shipdate year, discount band, quantity cap) pushes into
    the parquet reader; no join, no wide exchange — just a partial+final
    aggregate of one exact integer expression. Revenue here is
    price×discount (the forecast delta), kept in cent-percent units."""
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (_cents("l_discount").between(5, 7))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_cents("l_extendedprice") * _cents("l_discount")).alias("revenue_cp"))
    )


def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: bilateral trade volume between two nations by ship
    year — supplier nation on the line side, customer nation through
    orders, both restricted to a 2-nation set with the cross-pair filter
    applied post-join. nation/supplier broadcast; the one big shuffle is
    lineitem⋈orders."""
    pair = ("NATION_3", "NATION_7")
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (F.col("supp_nation").isin(*pair))
            & (F.col("cust_nation").isin(*pair))
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(F.sum(_revenue_cp()).alias("revenue_cp"))
    )


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: PROMO-part share of ASIA-customer revenue by order
    year. The share is emitted as exact BIGINT numerator/denominator
    (promo revenue, total revenue) — a float quotient would be the one
    nondeterministic rendering in the pipeline. Dims broadcast down the
    snowflake (part is filtered only in the numerator CASE, so the scan
    reads 2 columns)."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _revenue_cp()).otherwise(F.lit(0))).alias(
                "promo_rev_cp"
            ),
            F.sum(_revenue_cp()).alias("total_rev_cp"),
        )
    )


def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit by (supplier nation, order year) for parts
    matching a name pattern. The fixture has no ps_supplycost, so profit
    is gross revenue — the 5-table join tree and the LIKE-filtered part
    dimension (the original's defining features) are intact."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").contains("widget"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(F.sum(_revenue_cp()).alias("profit_cp"))
    )


def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: the customer order-count distribution — a LEFT
    join (customers with zero qualifying orders must appear in the c=0
    bucket) followed by a second aggregation over the first's result.
    The filter stands in for the original's o_comment NOT LIKE. Two
    shuffles, both key-partitioned; the second input is
    customer-cardinality, not order-cardinality."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: promo-type revenue share for one month, as exact
    numerator/denominator BIGINTs (see q8 note). part joins shuffle-side
    (it grows with SF); the month predicate prunes lineitem at the
    scan."""
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _revenue_cp()).otherwise(F.lit(0))).alias(
                "promo_rev_cp"
            ),
            F.sum(_revenue_cp()).alias("total_rev_cp"),
        )
    )


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: the supplier(s) achieving maximum revenue in one
    quarter. The original's view + scalar-subquery-on-MAX becomes an
    aggregate joined against its own broadcast 1-row maximum — ALL tied
    maxima survive, exactly like the SQL. No unpartitioned window
    anywhere (the classic trap for this query at scale)."""
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, "supplier", sf_dir)
    rev = l.groupBy("l_suppkey").agg(F.sum(_revenue_cp()).alias("total_rev_cp"))
    top = rev.agg(F.max("total_rev_cp").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev_cp == F.col("max_rev"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(F.col("l_suppkey").alias("s_suppkey"), "s_name", "total_rev_cp")
    )


def q_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: how many distinct suppliers serve each
    (brand, type, size-bucket) — the supplier⇄part relation comes from
    lineitem (the fixture's substitute for partsupp), one brand excluded.
    countDistinct runs as the standard two-phase expand/aggregate; the
    part dimension's predicate prunes before the join."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        l.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: revenue locked in small-quantity lines of one
    brand — lines below 50% of their part's average quantity. The
    correlated scalar subquery decorrelates into a per-part aggregate
    equi-joined back (broadcast: one row per part of one brand). Output
    is the exact cents sum plus the qualifying line count."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#7")
    lp = l.join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"))
    avg_qty = lp.groupBy("l_partkey").agg(
        # 20·avg in exact integer units: quantities are integral doubles,
        # so 2·sum·10 vs count compares without float division.
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")
    )
    return (
        lp.join(F.broadcast(avg_qty.withColumnRenamed("l_partkey", "ap")), F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") * 2 * F.col("n_lines") < F.col("sum_qty"))
        .agg(
            F.sum(_cents("l_extendedprice")).alias("small_rev_cents"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


def q_q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: suppliers who were the SOLE late shipper in
    multi-supplier orders. Lateness = shipped >90 days after the order
    date (fixture substitute for receipt>commit). The EXISTS (another
    supplier in the order) and NOT EXISTS (another LATE supplier) become
    semi/anti joins on o_orderkey against per-order supplier sets —
    order-cardinality inputs, no fact-side multiplication. Top 25 by
    count, fully tie-broken."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    lo = (
        l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias("late"),
        )
    )
    # Per-(order, supplier) pre-aggregate FIRST: two countDistincts over
    # the line rows would plan an Expand (2× line volume through the
    # shuffle); one groupBy to pair granularity makes the per-order
    # counts plain aggregates and is reused for the final supplier count.
    pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("long")).alias("late")
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late_supp")
    )
    solo_late_orders = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    return (
        pair.filter(F.col("late") == 1)
        .join(solo_late_orders.select("l_orderkey"), "l_orderkey", "semi")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(F.col("l_suppkey").alias("s_suppkey"), "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(25)
    )


def q_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: per nation-group, positive-balance customers above
    the average balance with NO orders since a cutoff. The scalar
    average broadcasts; the NOT EXISTS is a left-anti join against the
    recent-orders key set. acctbal sums in exact cents."""
    c = load_table(spark, "customer", sf_dir)
    recent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_cents("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(_cents("c_acctbal") * F.col("n") > F.col("s"))
        .join(recent.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_cents("c_acctbal")).alias("totacctbal_cents"),
        )
    )


_PROFILE_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
)


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema profiler — the data-quality sweep a pipeline runs before
    training: per column, row/null/exact-distinct counts. One UNION
    branch per column rather than one wide multi-countDistinct aggregate:
    Spark plans N count-distincts over one input as an Expand (N× the
    scan's rows through the shuffle — the SimHash row-blowup mistake);
    independent branches each read ONE parquet column (pruned scan) and
    aggregate it alone, so total input ≈ one full-table columnar scan and
    every branch is exact. All-integer output, no rendering drift."""
    l = load_table(spark, "lineitem", sf_dir)
    parts = [
        l.select(F.col(c).alias("v")).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").isNull().cast("long")).alias("n_nulls"),
            F.countDistinct("v").alias("n_distinct"),
        )
        for c in _PROFILE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES = {
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q11_important_parts": q_q11_important_parts,
    "q12_shipmode_priority": q_q12_shipmode_priority,
    "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
    "q20_surplus_suppliers": q_q20_surplus_suppliers,
    "q4_order_priority": q_q4_order_priority,
    "profile_lineitem": q_profile_lineitem,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q7_volume_shipping": q_q7_volume_shipping,
    "q8_market_share": q_q8_market_share,
    "q9_product_profit": q_q9_product_profit,
    "q13_customer_distribution": q_q13_customer_distribution,
    "q14_promo_effect": q_q14_promo_effect,
    "q15_top_supplier": q_q15_top_supplier,
    "q16_supplier_part_count": q_q16_supplier_part_count,
    "q17_small_quantity": q_q17_small_quantity,
    "q21_late_suppliers": q_q21_late_suppliers,
    "q22_dormant_customers": q_q22_dormant_customers,
}

_PROFILE_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
        CAST(SUM(CAST({c} IS NULL AS BIGINT)) AS BIGINT) AS n_nulls,
        COUNT(DISTINCT {c}) AS n_distinct FROM lineitem"""
    for c in _PROFILE_COLS
)

ORACLES = {
    "profile_lineitem": _PROFILE_SQL,
    "q2_min_cost_supplier": f"""
        WITH eur AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ), cost AS (
          SELECT l_partkey AS p_partkey, l_suppkey,
                 MIN({_c('l_extendedprice')} // CAST(l_quantity AS BIGINT))
                   AS unit_cost_cents
          FROM lineitem
          WHERE l_suppkey IN (SELECT s_suppkey FROM eur)
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_type = 'LARGE' AND p_size <= 15)
          GROUP BY 1, 2
        )
        SELECT {_c('s_acctbal')} AS s_acctbal_cents, s_name, n_name,
               p_partkey, unit_cost_cents
        FROM cost JOIN eur ON l_suppkey = s_suppkey
        WHERE unit_cost_cents = (SELECT MIN(c2.unit_cost_cents) FROM cost c2
                                 WHERE c2.p_partkey = cost.p_partkey)
        ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q11_important_parts": f"""
        WITH v AS (
          SELECT l_partkey, SUM({_c('l_extendedprice')}) AS value_cents
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = '{IMPORTANT_NATION}'
          )
          GROUP BY 1
        )
        SELECT l_partkey, CAST(value_cents AS BIGINT) AS value_cents FROM v
        WHERE value_cents * 1000 > (SELECT SUM(value_cents) FROM v) * {IMPORTANT_PERMILLE}
    """,
    "q12_shipmode_priority": """
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 'slow' ELSE 'fast' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "q19_disjunctive_revenue": f"""
        SELECT COUNT(*) AS n_lines, CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cp
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q20_surplus_suppliers": f"""
        WITH wparts AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
        q97 AS (
          SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT) AS qty97
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND l_partkey IN (SELECT p_partkey FROM wparts)
          GROUP BY 1
        ), ps AS (
          SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM wparts)
          GROUP BY 1, 2
        )
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{SURPLUS_NATION}'
          AND s_suppkey IN (
            SELECT l_suppkey FROM ps JOIN q97 USING (l_partkey)
            WHERE ps.qty * 2 > qty97
          )
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": f"""
        SELECT CAST(SUM({_c('l_extendedprice')} * {_c('l_discount')}) AS BIGINT) AS revenue_cp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND {_c('l_discount')} BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS ship_year,
               CAST(SUM({_REV_SQL}) AS BIGINT) AS revenue_cp
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND n1.n_name IN ('NATION_3', 'NATION_7')
          AND n2.n_name IN ('NATION_3', 'NATION_7')
          AND n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    "q8_market_share": f"""
        SELECT EXTRACT(year FROM o_orderdate) AS order_year,
               CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS BIGINT) AS promo_rev_cp,
               CAST(SUM({_REV_SQL}) AS BIGINT) AS total_rev_cp
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN part ON l_partkey = p_partkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS order_year,
               CAST(SUM({_REV_SQL}) AS BIGINT) AS profit_cp
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q14_promo_effect": f"""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS BIGINT) AS promo_rev_cp,
               CAST(SUM({_REV_SQL}) AS BIGINT) AS total_rev_cp
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev_cp
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT l_suppkey AS s_suppkey, s_name, CAST(total_rev_cp AS BIGINT) AS total_rev_cp
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_cp = (SELECT MAX(total_rev_cp) FROM rev)
    """,
    "q16_supplier_part_count": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        GROUP BY 1, 2, 3
    """,
    "q17_small_quantity": f"""
        WITH lp AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#7'
        ), avg_qty AS (
          SELECT l_partkey AS ap, SUM(l_quantity) AS sum_qty,
                 COUNT(*) AS n_lines
          FROM lp GROUP BY 1
        )
        SELECT CAST(SUM({_c('l_extendedprice')}) AS BIGINT) AS small_rev_cents,
               COUNT(*) AS n_small_lines
        FROM lp JOIN avg_qty ON l_partkey = ap
        WHERE l_quantity * 2 * n_lines < sum_qty
    """,
    "q21_late_suppliers": """
        WITH lo AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ), per_order AS (
          SELECT l_orderkey,
                 COUNT(DISTINCT l_suppkey) AS n_supp,
                 COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
          FROM lo GROUP BY 1
        )
        SELECT s_suppkey, s_name, numwait FROM (
          SELECT l_suppkey AS s_suppkey, COUNT(*) AS numwait FROM (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lo
            WHERE late AND l_orderkey IN (
              SELECT l_orderkey FROM per_order
              WHERE n_supp > 1 AND n_late_supp = 1
            )
          ) GROUP BY 1
        ) JOIN supplier USING (s_suppkey)
        ORDER BY numwait DESC, s_suppkey
        LIMIT 25
    """,
    "q22_dormant_customers": f"""
        WITH avg_bal AS (
          SELECT SUM({_c('c_acctbal')}) AS s, COUNT(*) AS n
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey % 5 AS cntrycode,
               COUNT(*) AS numcust,
               CAST(SUM({_c('c_acctbal')}) AS BIGINT) AS totacctbal_cents
        FROM customer, avg_bal
        WHERE {_c('c_acctbal')} * n > s
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY 1
    """,
}
