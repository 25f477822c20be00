"""Relational operator surface, batch 11 (round 5): deterministic sketch
structures (count-min, Bloom) made cross-engine exact via the md5 hash
family, plus gaps-and-islands streaks, per-entity trend fitting, VWAP,
and incremental aggregate maintenance.

Sketches here follow the repo's sketch convention (functions/hashes.py:
KMV, MinHash, SimHash): hash rows through md5 so DuckDB computes the
IDENTICAL structure — the estimate is engine-independent and the oracle
certifies construction + query, not just row counts. (Cormode &
Muthukrishnan, "An Improved Data Stream Summary: The Count-Min Sketch
and its Applications", J. Algorithms 2005; Bloom, CACM 1970 — public
literature.)

Canonicalization: all-integer outputs; ratios ride integer
cross-multiplication or explicit integer division (both engines floor on
non-negative operands); no float ever orders or hashes a result.

Scale shape notes are per-query; the common theme: every sketch is a
BOUNDED relation (d·w counters, m bits) built by one map-side-combined
aggregate over the fact table, then probed with equi-joins — the exact
pattern that replaces a shuffle-heavy DISTINCT/join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.hashes import md5_long, md5_long_sql
from page_rank_mapreduce_java_spark.functions.money import cents as _cents, cents_sql

# --- count-min sketch ---------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_PROBE_MOD = 97  # probe keys: l_partkey % CMS_PROBE_MOD == 0


def q_sketch_cms_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over part purchase frequencies, probed against
    exact counts: (partkey, exact, cms_est) for the probe cohort. The
    estimate is min over CMS_DEPTH rows of the hashed counter — always
    ≥ exact (one-sided error), and bit-identical across engines because
    the row hashes are md5-derived.

    Scale shape: the sketch is ONE groupBy over a CMS_DEPTH-exploded
    fact scan into d·w = 256 counters (map-side combine does almost all
    the work); the probe is a broadcast join of 256 counters against the
    cohort's d hash slots. At 100 TB this is the frequency oracle you
    keep in memory instead of a full-key count table."""
    l = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_partkey").alias("k")
    )
    rows = l.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (md5_long(F.concat_ws(":", F.lit(i), F.col("k"))) % CMS_WIDTH).alias(
                            "slot"
                        ),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select(F.col("h.i").alias("i"), F.col("h.slot").alias("slot"))
    counters = rows.groupBy("i", "slot").agg(F.count(F.lit(1)).alias("c"))

    probe = l.filter(F.col("k") % CMS_PROBE_MOD == 0)
    exact = probe.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    slots = exact.select(
        "k",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (md5_long(F.concat_ws(":", F.lit(i), F.col("k"))) % CMS_WIDTH).alias(
                            "slot"
                        ),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select("k", "exact", F.col("h.i").alias("i"), F.col("h.slot").alias("slot"))
    return (
        slots.join(F.broadcast(counters), ["i", "slot"])
        .groupBy(F.col("k").alias("partkey"), "exact")
        .agg(F.min("c").alias("cms_est"))
    )


def _cms_hash_sql(i: int, key: str) -> str:
    inner = f"{i} || ':' || {key}"
    return f"{md5_long_sql(inner)} % {CMS_WIDTH}"


_CMS_ROWS = " UNION ALL ".join(
    f"SELECT {i} AS i, {_cms_hash_sql(i, 'k')} AS slot FROM l"
    for i in range(CMS_DEPTH)
)
_CMS_PROBE_SLOTS = " UNION ALL ".join(
    f"SELECT k, exact, {i} AS i, {_cms_hash_sql(i, 'k')} AS slot FROM exact"
    for i in range(CMS_DEPTH)
)

CMS_SQL = f"""
    WITH l AS (SELECT l_partkey AS k FROM lineitem),
    rows_ AS ({_CMS_ROWS}),
    counters AS (SELECT i, slot, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
    exact AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact FROM l
              WHERE k % {CMS_PROBE_MOD} = 0 GROUP BY 1),
    slots AS ({_CMS_PROBE_SLOTS})
    SELECT s.k AS partkey, s.exact, CAST(MIN(c.c) AS BIGINT) AS cms_est
    FROM slots s JOIN counters c ON s.i = c.i AND s.slot = c.slot
    GROUP BY 1, 2
"""


# --- Bloom filter semi-join ---------------------------------------------------

BLOOM_BITS = 256
BLOOM_HASHES = 3
BLOOM_SPLIT = "1997-01-01"  # members: custkeys ordering before; probes: after


def q_sketch_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join audit: build an m=256-bit Bloom over the
    customers active BEFORE the split date, probe the customers active
    after it, and report one summary row — members, bits set, probes,
    Bloom hits, true members among probes, and false positives (Bloom
    hits that are not true members). Certifies the sketch END TO END:
    both engines must set the identical bits and misfire on the
    identical keys.

    Scale shape: the filter is a ≤ m-row distinct over hashed members
    (map-side combinable), broadcast to the probe side; probes check
    membership with one equi-join + a count==k test — the pre-shuffle
    row-elimination pattern behind join_bitmap_semi_orders."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("k"),
        (F.to_date("o_orderdate") < F.lit(BLOOM_SPLIT)).alias("is_member"),
    )
    members = o.filter("is_member").select("k").distinct()
    probes = o.filter(~F.col("is_member")).select("k").distinct()

    def hash_bits(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            F.explode(
                F.array(
                    *[
                        (md5_long(F.concat_ws(":", F.lit(j), F.col("k"))) % BLOOM_BITS).alias(
                            "b"
                        )
                        for j in range(BLOOM_HASHES)
                    ]
                )
            ).alias("bit"),
        )

    bits = hash_bits(members).select("bit").distinct()
    probe_bits = hash_bits(probes)
    hits = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nb"))
        .filter(F.col("nb") == BLOOM_HASHES)
        .select("k")
    )
    true_members = probes.join(members, "k", "left_semi")
    false_pos = hits.join(members, "k", "left_anti")
    stats = [
        members.agg(F.count(F.lit(1)).alias("v")).select(F.lit("n_members").alias("s"), "v"),
        bits.agg(F.count(F.lit(1)).alias("v")).select(F.lit("n_bits_set").alias("s"), "v"),
        probes.agg(F.count(F.lit(1)).alias("v")).select(F.lit("n_probes").alias("s"), "v"),
        hits.agg(F.count(F.lit(1)).alias("v")).select(F.lit("n_bloom_hits").alias("s"), "v"),
        true_members.agg(F.count(F.lit(1)).alias("v")).select(
            F.lit("n_true_members").alias("s"), "v"
        ),
        false_pos.agg(F.count(F.lit(1)).alias("v")).select(
            F.lit("n_false_pos").alias("s"), "v"
        ),
    ]
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out.select(F.col("s").alias("stat"), F.col("v").cast("long").alias("value"))


def _bloom_hash_union(src: str) -> str:
    parts = []
    for j in range(BLOOM_HASHES):
        h = md5_long_sql(f"{j} || ':' || k")
        parts.append(f"SELECT k, {h} % {BLOOM_BITS} AS bit FROM {src}")
    return " UNION ALL ".join(parts)

BLOOM_SQL = f"""
    WITH o AS (SELECT o_custkey AS k,
                      CAST(o_orderdate AS DATE) < DATE '{BLOOM_SPLIT}' AS is_member
               FROM orders),
    members AS (SELECT DISTINCT k FROM o WHERE is_member),
    probes AS (SELECT DISTINCT k FROM o WHERE NOT is_member),
    mbits AS ({_bloom_hash_union('members')}),
    bits AS (SELECT DISTINCT bit FROM mbits),
    pbits AS ({_bloom_hash_union('probes')}),
    hits AS (
      SELECT p.k FROM pbits p JOIN bits b ON p.bit = b.bit
      GROUP BY p.k HAVING COUNT(*) = {BLOOM_HASHES}),
    tm AS (SELECT k FROM probes WHERE k IN (SELECT k FROM members)),
    fp AS (SELECT k FROM hits WHERE k NOT IN (SELECT k FROM members))
    SELECT 'n_members' AS stat, CAST(COUNT(*) AS BIGINT) AS value FROM members
    UNION ALL SELECT 'n_bits_set', COUNT(*) FROM bits
    UNION ALL SELECT 'n_probes', COUNT(*) FROM probes
    UNION ALL SELECT 'n_bloom_hits', COUNT(*) FROM hits
    UNION ALL SELECT 'n_true_members', COUNT(*) FROM tm
    UNION ALL SELECT 'n_false_pos', COUNT(*) FROM fp
"""


# --- gaps-and-islands streaks -------------------------------------------------


def q_events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands pattern (row_number delta groups runs of adjacent
    days): (user_id, n_active_days, longest_streak). The engagement
    feature every retention model wants.

    Scale shape: distinct day per user (one shuffle), a row_number
    window over the HIGH-cardinality user key, a (user, island) count,
    and a per-user max — everything keyed on user_id."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = F.date_sub(F.col("day"), F.row_number().over(w))
    runs = (
        e.withColumn("g", grp)
        .groupBy("user_id", "g")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return runs.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
    )


STREAKS_SQL = """
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    r AS (SELECT user_id, day,
                 day - CAST(row_number() OVER (PARTITION BY user_id
                                               ORDER BY day) AS INTEGER) AS g
          FROM d),
    runs AS (SELECT user_id, g, COUNT(*) AS len FROM r GROUP BY 1, 2)
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY 1
"""


# --- per-entity trend ---------------------------------------------------------


def q_supplier_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier OLS revenue trend over monthly buckets, entirely in
    integers: x = months since 1992-01, y = month revenue cents; output
    the slope as the exact integer pair (num, den) with
    slope = num/den = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) — per-entity trend
    features without a single float (the ols_price_on_quantity
    convention applied at the keyed grain).

    Scale shape: fact → (supplier, month) grain in one map-side-combined
    aggregate, then a second keyed aggregate for the co-moments —
    parallelism tracks the supplier population."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey",
        (
            (F.year("l_shipdate") - F.lit(1992)) * 12 + F.month("l_shipdate") - 1
        ).cast("long").alias("x"),
        _cents(F.col("l_extendedprice")).alias("rev"),
    )
    monthly = l.groupBy("l_suppkey", "x").agg(F.sum("rev").alias("y"))
    m = monthly.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        "suppkey",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("slope_den"),
    )


SUPPLIER_TREND_SQL = f"""
    WITH l AS (
      SELECT l_suppkey,
             CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1
                  AS BIGINT) AS x,
             {cents_sql('l_extendedprice')} AS rev
      FROM lineitem),
    monthly AS (SELECT l_suppkey, x, SUM(rev) AS y FROM l GROUP BY 1, 2),
    m AS (SELECT l_suppkey AS suppkey, COUNT(*) AS n, SUM(x) AS sx,
                 SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM monthly GROUP BY 1)
    SELECT suppkey, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
    FROM m
"""


# --- daily VWAP ---------------------------------------------------------------


def q_lineitem_daily_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per ship day (VWAP): integer
    numerator Σ(price_cents·qty), denominator Σqty, and the milli-cent
    quotient via integer division — the market-data aggregate shape on
    the trade ledger.

    Scale shape: one map-side-combined aggregate to the calendar-bounded
    day grain; the division happens on the bounded result."""
    l = load_table(spark, "lineitem", sf_dir).select(
        F.to_date("l_shipdate").alias("day"),
        _cents(F.col("l_extendedprice")).alias("pc"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    d = l.groupBy("day").agg(
        F.sum(F.col("pc") * F.col("q")).alias("num"),
        F.sum("q").alias("den"),
    )
    return d.select(
        "day",
        "num",
        "den",
        F.expr("(num * 1000) div den").alias("vwap_millicents"),
    )


VWAP_SQL = f"""
    SELECT CAST(l_shipdate AS DATE) AS day,
           CAST(SUM({cents_sql('l_extendedprice')} * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS num,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS den,
           CAST((SUM({cents_sql('l_extendedprice')} * CAST(l_quantity AS BIGINT))
                 * 1000)
                // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vwap_millicents
    FROM lineitem GROUP BY 1
"""


# --- incremental aggregate maintenance ---------------------------------------

IVM_SPLIT = "1998-06-01"


def q_merge_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a per-customer rollup: the BASE
    aggregate (orders before IVM_SPLIT) merged with the DELTA aggregate
    (orders on/after) through a full-outer coalesce-sum — the
    delta-merge pattern that keeps a 100 TB materialized rollup fresh
    without rescanning history. Output must equal the direct aggregate
    over the full table, which is exactly what the oracle computes — the
    query certifies merge = recompute.

    Scale shape: two filtered aggregates (partition-prunable by date at
    scale) + one full-outer join on the high-cardinality customer key."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("custkey"),
        _cents(F.col("o_totalprice")).alias("tc"),
        (F.to_date("o_orderdate") < F.lit(IVM_SPLIT)).alias("is_base"),
    )
    base = o.filter("is_base").groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("tc").alias("cents")
    )
    delta = o.filter(~F.col("is_base")).groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("tc").alias("cents")
    )
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, F.col("b.custkey") == F.col("d.custkey"), "full_outer")
        .select(
            F.coalesce(F.col("b.custkey"), F.col("d.custkey")).alias("custkey"),
            (
                F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("b.cents"), F.lit(0))
                + F.coalesce(F.col("d.cents"), F.lit(0))
            ).alias("total_cents"),
        )
    )


IVM_SQL = f"""
    SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS total_cents
    FROM orders GROUP BY 1
"""


def q_agg_p90_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p90 of event value per type on the scalable
    grouped-quantile chassis (the agg_median pattern): one global
    two-pass row number over (type, value, event_id), broadcast
    per-type offsets/counts, and the p90 read from position
    ceil(0.9·n) — never a per-group buffering percentile aggregate
    (low-cardinality groups make those buffers fact-scale), never a
    low-cardinality window partition."""
    from page_rank_mapreduce_java_spark.operators.ranking import global_row_number

    e = load_table(spark, "events", sf_dir).select("event_type", "value", "event_id")
    r = global_row_number(
        e, [F.asc("event_type"), F.asc("value"), F.asc("event_id")], out_col="_grn"
    )
    stats = r.groupBy("event_type").agg(
        (F.min("_grn") - 1).alias("_off"), F.count(F.lit(1)).alias("_tot")
    )
    pos = r.join(F.broadcast(stats), "event_type").withColumn(
        "_pos", F.col("_grn") - F.col("_off")
    )
    # nearest-rank p90: position ceil(0.9*n) = (9n + 9) div 10
    hit = pos.filter(F.col("_pos") == F.expr("(9 * _tot + 9) div 10"))
    return hit.select(
        "event_type",
        F.col("_tot").alias("n"),
        F.round(F.col("value"), 6).alias("p90_value"),
    )


P90_BY_TYPE_SQL = """
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (ORDER BY event_type, value, event_id) AS grn
      FROM events),
    stats AS (SELECT event_type, MIN(grn) - 1 AS off, COUNT(*) AS tot
              FROM r GROUP BY 1)
    SELECT r.event_type, CAST(s.tot AS BIGINT) AS n,
           ROUND(r.value, 6) AS p90_value
    FROM r JOIN stats s ON r.event_type = s.event_type
    WHERE r.grn - s.off = (9 * s.tot + 9) // 10
"""


QUERIES = {
    "agg_p90_by_type": q_agg_p90_by_type,
    "sketch_cms_part_counts": q_sketch_cms_part_counts,
    "sketch_bloom_semijoin": q_sketch_bloom_semijoin,
    "events_user_streaks": q_events_user_streaks,
    "supplier_revenue_trend": q_supplier_revenue_trend,
    "lineitem_daily_vwap": q_lineitem_daily_vwap,
    "merge_incremental_rollup": q_merge_incremental_rollup,
}

ORACLES = {
    "agg_p90_by_type": P90_BY_TYPE_SQL,
    "sketch_cms_part_counts": CMS_SQL,
    "sketch_bloom_semijoin": BLOOM_SQL,
    "events_user_streaks": STREAKS_SQL,
    "supplier_revenue_trend": SUPPLIER_TREND_SQL,
    "lineitem_daily_vwap": VWAP_SQL,
    "merge_incremental_rollup": IVM_SQL,
}
