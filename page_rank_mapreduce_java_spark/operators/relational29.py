"""Relational/analytics surface, batch 29 (round 8 growth, eleventh
wave): within-session event-type co-occurrence lift, the second-digit
Benford audit, and supplier product-mix entropy on the deterministic-ln
contract.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-28, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness conventions (inherited): integer grains before sums;
terminal ratios either integer `div` or the identical correctly-
rounded double expression; logarithms ONLY through the shared
deterministic-ln rendering (functions/text_queries2.ln_int_sql — the
series formula both engines evaluate bit-identically), snapped to
integer micro-nats per term before any sum."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql


# --- within-session event-type co-occurrence lift -------------------------------

SESSION_GAP_US = 1800 * 1_000_000  # the engine-wide 30-minute gap


def _event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, sess_id, event_type) — lag-gap sessionization with an
    explicit per-event session id (the assignment twin of
    window_sessionize's per-user counts)."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flag = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        > SESSION_GAP_US
    ).cast("long")
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return e.withColumn(
        "sess_id", F.sum(F.coalesce(flag, F.lit(0))).over(w_cum)
    ).select("user_id", "sess_id", "event_type")


def q_events_session_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types co-occur in the SAME session more than chance:
    lift = P(a,b)/(P(a)·P(b)) over sessions, in ppm — the session-grain
    complement to event_type_transitions (sequential adjacency) and
    basket_lift_pairs (order baskets). Output per unordered type pair:
    (type_a, type_b, n_sessions_both, lift_ppm).

    Exactness: integer session counting; the terminal
    (n_both·n_sessions)/(n_a·n_b) is the identical correctly-rounded
    double expression on both engines.

    Scale shape: one user-keyed sessionization window → a
    (user, session, type) distinct → a session-keyed self-join whose
    per-session fan-out is bounded by the TYPE DOMAIN (≤ k types per
    session regardless of session length) → a k²-bounded rollup. The
    distinct (session, type) relation persists: it feeds FOUR
    consumers (total, marginals, both self-join sides) — without the
    persist the sessionization window re-runs 4× (the multimodal
    persist lesson, PERF r6).
    """
    st = _event_sessions(spark, sf_dir).distinct().persist()
    n_sessions = (
        st.select("user_id", "sess_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("_ns"))
    )
    per_type = st.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("_nt")
    )
    a, b = st.alias("a"), st.alias("b")
    both = (
        a.join(b, ["user_id", "sess_id"])
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_sessions_both"))
    )
    lift = (
        (F.col("n_sessions_both").cast("double") * F.col("_ns").cast("double"))
        / (F.col("_na").cast("double") * F.col("_nb").cast("double"))
        * 1e6
    )
    return (
        both.join(
            F.broadcast(per_type.withColumnsRenamed({"t": "type_a", "_nt": "_na"})),
            "type_a",
        )
        .join(
            F.broadcast(per_type.withColumnsRenamed({"t": "type_b", "_nt": "_nb"})),
            "type_b",
        )
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a",
            "type_b",
            F.col("n_sessions_both").cast("long").alias("n_sessions_both"),
            F.round(lift).cast("long").alias("lift_ppm"),
        )
    )


SESSION_LIFT_SQL = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM e),
    st AS (
      SELECT DISTINCT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sess_id,
             event_type
      FROM flagged),
    ns AS (SELECT COUNT(*) AS n FROM
           (SELECT DISTINCT user_id, sess_id FROM st)),
    pt AS (SELECT event_type AS t, COUNT(*) AS nt FROM st GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_sessions_both
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.sess_id = b.sess_id
       AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b,
           CAST(n_sessions_both AS BIGINT) AS n_sessions_both,
           CAST(ROUND(CAST(n_sessions_both AS DOUBLE) * CAST(ns.n AS DOUBLE)
                      / (CAST(pa.nt AS DOUBLE) * CAST(pb.nt AS DOUBLE))
                      * 1e6, 0) AS BIGINT) AS lift_ppm
    FROM pairs
      JOIN pt pa ON pairs.type_a = pa.t
      JOIN pt pb ON pairs.type_b = pb.t
      CROSS JOIN ns
"""


# --- second-digit Benford audit ----------------------------------------------------

# Expected second-significant-digit distribution (Benford 1938):
# P(d₂=d) = Σ_{d₁=1..9} log₁₀(1 + 1/(10·d₁+d)). Rendered as round-trip
# float reprs at import so both engines compare against the identical
# ppm constants.
_BENFORD2_PPM = [
    int(round(1e6 * sum(math.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))))
    for d in range(10)
]


def q_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-significant-digit Benford audit of order totals — the
    forensic screen that survives first-digit-aware manipulation
    (fabricators who know Benford's law still rarely match the second
    digit). Output per digit 0-9: (digit, n, share_ppm, expected_ppm,
    dev_ppm = share − expected).

    Exactness: digit extraction is integer/string arithmetic on exact
    cents; shares are integer `div`; the expected constants are the
    identical rendered literals in both plans.

    Scale shape: one narrow projection + a 10-bucket aggregate with
    map-side partials.
    """
    o = load_table(spark, "orders", sf_dir).select(
        cents("o_totalprice").alias("v")
    )
    digit = F.substring(F.col("v").cast("string"), 2, 1).cast("long")
    counted = (
        o.filter(F.col("v") >= 10)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counted.agg(F.sum("n").alias("_t"))
    exp_map = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD2_PPM]), F.col("digit").cast("int") + 1
    )
    return (
        counted.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit"),
            F.col("n").cast("long").alias("n"),
            F.expr("CAST(1000000 * n div _t AS BIGINT)").alias("share_ppm"),
            exp_map.cast("long").alias("expected_ppm"),
            (
                F.expr("CAST(1000000 * n div _t AS BIGINT)")
                - exp_map.cast("long")
            ).alias("dev_ppm"),
        )
    )


def _benford2_sql() -> str:
    exp_cases = " ".join(
        f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD2_PPM)
    )
    return f"""
    WITH v AS (SELECT {cents_sql("o_totalprice")} AS v FROM orders),
    counted AS (
      SELECT CAST(substr(CAST(v AS VARCHAR), 2, 1) AS BIGINT) AS digit,
             COUNT(*) AS n
      FROM v WHERE v >= 10 GROUP BY 1),
    t AS (SELECT SUM(n) AS tn FROM counted)
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST(1000000 * n // tn AS BIGINT) AS share_ppm,
           CAST(CASE digit {exp_cases} END AS BIGINT) AS expected_ppm,
           CAST(1000000 * n // tn AS BIGINT)
             - CAST(CASE digit {exp_cases} END AS BIGINT) AS dev_ppm
    FROM counted, t
"""


# --- supplier product-mix entropy ---------------------------------------------------

MIX_TOP_N = 25
MIX_MIN_ITEMS = 20


def q_supplier_mix_entropy_top25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 most-diversified suppliers by Shannon entropy of their
    part-TYPE mix (H = ln n − (Σ c·ln c)/n over per-type lineitem
    counts) — the specialization/diversification screen behind sourcing
    risk (a supplier with H ≈ 0 ships one thing). Suppliers with fewer
    than MIX_MIN_ITEMS lineitems are unscored. Output:
    (s_suppkey, n_items, n_types, entropy_micronat).

    Exactness: the deterministic-ln contract (text_queries2.ln_int_sql
    — bit-identical series on both engines); each c·ln(c) term snaps
    to integer micro-nats BEFORE the per-supplier sum (order-
    independent), and H = (1e6·ln n as integer) − (Σterm div n) is
    integer arithmetic from there. Top-25 via TakeOrderedAndProject,
    ties on the supplier key.

    Scale shape: broadcast part dim onto the fact scan → one
    (supplier, type) count → one supplier-keyed rollup → top-25; no
    windows at all.
    """
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    p = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_type").alias("ptype")
    )
    ct = (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("l_suppkey", "ptype")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term = F.expr(
        f"CAST(ROUND(c * {ln_int_sql('c', 'spark')} * 1e6, 0) AS BIGINT)"
    )
    per_s = (
        ct.select("l_suppkey", F.col("c"), term.alias("term"))
        .groupBy("l_suppkey")
        .agg(
            F.sum("c").alias("n_items"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum("term").alias("_sum_clnc"),
        )
        .filter(F.col("n_items") >= MIX_MIN_ITEMS)
    )
    h = F.expr(
        f"CAST(ROUND({ln_int_sql('n_items', 'spark')} * 1e6, 0) AS BIGINT)"
        " - CAST(_sum_clnc div n_items AS BIGINT)"
    )
    return (
        per_s.select(
            F.col("l_suppkey").cast("long").alias("s_suppkey"),
            F.col("n_items").cast("long").alias("n_items"),
            F.col("n_types").cast("long").alias("n_types"),
            h.alias("entropy_micronat"),
        )
        .orderBy(F.desc("entropy_micronat"), F.asc("s_suppkey"))
        .limit(MIX_TOP_N)
    )


MIX_ENTROPY_SQL = f"""
    WITH ct AS (
      SELECT l_suppkey, p_type AS ptype, COUNT(*) AS c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2),
    per_s AS (
      SELECT l_suppkey,
             SUM(c) AS n_items,
             COUNT(*) AS n_types,
             SUM(CAST(ROUND(c * {ln_int_sql('c', 'duckdb')} * 1e6, 0)
                      AS BIGINT)) AS sum_clnc
      FROM ct GROUP BY 1
      HAVING SUM(c) >= {MIX_MIN_ITEMS})
    SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
           CAST(n_items AS BIGINT) AS n_items,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(ROUND({ln_int_sql('n_items', 'duckdb')} * 1e6, 0) AS BIGINT)
             - CAST(sum_clnc // n_items AS BIGINT) AS entropy_micronat
    FROM per_s
    ORDER BY entropy_micronat DESC, s_suppkey
    LIMIT {MIX_TOP_N}
"""


QUERIES = {
    "events_session_type_lift": q_events_session_type_lift,
    "benford_second_digit": q_benford_second_digit,
    "supplier_mix_entropy_top25": q_supplier_mix_entropy_top25,
}

ORACLES = {
    "events_session_type_lift": SESSION_LIFT_SQL,
    "benford_second_digit": _benford2_sql(),
    "supplier_mix_entropy_top25": MIX_ENTROPY_SQL,
}
