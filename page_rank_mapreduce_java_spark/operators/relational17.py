"""Relational/analytics surface, batch 17 (round 8): the streaming
LATE-DATA AUDIT family — the batch twin of what a Structured Streaming
deployment must know before choosing a watermark — plus per-supplier
drawdown and the per-language embedding-norm audit.

Beyond-reference extension surface (SURVEY §2.9). The events fixture
arrives perfectly ordered (measured: zero events whose event_id order
disagrees with ts order), so a raw late-arrival audit would be a
forever-empty relation — no evidence at all (the r7 MAD-threshold
lesson). These queries therefore model arrival skew with DETERMINISTIC
disorder injection — arrival time = event time + (event_id % 7) · 37 s
— the same convention join_null_safe_nations uses for unknown-dimension
rows: a reproducible, oracle-mirrorable stand-in for the real
out-of-orderness a 100 TB ingest exhibits.

Exactness: all lateness arithmetic is integer microseconds
(unix_micros / epoch_us — the only epoch rendering that is exactly an
integer on BOTH engines; epoch() in DuckDB is a fractional double whose
BIGINT cast ROUNDS while Spark's unix_timestamp floors) reduced to
whole seconds by positive integer division. No floats anywhere.

Scale shape: the watermark simulation is a GLOBAL running max over
arrival order — fact-scale, so it rides the two-pass chassis
(operators/ranking.global_running_max: range partition → partition-
local window → broadcast prefix offsets), never Window.orderBy()
over the corpus. Everything downstream is one map-side-combined
aggregate over bounded groups (days / delay thresholds / event types /
suppliers / languages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents as _cents
from page_rank_mapreduce_java_spark.operators.ranking import (
    global_running_max,
)

# Deterministic arrival-skew injection: event_id % 7 spreads jitter
# uniformly over {0, 37, 74, ..., 222} seconds, enough to shuffle
# arrival order across the fixture's ~9 s median inter-event gap while
# staying oracle-mirrorable.
ARRIVAL_JITTER_MOD = 7
ARRIVAL_JITTER_STEP_S = 37

_ARR_SQL = f"""
      SELECT epoch_us(ts) AS ts_us,
             epoch_us(ts) + (event_id % {ARRIVAL_JITTER_MOD})
                 * {ARRIVAL_JITTER_STEP_S} * 1000000 AS arr_us,
             event_id, CAST(ts AS DATE) AS day
      FROM events"""

_LATE_SQL = f"""
    b AS ({_ARR_SQL}),
    w AS (
      SELECT day, ts_us,
             MAX(ts_us) OVER (ORDER BY arr_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
      FROM b),
    lat AS (
      SELECT day, (GREATEST(wm - ts_us, 0)) // 1000000 AS late_s
      FROM w)"""


def _event_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame[day, late_s]: per event, whole seconds by which the
    simulated watermark (max event time seen so far in arrival order,
    inclusive — identical flag set to the exclusive form because the
    inclusive max only differs when the row is on time) exceeds the
    event's own time."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        F.col("ts").cast("date").alias("day"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    b = e.withColumn(
        "arr_us",
        F.col("ts_us")
        + (F.col("event_id") % ARRIVAL_JITTER_MOD)
        * (ARRIVAL_JITTER_STEP_S * 1_000_000),
    )
    wm = global_running_max(
        b, "ts_us", [F.col("arr_us"), F.col("event_id")], out_col="wm"
    )
    return wm.select(
        "day",
        F.expr(
            "CAST(GREATEST(wm - ts_us, 0L) div 1000000 AS BIGINT)"
        ).alias("late_s"),
    )


def q_events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day late-data audit under the injected arrival skew: how many
    events arrived after the running watermark had passed their event
    time, how late the worst one was, and the total lateness mass —
    the table a platform team reads before setting
    withWatermark()'s delay."""
    lat = _event_lateness(spark, sf_dir)
    return lat.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
        F.max("late_s").alias("max_late_s"),
        F.sum("late_s").alias("sum_late_s"),
    )


LATE_ARRIVAL_SQL = f"""
    WITH {_LATE_SQL}
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s,
           CAST(SUM(late_s) AS BIGINT) AS sum_late_s
    FROM lat GROUP BY day
"""


# Candidate watermark delays swept by the loss curve (seconds).
WATERMARK_DELAYS_S = (0, 60, 300, 900, 3600)


def q_events_watermark_loss_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The watermark tuning curve: for each candidate delay, how many
    events a `withWatermark(delay)` stream would DROP (late_s strictly
    beyond the delay) and the drop rate in ppm — the one-pass
    conditional-aggregation form (ONE scan, one 1-row aggregate,
    exploded to the 5-row curve; never 5 passes)."""
    lat = _event_lateness(spark, sf_dir)
    agg = lat.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("late_s") > d).cast("long")).alias(f"_d{d}")
            for d in WATERMARK_DELAYS_S
        ],
    )
    curve = agg.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("delay_s"),
                        F.col(f"_d{d}").alias("dropped"),
                    )
                    for d in WATERMARK_DELAYS_S
                ]
            )
        ).alias("s"),
    )
    return curve.select(
        F.col("s.delay_s").alias("delay_s"),
        F.col("s.dropped").alias("dropped"),
        F.col("n").alias("total"),
        F.expr("CAST(s.dropped * 1000000 div n AS BIGINT)").alias(
            "dropped_ppm"
        ),
    )


WATERMARK_LOSS_SQL = f"""
    WITH {_LATE_SQL},
    a AS (
      SELECT COUNT(*) AS n,
             {", ".join(f"SUM(CASE WHEN late_s > {d} THEN 1 ELSE 0 END) AS d{d}" for d in WATERMARK_DELAYS_S)}
      FROM lat)
    {" UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS delay_s, CAST(d{d} AS BIGINT) AS dropped, "
        f"CAST(n AS BIGINT) AS total, CAST(d{d} * 1000000 // n AS BIGINT) AS dropped_ppm FROM a"
        for d in WATERMARK_DELAYS_S
    )}
"""


STALE_THRESHOLD_S = 3600  # a stream partition more than 1h behind is stale


def q_events_freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ingestion freshness: how far each type's newest
    event lags the globally newest one (whole seconds), with a staleness
    flag at 1 h — the per-partition lag board every streaming pipeline
    fronts its dashboards with. One keyed aggregate over the bounded
    type domain + a 1-row broadcast global max."""
    e = load_table(spark, "events", sf_dir).select(
        "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts_us").alias("last_us"),
    )
    g = per.agg(F.max("last_us").alias("g_us"))
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        F.expr("CAST((g_us - last_us) div 1000000 AS BIGINT)").alias(
            "lag_s"
        ),
        (
            (F.col("g_us") - F.col("last_us"))
            > STALE_THRESHOLD_S * 1_000_000
        ).alias("is_stale"),
    )


FRESHNESS_SQL = f"""
    WITH per AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(epoch_us(ts)) AS last_us
      FROM events GROUP BY 1),
    g AS (SELECT MAX(last_us) AS g_us FROM per)
    SELECT event_type, n_events,
           CAST((g_us - last_us) // 1000000 AS BIGINT) AS lag_s,
           (g_us - last_us) > {STALE_THRESHOLD_S * 1_000_000} AS is_stale
    FROM per, g
"""


DRAWDOWN_TOP = 25


def q_supplier_revenue_max_drawdown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-25 suppliers by the largest peak-to-trough decline of their
    MONTHLY revenue series (exact cents): drawdown(m) = running-peak −
    revenue(m); the financial stress metric applied to supplier
    health. Fully tie-broken (max_dd desc, suppkey asc).

    Scale shape: fact → (supplier, month) grain in one map-side-
    combined aggregate; the running peak is a window PARTITIONED on the
    high-cardinality supplier key over the bounded month series; top-25
    is TakeOrderedAndProject."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey",
        (
            (F.year("l_shipdate") - F.lit(1992)) * 12
            + F.month("l_shipdate")
            - 1
        )
        .cast("long")
        .alias("m"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        ),
    )
    monthly = l.groupBy("l_suppkey", "m").agg(F.sum("rev").alias("y"))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = monthly.withColumn(
        "dd", F.max("y").over(w) - F.col("y")
    )
    return (
        dd.groupBy("l_suppkey")
        .agg(F.max("dd").alias("max_drawdown_cents"))
        .orderBy(F.desc("max_drawdown_cents"), F.asc("l_suppkey"))
        .limit(DRAWDOWN_TOP)
    )


DRAWDOWN_SQL = f"""
    WITH monthly AS (
      SELECT l_suppkey,
             (year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1 AS m,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                      AS BIGINT)) AS y
      FROM lineitem GROUP BY 1, 2),
    dd AS (
      SELECT l_suppkey,
             MAX(y) OVER (PARTITION BY l_suppkey ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - y AS dd
      FROM monthly)
    SELECT l_suppkey, CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents
    FROM dd GROUP BY 1
    ORDER BY max_drawdown_cents DESC, l_suppkey
    LIMIT {DRAWDOWN_TOP}
"""


def q_embedding_norm_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language embedding-norm audit — the metadata ⋈ vector join a
    multimodal corpus runs to catch a language whose embedding job
    drifted (collapsed norms are the classic symptom): documents joined
    to their vectors on doc_id = vec_id, squared norms in exact integer
    micro²-units (each element snapped to micro BEFORE squaring — the
    embedding_centroids convention, so the sum is order-independent).

    Output per lang: n_vecs, avg_norm2 (integer division of the
    DECIMAL(38,0)-accumulated sum — int64 would wrap past ~1e5 vectors
    at micro² scale; DuckDB promotes to HUGEINT identically), and
    max_norm2."""
    e = load_table(spark, "embeddings", sf_dir)
    micro = F.round(F.col("x").cast("double") * 1e6).cast("long")
    n2 = (
        e.select("vec_id", F.explode("embedding").alias("x"))
        .select("vec_id", (micro * micro).alias("sq"))
        .groupBy("vec_id")
        .agg(F.sum("sq").alias("norm2"))
    )
    d = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    return (
        n2.join(d, "vec_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("norm2").cast("decimal(38,0)")).alias("_s"),
            F.max("norm2").alias("max_norm2"),
        )
        .select(
            "lang",
            "n_vecs",
            F.expr("CAST(_s div n_vecs AS BIGINT)").alias("avg_norm2"),
            "max_norm2",
        )
    )


NORM_BY_LANG_SQL = """
    WITH n2 AS (
      SELECT vec_id, SUM(sq) AS norm2 FROM (
        SELECT vec_id,
               CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT)
                 * CAST(round(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT) AS sq
        FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings))
      GROUP BY 1)
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(n2.norm2) // COUNT(*) AS BIGINT) AS avg_norm2,
           CAST(MAX(n2.norm2) AS BIGINT) AS max_norm2
    FROM n2 JOIN documents d ON n2.vec_id = d.doc_id
    GROUP BY 1
"""


QUERIES = {
    "events_late_arrival_audit": q_events_late_arrival_audit,
    "events_watermark_loss_curve": q_events_watermark_loss_curve,
    "events_freshness_by_type": q_events_freshness_by_type,
    "supplier_revenue_max_drawdown": q_supplier_revenue_max_drawdown,
    "embedding_norm_by_lang": q_embedding_norm_by_lang,
}

ORACLES = {
    "events_late_arrival_audit": LATE_ARRIVAL_SQL,
    "events_watermark_loss_curve": WATERMARK_LOSS_SQL,
    "events_freshness_by_type": FRESHNESS_SQL,
    "supplier_revenue_max_drawdown": DRAWDOWN_SQL,
    "embedding_norm_by_lang": NORM_BY_LANG_SQL,
}
