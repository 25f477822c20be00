"""Relational/analytics surface, batch 24 (round 8 growth, sixth
wave): near-dup cluster size histogram (the dedup reporting tail),
term burstiness (Fano factor of the top-df vocabulary), global graph
transitivity, and per-type dwell times. The batch's fifth member,
stream_hourly_active_users (chained stateful aggregations), lives with
the rest of the streaming surface in streaming/queries.py.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-23, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness conventions (inherited): integer grains before sums,
DECIMAL(38,0)/HUGEINT sufficient statistics, terminal integer `div`
(truncation parity, measured) — every query in this batch is
integer-exact end to end, no floating arithmetic anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.dedup.queries import (
    _dedup_clusters_sql,
    q_dedup_clusters,
)
from page_rank_mapreduce_java_spark.functions.text_queries2 import WORDS_SQL
from page_rank_mapreduce_java_spark.functions.textfn import words
from page_rank_mapreduce_java_spark.graph.motifs import (
    triangle_counts,
    triangles_sql,
)
from page_rank_mapreduce_java_spark.graph.queries import (
    COOC_EDGES_SQL,
    cooccurrence_edges,
)


# --- near-dup cluster size histogram --------------------------------------------


def q_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the near-dup clusters — the reporting tail
    of the dedup pipeline (how much of the corpus sits in pairs vs
    large template families drives the keep-one-per-cluster savings
    estimate). Output per size: (cluster_size, n_clusters, n_docs).

    Exactness: pure integer counting over the certified dedup_clusters
    assignment (MinHash → LSH pairs → connected components).

    Scale shape: the cluster assignment is the certified
    collision-volume CC chassis; the histogram is two further keyed
    aggregates — cluster-keyed (high cardinality), then the bounded
    size domain.
    """
    clusters = q_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
    )


CLUSTER_SIZE_HIST_SQL = f"""
    WITH sizes AS (
      SELECT cluster, COUNT(*) AS cluster_size
      FROM ({_dedup_clusters_sql()}) GROUP BY 1)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
"""


# --- term burstiness (Fano factor) over the top-df vocabulary --------------------

BURSTY_TOP_N = 20


def q_text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of the top-20 document-frequency terms: the Fano
    factor Var/Mean of the term's per-document count, zeros included
    (Church & Gale 1995, public literature — a term with Fano ≈ 1 is
    Poisson-scattered filler; Fano ≫ 1 is topical, clumping into the
    documents that are ABOUT it). Output per term:
    (term, df, total_occurrences, fano_milli).

    Exactness: with N docs, T = Σc and Q = Σc² over the term's nonzero
    per-doc counts, Fano = (N·Q − T²)/(N·T) exactly; the milli snap is
    (1000·(N·Q − T²)) div (N·T) on DECIMAL(38,0)/HUGEINT — integer
    division, truncation parity; zeros contribute nothing to Q or T so
    the nonzero tf relation is sufficient.

    Scale shape: one (term, doc)-keyed count (map-side combinable), a
    term-keyed rollup, top-20 selection via TakeOrderedAndProject (no
    global window); the doc count rides a 1-row broadcast cross (no
    eager action at plan-construction time — the ADVICE-r7 rule).
    """
    d = load_table(spark, "documents", sf_dir)
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    tf = (
        d.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("t"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c")
        ).alias("q"),
    )
    top = stats.orderBy(F.desc("df"), F.asc("term")).limit(BURSTY_TOP_N)
    return top.crossJoin(F.broadcast(nd)).select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("t").cast("long").alias("total_occurrences"),
        F.expr(
            "CAST((1000 * (CAST(nd AS DECIMAL(38,0)) * q"
            " - CAST(t AS DECIMAL(38,0)) * t))"
            " div (CAST(nd AS DECIMAL(38,0)) * t) AS BIGINT)"
        ).alias("fano_milli"),
    )


def _burstiness_sql() -> str:
    return f"""
    WITH tf AS (
      SELECT term, doc_id, COUNT(*) AS c FROM (
        SELECT doc_id, unnest({WORDS_SQL}) AS term FROM documents)
      GROUP BY 1, 2),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    stats AS (
      SELECT term, COUNT(*) AS df,
             SUM(c) AS t, SUM(CAST(c AS HUGEINT) * c) AS q
      FROM tf GROUP BY 1),
    top AS (
      SELECT * FROM stats
      ORDER BY df DESC, term LIMIT {BURSTY_TOP_N})
    SELECT term, CAST(df AS BIGINT) AS df,
           CAST(t AS BIGINT) AS total_occurrences,
           CAST((1000 * (CAST(nd AS HUGEINT) * q
                         - CAST(t AS HUGEINT) * t))
                // (CAST(nd AS HUGEINT) * t) AS BIGINT) AS fano_milli
    FROM top, n
"""


# --- global transitivity ----------------------------------------------------------


def q_graph_transitivity_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity of the supplier co-occurrence graph:
    C = 3·triangles / wedges — the one-number closure rate
    complementing graph_clustering_coeff's per-node view (the two
    famously disagree on skewed graphs: transitivity weights hubs,
    mean local clustering weights leaves). One row:
    (n_nodes, n_wedges, closed_wedges, transitivity_ppm).

    Exactness: Σ per-node triangle participation = 3T = the closed-
    wedge count exactly; wedges = Σ d(d−1)/2 exactly; the ppm is
    integer division (truncation parity). All integers end to end.

    Scale shape: the certified degree-ordered wedge-join triangle
    chassis (graph/motifs.py — m^(3/2)-bounded) plus one degree
    aggregate; the final combine is a 1-row broadcast cross.
    """
    e = cooccurrence_edges(spark, sf_dir)
    tri = triangle_counts(e)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    wed = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # Integer `div`, not float `/`: Σd(d-1) is always even so div is
        # exact, while float division loses exactness past 2^53 (ADVICE
        # r8) — the oracle's `// 2` stays integer-exact the whole way.
        F.expr("CAST(SUM(d * (d - 1)) div 2 AS BIGINT)").alias("n_wedges"),
    )
    closed = tri.agg(F.sum("triangles").alias("closed_wedges"))
    return wed.crossJoin(F.broadcast(closed)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        "n_wedges",
        F.col("closed_wedges").cast("long").alias("closed_wedges"),
        F.expr(
            "CAST(CASE WHEN n_wedges = 0 THEN -1"
            " ELSE 1000000 * closed_wedges div n_wedges END AS BIGINT)"
        ).alias("transitivity_ppm"),
    )


TRANSITIVITY_SQL = f"""
    WITH pernode AS (
      SELECT * FROM ({triangles_sql(COOC_EDGES_SQL)})),
    e2 AS ({COOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1),
    wed AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges
            FROM deg),
    closed AS (SELECT CAST(SUM(triangles) AS BIGINT) AS closed_wedges
               FROM pernode)
    SELECT n_nodes, n_wedges, closed_wedges,
           CAST(CASE WHEN n_wedges = 0 THEN -1
                ELSE 1000000 * closed_wedges // n_wedges END AS BIGINT)
             AS transitivity_ppm
    FROM wed, closed
"""


# --- dwell time per event type ------------------------------------------------------


def q_events_dwell_time_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean dwell time per event type: how long a user lingers on an
    event (of this type) before their NEXT event of any type — the
    engagement decomposition behind session quality (a funnel step
    users rush through vs one they dwell on). A user's last event has
    no successor and contributes nothing. Output per type:
    (event_type, n_dwells, mean_dwell_ms).

    Exactness: dwell is the exact integer microsecond difference of
    event-time stamps; the mean is (Σµs) div (1000·n) — integer
    milliseconds, truncation parity.

    Scale shape: one LEAD window per USER (the high-cardinality keyed
    window convention) into a bounded per-type rollup; no global
    order anywhere.
    """
    from pyspark.sql.window import Window

    e = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    dwell = (
        e.withColumn("_next", F.lead("us").over(w))
        .filter(F.col("_next").isNotNull())
        .select(
            "event_type", (F.col("_next") - F.col("us")).alias("dw_us")
        )
    )
    return (
        dwell.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_dwells"),
            F.sum(F.col("dw_us").cast("decimal(38,0)")).alias("_sum_us"),
        )
        .select(
            "event_type",
            F.col("n_dwells").cast("long").alias("n_dwells"),
            F.expr(
                "CAST(_sum_us div (1000 * CAST(n_dwells AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("mean_dwell_ms"),
        )
    )


DWELL_SQL = """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id
      FROM events),
    dwell AS (
      SELECT event_type,
             lead(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) - us AS dw_us
      FROM e
      QUALIFY dw_us IS NOT NULL)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_dwells,
           CAST(SUM(CAST(dw_us AS HUGEINT))
                // (1000 * CAST(COUNT(*) AS HUGEINT)) AS BIGINT)
             AS mean_dwell_ms
    FROM dwell GROUP BY 1
"""


QUERIES = {
    "dedup_cluster_size_histogram": q_dedup_cluster_size_histogram,
    "text_term_burstiness": q_text_term_burstiness,
    "graph_transitivity_global": q_graph_transitivity_global,
    "events_dwell_time_by_type": q_events_dwell_time_by_type,
}

ORACLES = {
    "dedup_cluster_size_histogram": CLUSTER_SIZE_HIST_SQL,
    "text_term_burstiness": _burstiness_sql(),
    "graph_transitivity_global": TRANSITIVITY_SQL,
    "events_dwell_time_by_type": DWELL_SQL,
}
