"""Relational/analytics surface, batch 35 (round 10 growth — the
bounded post-freeze wave VERDICT r9 authorized): graph structure
diagnostics (local bridges, clustering-vs-degree curve), grouped
log-log regression (price elasticity), variance-homogeneity testing
(Brown-Forsythe), ranking-quality metrics for recommenders (NDCG@10 /
MRR@10 of the popularity baseline), probability-calibration audit
(ECE/MCE), diagonal-Mahalanobis embedding outliers, gamma
method-of-moments fits, and the perceptual-hash bit-balance audit.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline
family). Registered with demand at 14/50, so the whole batch fits the
same driver window as the final deferral drain (round-10 protocol,
PERF.md r9 §10 item 4).

Exactness: the module-wide sufficient-statistics contract — integer
(cents / micro-nat / micro) quantization BEFORE any sum, DECIMAL(38,0)
(Spark) / HUGEINT (DuckDB) accumulators, integer `div` // truncation
parity for ratios, and ONE shared terminal double expression where a
float result is unavoidable (the welch/kruskal convention). ln goes
through the deterministic series (ln_int_sql) — bit-identical doubles
on both engines. The NDCG/MRR discount weights are integer literals
rendered from the SAME Python constants into both engines — parity by
construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql
from page_rank_mapreduce_java_spark.graph.motifs import (
    _edge_support,
    triangle_counts,
)
from page_rank_mapreduce_java_spark.graph.queries import (
    COOC_EDGES_SQL,
    cooccurrence_edges,
)

# --- graph_local_bridges ------------------------------------------------------


def q_graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-bridge census of the supplier co-occurrence graph: an edge
    is a LOCAL BRIDGE when its endpoints share no common neighbor
    (triangle support 0) — deleting it lengthens the endpoints' path to
    ≥ 3. The share of local bridges measures how much of the graph's
    connectivity rides on unclustered ties (the Granovetter weak-tie
    reading; a community graph is mostly embedded edges, a star/chain
    topology is mostly bridges). Output one row:
    (n_edges, n_local_bridges, bridge_ppm, support_sum).

    Exactness: pure integer counting over exact per-edge triangle
    support; ppm via integer `div`.

    Scale shape: the degree-oriented wedge join of the triangle chassis
    (m^(3/2)-bounded, never all-pairs) → an edge-keyed count → one
    1-row aggregate. Identical candidate volume to graph_ktruss's
    support pass.
    """
    edges = cooccurrence_edges(spark, sf_dir)
    sup = _edge_support(edges)
    return sup.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum((F.col("support") == 0).cast("long"))
        .cast("long")
        .alias("n_local_bridges"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN support = 0 THEN 1 ELSE 0 END)"
            " div count(1) AS BIGINT)"
        ).alias("bridge_ppm"),
        F.sum("support").cast("long").alias("support_sum"),
    )


LOCAL_BRIDGES_SQL = f"""
    WITH edges AS MATERIALIZED ({COOC_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst AS src, src AS dst FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY 1),
    o AS (
      SELECT u.src, u.dst FROM und u
      JOIN deg a ON u.src = a.id JOIN deg b ON u.dst = b.id
      WHERE (a.d < b.d) OR (a.d = b.d AND u.src < u.dst)),
    tris AS (
      SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
      FROM o w1 JOIN o w2 ON w1.src = w2.src AND w1.dst < w2.dst
      JOIN edges e ON e.src = w1.dst AND e.dst = w2.dst),
    tri_edges AS (
      SELECT least(u, v) AS src, greatest(u, v) AS dst FROM tris
      UNION ALL SELECT least(u, w), greatest(u, w) FROM tris
      UNION ALL SELECT v, w FROM tris),
    supc AS (SELECT src, dst, COUNT(*) AS s FROM tri_edges GROUP BY 1, 2),
    se AS (
      SELECT e.src, e.dst, COALESCE(supc.s, 0) AS support
      FROM edges e LEFT JOIN supc ON e.src = supc.src AND e.dst = supc.dst)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN support = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_local_bridges,
           CAST(1000000 * SUM(CASE WHEN support = 0 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS bridge_ppm,
           CAST(SUM(support) AS BIGINT) AS support_sum
    FROM se
"""


# --- graph_clustering_by_degree -----------------------------------------------


def q_graph_clustering_by_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient vs degree — mean cc(v) = 2t(v) /
    (d(v)·(d(v)−1)) per ⌊log₂ degree⌋ bucket of the supplier
    co-occurrence graph. A falling curve (high-degree hubs less
    clustered) is the hierarchical-structure signature; a flat one
    means degree-independent cohesion (graph_clustering_coeff reports
    the single global mean; the CURVE is what locates WHERE the
    clustering lives). Output per bucket:
    (deg_bucket, n_nodes, triangles_sum, mean_cc_ppm).

    Exactness: per-node cc snaps to integer ppm via `div` (truncation
    parity) BEFORE the bucket mean, which is again integer `div` —
    no float ever crosses an aggregate. The bucket index
    ⌊log₂ d⌋ = length(bin(d)) − 1 is exact integer bit arithmetic on
    both engines (the ln_int_sql trick).

    Scale shape: the shared m^(3/2) triangle chassis
    (graph/motifs.triangle_counts) → a node-keyed join with the degree
    vector → a ≤⌈log₂ d_max⌉-row bucket rollup (bounded-domain
    convention).
    """
    edges = cooccurrence_edges(spark, sf_dir)
    tc = triangle_counts(edges)
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    per_node = (
        tc.join(deg, "id")
        .filter(F.col("d") >= 2)
        .select(
            F.expr("length(bin(CAST(d AS BIGINT))) - 1").alias("deg_bucket"),
            F.col("triangles").alias("t"),
            F.expr(
                "CAST(2000000 * triangles div (d * (d - 1)) AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )
    return (
        per_node.groupBy("deg_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("t").alias("triangles_sum"),
            F.expr("CAST(sum(cc_ppm) div count(1) AS BIGINT)").alias(
                "mean_cc_ppm"
            ),
        )
        .select(
            F.col("deg_bucket").cast("long").alias("deg_bucket"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("triangles_sum").cast("long").alias("triangles_sum"),
            "mean_cc_ppm",
        )
    )


CLUSTERING_BY_DEGREE_SQL = f"""
    WITH edges AS MATERIALIZED ({COOC_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst AS src, src AS dst FROM edges),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY 1),
    o AS (
      SELECT u.src, u.dst FROM und u
      JOIN deg a ON u.src = a.id JOIN deg b ON u.dst = b.id
      WHERE (a.d < b.d) OR (a.d = b.d AND u.src < u.dst)),
    tris AS (
      SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
      FROM o w1 JOIN o w2 ON w1.src = w2.src AND w1.dst < w2.dst
      JOIN edges e ON e.src = w1.dst AND e.dst = w2.dst),
    per_node_t AS (
      SELECT id, COUNT(*) AS t
      FROM (SELECT u AS id FROM tris
            UNION ALL SELECT v FROM tris
            UNION ALL SELECT w FROM tris) GROUP BY 1),
    pn AS (
      SELECT length(bin(CAST(deg.d AS BIGINT))) - 1 AS deg_bucket,
             COALESCE(per_node_t.t, 0) AS t,
             CAST(2000000 * COALESCE(per_node_t.t, 0)
                  // (deg.d * (deg.d - 1)) AS BIGINT) AS cc_ppm
      FROM deg LEFT JOIN per_node_t ON deg.id = per_node_t.id
      WHERE deg.d >= 2)
    SELECT CAST(deg_bucket AS BIGINT) AS deg_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(t) AS BIGINT) AS triangles_sum,
           CAST(SUM(cc_ppm) // COUNT(*) AS BIGINT) AS mean_cc_ppm
    FROM pn GROUP BY 1
"""


# --- lineitem_price_elasticity_by_brand ---------------------------------------

_ELAST_SLOPE = """
    CAST(ROUND(1e6 *
      CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE), 0)
    AS BIGINT)
"""

_ELAST_CORR = """
    CAST(ROUND(1e3 *
      CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
             * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 0)
    AS BIGINT)
"""


def q_lineitem_price_elasticity_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grouped log-log regression — the price-elasticity-of-quantity
    reading: per part brand, the OLS slope of ln(quantity) on
    ln(extended price) and their correlation (elasticity < 0 is the
    demand-curve signature; the per-brand GROUPING is what the single
    global OLS queries don't give). Output per brand (25 rows):
    (brand, n, slope_micro, corr_milli).

    Exactness: both regressors snap to integer MICRO-NATS through the
    deterministic ln (ln_int_sql — bit-identical doubles both engines,
    integer args: cents and quantity are exact integers ≥ 1); the five
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as
    DECIMAL(38,0)/HUGEINT; slope and correlation are shared terminal
    expressions rounded to micro/milli.

    Scale shape: broadcast part dim onto the fact scan → ONE
    map-side-combined aggregate on the 25-value brand key → 25-row
    terminal projection. No window, no second shuffle.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    ln_price = ln_int_sql(cents_sql("l_extendedprice"), "spark")
    ln_qty = ln_int_sql("CAST(l_quantity AS BIGINT)", "spark")
    x = F.expr(f"CAST(ROUND(1e6 * {ln_price}, 0) AS DECIMAL(38,0))")
    y = F.expr(f"CAST(ROUND(1e6 * {ln_qty}, 0) AS DECIMAL(38,0))")
    agg = (
        li.join(F.broadcast(p), "l_partkey")
        .select("brand", x.alias("x"), y.alias("y"))
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    return agg.select(
        "brand",
        F.col("n").cast("long").alias("n"),
        F.expr(_ELAST_SLOPE).alias("slope_micro"),
        F.expr(_ELAST_CORR).alias("corr_milli"),
    )


def _elasticity_sql() -> str:
    ln_price = ln_int_sql(cents_sql("l_extendedprice"), "duckdb")
    ln_qty = ln_int_sql("CAST(l_quantity AS BIGINT)", "duckdb")
    slope = _ELAST_SLOPE.replace("DECIMAL(38,0)", "HUGEINT")
    corr = _ELAST_CORR.replace("DECIMAL(38,0)", "HUGEINT")
    return f"""
    WITH pts AS (
      SELECT p_brand AS brand,
             CAST(ROUND(1e6 * {ln_price}, 0) AS HUGEINT) AS x,
             CAST(ROUND(1e6 * {ln_qty}, 0) AS HUGEINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    agg AS (
      SELECT brand, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pts GROUP BY 1)
    SELECT brand, CAST(n AS BIGINT) AS n,
           {slope} AS slope_micro,
           {corr} AS corr_milli
    FROM agg
"""


# --- levene_brown_forsythe_price ----------------------------------------------

# Brown-Forsythe W from per-group (n_i, Σd, Σd²) over half-cent absolute
# deviations from the group MEDIAN:
#   W = ((N − k) / (k − 1)) · Σ n_i (m_i − m̄)² / Σ_i (Σd²_i − n_i m_i²)
# with m_i = Σd_i / n_i and m̄ the grand mean of d. One shared terminal
# expression over the k-row sufficient-statistics relation.
_BF_W = """
    CAST(ROUND(1e3 *
      (CAST(tn - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)) *
      (CAST(ssb AS DOUBLE)
       - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
      / (CAST(tq AS DOUBLE) - CAST(ssb AS DOUBLE)), 0)
    AS BIGINT)
"""


def q_levene_brown_forsythe_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown-Forsythe (median-centred Levene) test of variance
    homogeneity of l_extendedprice across the three return flags — the
    robust heteroscedasticity gate that belongs in front of every
    pooled-variance test (welch_ttest compares MEANS of two groups;
    this tests whether the SPREADS of k groups even agree). Output one
    row: (k_groups, n_total, w_milli).

    Exactness: prices snap to cents; group medians of integer cents are
    exact half-integers (midpoint interpolation of two integers is
    exact in double), so deviations d = |2x − 2·med| are exact
    INTEGERS in half-cent units; (n_i, Σd, Σd²) accumulate as
    DECIMAL(38,0)/HUGEINT; W is one shared terminal expression
    (Σn_i m_i² enters as HUGEINT-exact (Σd_i)² div n_i — truncation
    parity — because the half-cent grain makes the remainder
    negligible at milli rounding... it does NOT: the expression keeps
    the exact rational form CAST(sd*sd AS DOUBLE)/n instead).

    Scale shape: one 3-row median aggregate (percentile over the fact
    scan) broadcast back onto the scan → one map-side-combined
    3-group aggregate → 1-row terminal. Two fact passes, no window.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_returnflag").alias("g"),
        cents("l_extendedprice").alias("xc"),
    )
    med = li.groupBy("g").agg(
        F.expr("CAST(ROUND(2 * percentile(xc, 0.5), 0) AS BIGINT)").alias(
            "med2"
        )
    )
    d = li.join(F.broadcast(med), "g").select(
        "g",
        F.abs(F.lit(2) * F.col("xc") - F.col("med2"))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    grp = d.groupBy("g").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * F.col("d")).alias("qd"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("tn"),
        F.sum("sd").alias("ts"),
        F.sum("qd").alias("tq"),
        F.sum(
            F.expr("CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(ni AS DOUBLE)")
        ).alias("ssb"),
    )
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("tn").cast("long").alias("n_total"),
        F.expr(_BF_W).alias("w_milli"),
    )


def _brown_forsythe_sql() -> str:
    c = cents_sql("l_extendedprice")
    return f"""
    WITH base AS (
      SELECT l_returnflag AS g, {c} AS xc FROM lineitem),
    med AS (
      SELECT g, CAST(ROUND(2 * quantile_cont(xc, 0.5), 0) AS BIGINT) AS med2
      FROM base GROUP BY 1),
    d AS (
      SELECT base.g, CAST(abs(2 * xc - med2) AS HUGEINT) AS d
      FROM base JOIN med ON base.g = med.g),
    grp AS (
      SELECT g, COUNT(*) AS ni, SUM(d) AS sd, SUM(d * d) AS qd
      FROM d GROUP BY 1),
    tot AS (
      SELECT COUNT(*) AS k, SUM(ni) AS tn, SUM(sd) AS ts, SUM(qd) AS tq,
             SUM(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
                 / CAST(ni AS DOUBLE)) AS ssb
      FROM grp)
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(tn AS BIGINT) AS n_total,
           {_BF_W} AS w_milli
    FROM tot
"""


# --- rec_ndcg_popularity / rec_mrr_popularity ---------------------------------

# Discount weights w_i = round(1e6 / log2(i + 1)) for ranks 1..10,
# rendered as integer literals into BOTH engines from the same Python
# constants — the DCG arithmetic downstream is pure integers.
NDCG_K = 10
REC_HOLDOUT_DAYS = 90
_NDCG_W = [round(1_000_000 / math.log2(i + 1)) for i in range(1, NDCG_K + 1)]
_IDCG_PREFIX = [sum(_NDCG_W[: m + 1]) for m in range(NDCG_K)]

_IDCG_CASE = "CASE least(rel_cnt, {k}) ".format(k=NDCG_K) + " ".join(
    f"WHEN {m + 1} THEN {_IDCG_PREFIX[m]}" for m in range(NDCG_K)
) + " END"


def _popular_topk_spark(spark: SparkSession, sf_dir: str):
    """(train, test, popular) relations for the popularity baseline:
    orders split at max(o_orderdate) − REC_HOLDOUT_DAYS days; popularity
    = train purchase count per supplier, top NDCG_K by (count DESC,
    suppkey ASC) with rank and integer discount weight attached."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    split = o.agg(
        F.expr(
            f"max(o_orderdate) - INTERVAL {REC_HOLDOUT_DAYS} DAYS"
        ).alias("_split")
    )
    ol = o.crossJoin(F.broadcast(split)).join(
        li, F.col("o_orderkey") == F.col("l_orderkey")
    )
    train = ol.filter(F.col("o_orderdate") <= F.col("_split"))
    test = ol.filter(F.col("o_orderdate") > F.col("_split"))
    w = Window.orderBy(F.desc("cnt"), F.asc("l_suppkey"))
    wmap = F.create_map(
        *[
            x
            for i in range(NDCG_K)
            for x in (F.lit(i + 1), F.lit(_NDCG_W[i]))
        ]
    )
    popular = (
        train.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= NDCG_K)
        .select("l_suppkey", "rank", wmap[F.col("rank")].alias("wt"))
    )
    return train, test, popular


def _popular_topk_cte() -> str:
    wt_case = "CASE rank " + " ".join(
        f"WHEN {i + 1} THEN {_NDCG_W[i]}" for i in range(NDCG_K)
    ) + " END"
    return f"""
    split AS (
      SELECT max(o_orderdate) - INTERVAL {REC_HOLDOUT_DAYS} DAYS AS s
      FROM orders),
    ol AS (
      SELECT o_custkey, o_orderdate, l_suppkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    train AS (SELECT ol.* FROM ol, split WHERE o_orderdate <= s),
    test AS (SELECT ol.* FROM ol, split WHERE o_orderdate > s),
    pop0 AS (
      SELECT l_suppkey, COUNT(*) AS cnt,
             row_number() OVER (ORDER BY COUNT(*) DESC, l_suppkey) AS rank
      FROM train GROUP BY 1),
    popular AS (
      SELECT l_suppkey, rank, {wt_case} AS wt
      FROM pop0 WHERE rank <= {NDCG_K})"""


def q_rec_ndcg_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the popularity baseline — the ranking-quality floor
    every recommender must beat: suppliers are ranked by training-window
    purchase count, each holdout customer's relevant set is the
    suppliers they actually bought from in the last REC_HOLDOUT_DAYS
    days, and the binary-relevance NDCG@10 averages over holdout
    customers. Output one row:
    (n_users, n_users_hit, mean_ndcg_ppm).

    Exactness: the log₂ discounts enter as integer micro literals
    rendered from the same Python constants into both engines, so DCG,
    IDCG, and per-user ndcg_ppm (integer `div`) are pure integer
    arithmetic; the mean is again integer `div`.

    Scale shape: one orders⋈lineitem fact pass split into train/test by
    a broadcast 1-row split date; popularity is a supplier-keyed count
    + top-10 (TakeOrdered, no full sort); the scoring join is
    (holdout pairs) ⋈ broadcast(10 rows) → customer-keyed aggregate →
    1-row mean. Nothing bigger than the fact scan ever shuffles.
    """
    _, test, popular = _popular_topk_spark(spark, sf_dir)
    rel = test.select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    ).distinct()
    per_user = (
        rel.join(
            F.broadcast(popular.select(F.col("l_suppkey").alias("s"), "wt")),
            "s",
            "left",
        )
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("rel_cnt"),
            F.sum(F.coalesce("wt", F.lit(0))).alias("dcg"),
        )
        .select(
            "c",
            "dcg",
            F.expr(
                f"CAST(1000000 * dcg div ({_IDCG_CASE}) AS BIGINT)"
            ).alias("ndcg_ppm"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("dcg") > 0).cast("long")).cast("long").alias("n_users_hit"),
        F.expr("CAST(sum(ndcg_ppm) div count(1) AS BIGINT)").alias(
            "mean_ndcg_ppm"
        ),
    )


NDCG_POPULARITY_SQL = f"""
    WITH {_popular_topk_cte()},
    rel AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s FROM test),
    per_user AS (
      SELECT c, COUNT(*) AS rel_cnt,
             SUM(COALESCE(wt, 0)) AS dcg
      FROM rel LEFT JOIN popular ON rel.s = popular.l_suppkey
      GROUP BY 1),
    scored AS (
      SELECT c, dcg,
             CAST(1000000 * dcg // ({_IDCG_CASE}) AS BIGINT) AS ndcg_ppm
      FROM per_user)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN dcg > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_hit,
           CAST(SUM(ndcg_ppm) // COUNT(*) AS BIGINT) AS mean_ndcg_ppm
    FROM scored
"""


def q_rec_mrr_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of the popularity baseline — the position-of-first-hit
    sibling of rec_ndcg_popularity (NDCG credits every hit; MRR only
    the first, so the two disagree exactly when relevant items cluster
    deep in the ranking). Same train/holdout split and popularity
    ranking. Output one row: (n_users, n_users_hit, mrr_micro_mean).

    Exactness: reciprocal ranks are integer micro via `div`
    (1000000 div rank — identical truncation both engines); means are
    integer `div`. No floats anywhere.

    Scale shape: identical to rec_ndcg_popularity — the broadcast
    10-row ranking joined to the holdout pairs, a customer-keyed MIN
    aggregate, a 1-row mean.
    """
    _, test, popular = _popular_topk_spark(spark, sf_dir)
    rel = test.select(
        F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
    ).distinct()
    per_user = (
        rel.join(
            F.broadcast(popular.select(F.col("l_suppkey").alias("s"), "rank")),
            "s",
            "left",
        )
        .groupBy("c")
        .agg(F.min("rank").alias("first_rank"))
        .select(
            "c",
            F.expr(
                "CASE WHEN first_rank IS NULL THEN CAST(0 AS BIGINT)"
                " ELSE CAST(1000000 div first_rank AS BIGINT) END"
            ).alias("rr_micro"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("rr_micro") > 0).cast("long"))
        .cast("long")
        .alias("n_users_hit"),
        F.expr("CAST(sum(rr_micro) div count(1) AS BIGINT)").alias(
            "mrr_micro_mean"
        ),
    )


MRR_POPULARITY_SQL = f"""
    WITH {_popular_topk_cte()},
    rel AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s FROM test),
    per_user AS (
      SELECT c, MIN(rank) AS first_rank
      FROM rel LEFT JOIN popular ON rel.s = popular.l_suppkey
      GROUP BY 1),
    scored AS (
      SELECT c, CASE WHEN first_rank IS NULL THEN CAST(0 AS BIGINT)
                     ELSE CAST(1000000 // first_rank AS BIGINT) END
                  AS rr_micro
      FROM per_user)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN rr_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_hit,
           CAST(SUM(rr_micro) // COUNT(*) AS BIGINT) AS mrr_micro_mean
    FROM scored
"""


# --- calibration_return_by_quantity -------------------------------------------

CALIB_BIN_WIDTH = 5  # quantity 1..50 -> 10 bins


def q_calibration_return_by_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Probability-calibration audit (reliability + ECE/MCE) of a
    stand-in scorer that predicts P(return) as quantity/50 — the
    model-eval primitive an LLM-quality pipeline runs on every scored
    column (the SHAPE is what matters: bin by confidence, compare mean
    confidence against empirical rate, aggregate the gaps). Output one
    row: (n_bins, n_total, ece_ppm, mce_ppm).

    ECE = Σ_b (n_b/N)·|acc_b − conf_b|, MCE = max_b |acc_b − conf_b|,
    both in ppm of probability.

    Exactness: confidence is the integer ppm 20000·quantity; per-bin
    acc and conf are integer `div` ppm; the ECE weighting keeps the
    exact form Σ n_b·gap_b div N (one division at the end, not per
    bin). Pure integer arithmetic.

    Scale shape: one map-side-combined aggregate on the 10-value bin
    key → a 1-row rollup (bounded-domain convention).
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        F.expr(
            f"CAST((CAST(l_quantity AS BIGINT) - 1) div {CALIB_BIN_WIDTH}"
            " AS BIGINT)"
        ).alias("bin"),
        F.expr("CAST(20000 * CAST(l_quantity AS BIGINT) AS BIGINT)").alias(
            "conf_ppm"
        ),
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
    )
    bins = li.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("conf_ppm").alias("sconf"),
        F.sum("ret").alias("sret"),
    )
    gaps = bins.select(
        "nb",
        F.expr(
            "abs(CAST(1000000 * sret div nb AS BIGINT)"
            " - CAST(sconf div nb AS BIGINT))"
        ).alias("gap_ppm"),
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("nb").cast("long").alias("n_total"),
        F.expr("CAST(sum(nb * gap_ppm) div sum(nb) AS BIGINT)").alias(
            "ece_ppm"
        ),
        F.max("gap_ppm").cast("long").alias("mce_ppm"),
    )


CALIBRATION_SQL = f"""
    WITH base AS (
      SELECT CAST((CAST(l_quantity AS BIGINT) - 1) // {CALIB_BIN_WIDTH}
                  AS BIGINT) AS bin,
             CAST(20000 * CAST(l_quantity AS BIGINT) AS BIGINT) AS conf_ppm,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem),
    bins AS (
      SELECT bin, COUNT(*) AS nb, SUM(conf_ppm) AS sconf, SUM(ret) AS sret
      FROM base GROUP BY 1),
    gaps AS (
      SELECT nb,
             abs(CAST(1000000 * sret // nb AS BIGINT)
                 - CAST(sconf // nb AS BIGINT)) AS gap_ppm
      FROM bins)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(nb) AS BIGINT) AS n_total,
           CAST(SUM(nb * gap_ppm) // SUM(nb) AS BIGINT) AS ece_ppm,
           CAST(MAX(gap_ppm) AS BIGINT) AS mce_ppm
    FROM gaps
"""


# --- embedding_mahalanobis_outliers -------------------------------------------

MAHA_TOP_K = 25


def q_embedding_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-25 embedding outliers by diagonal-covariance Mahalanobis
    distance — the corpus-hygiene scan that flags vectors whose
    per-dimension z-scores are collectively extreme (a broken encoder
    run, a mis-normalized shard, genuine semantic outliers). Output
    (MAHA_TOP_K rows): (vec_id, label, maha_micro) ordered by
    (maha_micro DESC, vec_id).

    Exactness: elements snap to integer micro (the dim-variance
    convention); per-dimension stats (n, Σv, Σv²) are DECIMAL(38,0)/
    HUGEINT; each element's squared z contribution is the exact
    integer ((n·vm − s_d)² · 1e6) div (n²·var_d) with var_d the exact
    integer n·q_d − s_d² div n... kept in the factored form
    (n·vm − s_d)²·1e6 div (n·q_d − s_d·s_d) — one integer division
    per element (truncation parity), summed exactly per vector.
    Dead dimensions (zero variance) contribute 0 by the shared CASE.

    Scale shape: posexplode → ONE 64-row stats aggregate, broadcast
    back onto the exploded relation → vector-keyed sum → bounded
    top-k (TakeOrdered — never a global sort).
    """
    e = load_table(spark, "embeddings", sf_dir)
    x = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.round(F.col("v").cast("double") * 1e6)
        .cast("decimal(38,0)")
        .alias("vm"),
    )
    stats = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).alias("q"),
    )
    terms = x.join(F.broadcast(stats), "pos").select(
        "vec_id",
        "label",
        F.expr(
            "CASE WHEN CAST(n AS DECIMAL(38,0)) * q - s * s > 0 THEN"
            " CAST(((CAST(n AS DECIMAL(38,0)) * vm - s)"
            "       * (CAST(n AS DECIMAL(38,0)) * vm - s) * 1000000)"
            "      div (CAST(n AS DECIMAL(38,0)) * q - s * s) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("z2_micro"),
    )
    scored = terms.groupBy("vec_id", "label").agg(
        F.sum("z2_micro").cast("long").alias("maha_micro")
    )
    return (
        scored.orderBy(F.desc("maha_micro"), F.asc("vec_id"))
        .limit(MAHA_TOP_K)
        .select("vec_id", F.col("label").cast("long").alias("label"), "maha_micro")
    )


MAHA_OUTLIERS_SQL = f"""
    WITH x AS (
      SELECT vec_id, label,
             unnest(range(1, len(embedding) + 1)) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0)
                  AS HUGEINT) AS vm
      FROM embeddings),
    stats AS (
      SELECT pos, COUNT(*) AS n, SUM(vm) AS s, SUM(vm * vm) AS q
      FROM x GROUP BY 1),
    terms AS (
      SELECT vec_id, label,
             CASE WHEN CAST(n AS HUGEINT) * q - s * s > 0 THEN
               CAST(((CAST(n AS HUGEINT) * vm - s)
                     * (CAST(n AS HUGEINT) * vm - s) * 1000000)
                    // (CAST(n AS HUGEINT) * q - s * s) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS z2_micro
      FROM x JOIN stats ON x.pos = stats.pos),
    scored AS (
      SELECT vec_id, label, SUM(z2_micro) AS maha_micro
      FROM terms GROUP BY 1, 2)
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           CAST(maha_micro AS BIGINT) AS maha_micro
    FROM scored
    ORDER BY maha_micro DESC, vec_id
    LIMIT {MAHA_TOP_K}
"""


# --- customer_spend_gamma_moments ---------------------------------------------

_GAMMA_ALPHA = """
    CAST(ROUND(1e3 *
      (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      / ((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 0)
    AS BIGINT)
"""

_GAMMA_THETA = """
    CAST(ROUND(
      ((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
      / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0)
    AS BIGINT)
"""


def q_customer_spend_gamma_moments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Method-of-moments gamma fit of per-customer total spend, by
    market segment: shape α = mean²/var, scale θ = var/mean — the
    parametric spend model behind CLV simulation and spend-percentile
    extrapolation (a segment with α < 1 is hit-driven; α > 1 has a
    spending 'habit' mode). Output per segment (5 rows):
    (segment, n_customers, alpha_milli, theta_cents).

    Exactness: per-customer totals are exact integer cents; segment
    sufficient statistics (n, Σt, Σt²) are DECIMAL(38,0)/HUGEINT; α
    and θ are shared terminal expressions (sample variance), rounded
    to milli / whole cents.

    Scale shape: customer-keyed cents sum (map-side combinable) →
    broadcast segment dim → ONE 5-group aggregate → 5-row terminal.
    """
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", cents("o_totalprice").alias("tc")
    )
    per_c = o.groupBy("o_custkey").agg(
        F.sum("tc").cast("decimal(38,0)").alias("t")
    )
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    agg = (
        per_c.join(F.broadcast(c), "o_custkey")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").alias("s"),
            F.sum(F.col("t") * F.col("t")).alias("q"),
        )
    )
    return agg.select(
        "segment",
        F.col("n").cast("long").alias("n_customers"),
        F.expr(_GAMMA_ALPHA).alias("alpha_milli"),
        F.expr(_GAMMA_THETA).alias("theta_cents"),
    )


def _gamma_moments_sql() -> str:
    c = cents_sql("o_totalprice")
    return f"""
    WITH per_c AS (
      SELECT o_custkey, CAST(SUM({c}) AS HUGEINT) AS t
      FROM orders GROUP BY 1),
    agg AS (
      SELECT c_mktsegment AS segment, COUNT(*) AS n,
             SUM(t) AS s, SUM(t * t) AS q
      FROM per_c JOIN customer ON o_custkey = c_custkey
      GROUP BY 1)
    SELECT segment, CAST(n AS BIGINT) AS n_customers,
           {_GAMMA_ALPHA} AS alpha_milli,
           {_GAMMA_THETA} AS theta_cents
    FROM agg
"""


# --- mm_phash_bit_balance -----------------------------------------------------

PHASH_BITS = 63  # 8x8 DCT grid minus the DC coefficient


def q_mm_phash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bit balance of the 63-bit perceptual hash — the hash-health
    audit: a bit stuck near 0 or 1 across the corpus carries no
    discriminative information, silently halving the effective Hamming
    resolution of every pHash dedup decision (mm_image_phash_pairs,
    mm_phash_keepers consume these bits). Output per bit (63 rows):
    (bit_pos, n_docs, n_ones, ones_ppm).

    Exactness: pure integer bit extraction and counting; ppm via
    integer `div`.

    Scale shape: the phash relation (one Arrow-batched hash pass) ×
    a 63-element sequence explode → one map-side-combined aggregate on
    the bounded bit-position key.
    """
    from page_rank_mapreduce_java_spark.multimodal.phash import (
        bmp_phash,
        documents_to_bmp,
    )

    d = load_table(spark, "documents", sf_dir)
    hashed = bmp_phash(documents_to_bmp(d)).select("doc_id", "phash")
    bits = hashed.select(
        F.explode(F.sequence(F.lit(0), F.lit(PHASH_BITS - 1))).alias(
            "bit_pos"
        ),
        F.col("phash"),
    ).select(
        "bit_pos",
        F.expr("CAST(shiftright(phash, bit_pos) & 1 AS BIGINT)").alias("b"),
    )
    return (
        bits.groupBy("bit_pos")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("b").alias("n_ones"),
        )
        .select(
            F.col("bit_pos").cast("long").alias("bit_pos"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_ones").cast("long").alias("n_ones"),
            F.expr("CAST(1000000 * n_ones div n_docs AS BIGINT)").alias(
                "ones_ppm"
            ),
        )
    )


def _phash_bit_balance_sql() -> str:
    from page_rank_mapreduce_java_spark.multimodal.phash import _phash_cte

    return f"""
    WITH {_phash_cte()},
    bit_ext AS (
      SELECT t.bit_pos, (phash >> t.bit_pos) & 1 AS b
      FROM ph CROSS JOIN range({PHASH_BITS}) t(bit_pos))
    SELECT CAST(bit_pos AS BIGINT) AS bit_pos,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b) AS BIGINT) AS n_ones,
           CAST(1000000 * SUM(b) // COUNT(*) AS BIGINT) AS ones_ppm
    FROM bit_ext GROUP BY 1
"""


QUERIES = {
    "graph_local_bridges": q_graph_local_bridges,
    "graph_clustering_by_degree": q_graph_clustering_by_degree,
    "lineitem_price_elasticity_by_brand": q_lineitem_price_elasticity_by_brand,
    "levene_brown_forsythe_price": q_levene_brown_forsythe_price,
    "rec_ndcg_popularity": q_rec_ndcg_popularity,
    "rec_mrr_popularity": q_rec_mrr_popularity,
    "calibration_return_by_quantity": q_calibration_return_by_quantity,
    "embedding_mahalanobis_outliers": q_embedding_mahalanobis_outliers,
    "customer_spend_gamma_moments": q_customer_spend_gamma_moments,
    "mm_phash_bit_balance": q_mm_phash_bit_balance,
}

ORACLES = {
    "graph_local_bridges": LOCAL_BRIDGES_SQL,
    "graph_clustering_by_degree": CLUSTERING_BY_DEGREE_SQL,
    "lineitem_price_elasticity_by_brand": _elasticity_sql(),
    "levene_brown_forsythe_price": _brown_forsythe_sql(),
    "rec_ndcg_popularity": NDCG_POPULARITY_SQL,
    "rec_mrr_popularity": MRR_POPULARITY_SQL,
    "calibration_return_by_quantity": CALIBRATION_SQL,
    "embedding_mahalanobis_outliers": MAHA_OUTLIERS_SQL,
    "customer_spend_gamma_moments": _gamma_moments_sql(),
    "mm_phash_bit_balance": _phash_bit_balance_sql(),
}
