"""Link-prediction and degree-structure analytics on the co-occurrence
graph — round-6 batch extending the common-neighbors family
(graph/queries.py:540): Adamic–Adar scores (the classic
inverse-log-degree weighting of shared neighbors — Adamic & Adar,
"Friends and neighbors on the Web", Social Networks 2003) and the
rich-club coefficient (Zhou & Mondragón, IEEE Comm. Lett. 2004 — do
high-degree nodes preferentially interconnect?).

Beyond-reference extension surface (the reference computes only
PageRank; SURVEY §2.9). Exactness: Adamic–Adar needs ln(deg) — the
engine's deterministic fixed-point ln (functions/text_queries2.ln_int_sql:
exponent split + atanh series, only correctly-rounded IEEE ops) renders
the IDENTICAL expression into both engines, and each wedge's
1/ln(deg) weight snaps to integer micro-units BEFORE summation (the
money convention), so scores are bit-identical. Rich-club ratios are
single terminal divisions over exact integer counts.

Scale shape: both queries reuse the hub-capped wedge chassis — degree
aggregate and wedge join shuffle on the SAME center key (one exchange
reused via AQE); wedge volume is Σ min(deg, cap)², never Σ deg²
unbounded. Rich-club fans edges out over a BOUNDED threshold relation
(×20) into a map-side-combined count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.functions.text_queries2 import ln_int_sql
from page_rank_mapreduce_java_spark.graph.queries import (
    COMMON_NEIGHBORS_DEG_CAP,
    COOC_EDGES_SQL,
    cooccurrence_edges,
)

RICH_CLUB_MAX_K = 20


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 supplier pairs by Adamic–Adar score: each shared neighbor
    w contributes 1/ln(deg(w)) — rare partners say more about a link
    than ubiquitous hubs. Per-wedge weight = ROUND(1e6 / lnhat(deg)),
    summed as exact integers; centers above the hub cap (and the
    degree-1 centers that cannot form a wedge, whose ln would be 0) are
    dropped before the wedge join, mirroring q_common_neighbors."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    centers = (
        sym.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .filter(
            (F.col("_deg") >= 2) & (F.col("_deg") <= COMMON_NEIGHBORS_DEG_CAP)
        )
        .withColumn(
            "w_micro",
            F.expr(
                f"CAST(ROUND(1e6 / ({ln_int_sql('_deg', 'spark')}), 0) AS BIGINT)"
            ),
        )
        .select("dst", "w_micro")
    )
    symc = sym.join(centers, "dst")
    a, b = symc.alias("a"), symc.alias("b")
    return (
        a.join(b, F.col("a.dst") == F.col("b.dst"))
        .filter(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(
            F.sum(F.col("a.w_micro")).alias("aa_micro"),
            F.count(F.lit(1)).alias("n_common"),
        )
        .orderBy(F.desc("aa_micro"), F.asc("u"), F.asc("v"))
        .limit(25)
    )


def _adamic_adar_sql() -> str:
    w = f"CAST(ROUND(1e6 / ({ln_int_sql('d', 'duckdb')}), 0) AS BIGINT)"
    return f"""
    WITH e AS MATERIALIZED ({COOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    centers AS (
      SELECT dst, {w} AS w_micro
      FROM (SELECT dst, COUNT(*) AS d FROM sym GROUP BY 1)
      WHERE d >= 2 AND d <= {COMMON_NEIGHBORS_DEG_CAP}
    ),
    symc AS (SELECT s.src, s.dst, c.w_micro FROM sym s JOIN centers c USING (dst)),
    p AS (
      SELECT a.src AS u, b.src AS v,
             CAST(SUM(a.w_micro) AS BIGINT) AS aa_micro,
             COUNT(*) AS n_common
      FROM symc a JOIN symc b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT u, v, aa_micro, n_common FROM p
    ORDER BY aa_micro DESC, u, v LIMIT 25
"""


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) for k = 1..20: among nodes of degree
    > k, the realized fraction of possible edges, in ppm. A rising φ(k)
    means hubs form a club (interbank/airline shape); flat-or-falling
    means hub independence. n_nodes/n_edges are exact integers; the
    single terminal division rounds identically on both engines.

    Shape: degrees once; each edge joins its endpoints' degrees
    (node-sized broadcast-able relation), then fans out over the ×20
    bounded threshold relation into one map-side-combined count —
    no windows, no per-k scans."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ks = spark.range(1, RICH_CLUB_MAX_K + 1).select(
        F.col("id").cast("int").alias("k")
    )
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    ed = (
        e.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
        .select(F.least("du", "dv").alias("mindeg"))
    )
    ek = (
        ed.crossJoin(F.broadcast(ks))
        .filter(F.col("mindeg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            "k",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round(
                F.lit(2e6)
                * F.coalesce("n_edges", F.lit(0)).cast("double")
                / (
                    F.col("n_nodes").cast("double")
                    * (F.col("n_nodes").cast("double") - 1.0)
                )
            )
            .cast("long")
            .alias("phi_ppm"),
        )
        .filter(F.col("n_nodes") >= 2)
    )


RICH_CLUB_SQL = f"""
    WITH e AS MATERIALIZED ({COOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY 1),
    ks AS (SELECT CAST(unnest(range(1, {RICH_CLUB_MAX_K} + 1)) AS INTEGER) AS k),
    nk AS (SELECT k, COUNT(*) AS n_nodes FROM deg, ks WHERE d > k GROUP BY 1),
    ed AS (SELECT LEAST(du.d, dv.d) AS mindeg
           FROM e JOIN deg du ON e.src = du.id JOIN deg dv ON e.dst = dv.id),
    ek AS (SELECT k, COUNT(*) AS n_edges FROM ed, ks WHERE mindeg > k GROUP BY 1)
    SELECT nk.k, nk.n_nodes,
           CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
           CAST(ROUND(2e6 * CAST(COALESCE(ek.n_edges, 0) AS DOUBLE)
                      / (CAST(nk.n_nodes AS DOUBLE)
                         * (CAST(nk.n_nodes AS DOUBLE) - 1.0)), 0)
                AS BIGINT) AS phi_ppm
    FROM nk LEFT JOIN ek ON nk.k = ek.k
    WHERE nk.n_nodes >= 2
"""


def q_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the degree distribution — the one-number hub
    concentration complementing rich-club's per-threshold view (0 =
    perfectly even graph, →1 = star). Exact integers end to end:
    G = Σ(2i − n − 1)·d_(i) / (n·Σd) over degrees ranked ascending,
    with the rank from the two-pass global ranking chassis
    (operators/ranking.global_row_number — a node-sized relation still
    never funnels through one task), one terminal division to ppm.
    Output: (n_nodes, sum_degree, gini_ppm)."""
    from page_rank_mapreduce_java_spark.operators.ranking import global_row_number

    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    r = global_row_number(deg, [F.asc("d"), F.asc("id")], out_col="i")
    tot = r.agg(F.count(F.lit(1)).alias("n"), F.sum("d").alias("sd"))
    num = r.crossJoin(F.broadcast(tot)).agg(
        F.first("n").alias("n_nodes"),
        F.first("sd").alias("sum_degree"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("d")).alias("_num"),
    )
    return num.select(
        "n_nodes",
        "sum_degree",
        F.round(
            F.col("_num").cast("double")
            / (F.col("n_nodes").cast("double") * F.col("sum_degree").cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("gini_ppm"),
    )


DEGREE_GINI_SQL = f"""
    WITH e AS MATERIALIZED ({COOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d
            FROM sym GROUP BY 1),
    r AS (SELECT d, CAST(row_number() OVER (ORDER BY d, id) AS BIGINT) AS i
          FROM deg),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(d) AS BIGINT) AS sd FROM r)
    SELECT n AS n_nodes, sd AS sum_degree,
           CAST(ROUND(CAST(SUM((2 * i - n - 1) * d) AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(sd AS DOUBLE)) * 1e6, 0)
                AS BIGINT) AS gini_ppm
    FROM r, t GROUP BY n, sd
"""


def q_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 nodes by 2-hop reach: |{w ≠ u reachable in ≤ 2 hops}| —
    the local influence-sphere size (the BFS-frontier statistic without
    running BFS per node). Wedges route only through centers with
    degree ≤ the hub cap (the common-neighbors convention — a hub
    center would blow the wedge join quadratically AND mostly connect
    already-adjacent nodes); direct neighbors always count. Output
    (node, reach), ties broken on node id.

    Scale shape: the wedge join shuffles on the center key with
    Σ min(deg,cap)² volume; the distinct + count shuffle on the node
    key; top-25 is TakeOrderedAndProject (no global window)."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    small = deg.filter(F.col("_deg") <= COMMON_NEIGHBORS_DEG_CAP)
    thru = sym.join(small.select("src"), "src")  # center-capped
    a = thru.select(F.col("src").alias("mid"), F.col("dst").alias("u"))
    b = thru.select(F.col("src").alias("mid"), F.col("dst").alias("w"))
    two = a.join(b, "mid").filter(F.col("u") != F.col("w")).select("u", "w")
    reach = (
        two.unionByName(sym.select(F.col("src").alias("u"), F.col("dst").alias("w")))
        .distinct()
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("reach"))
    )
    return (
        reach.orderBy(F.desc("reach"), F.asc("u"))
        .limit(25)
        .select(F.col("u").alias("node"), "reach")
    )


TWO_HOP_SQL = f"""
    WITH e AS ({COOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY 1),
    thru AS (
      SELECT s.src, s.dst FROM sym s JOIN deg ON s.src = deg.src
      WHERE deg.d <= {COMMON_NEIGHBORS_DEG_CAP}
    ),
    two AS (
      SELECT a.dst AS u, b.dst AS w
      FROM thru a JOIN thru b ON a.src = b.src
      WHERE a.dst <> b.dst
    ),
    reach AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS reach FROM (
        SELECT DISTINCT u, w FROM
          (SELECT u, w FROM two UNION ALL SELECT src AS u, dst AS w FROM sym)
      ) GROUP BY 1
    )
    SELECT u AS node, reach FROM reach ORDER BY reach DESC, node LIMIT 25
"""


def q_degree_mixing_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-band mixing matrix: edge counts between log₂ degree
    bands — the structural fingerprint behind assortativity (a single
    coefficient can hide WHERE the mixing happens; the matrix shows
    it). Bands are ⌊log₂ deg⌋ via integer bit-length, exact on both
    engines. Output (band_lo, band_hi, n_edges) with band_lo ≤ band_hi
    (undirected edges counted once).

    Scale shape: degree aggregate shuffles on the node key; each edge
    picks up its endpoints' bands via two joins on that same key;
    output is a ≤ log²(max_deg) bounded matrix."""
    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    band = (F.length(F.expr("bin(_deg)")) - 1).cast("long")
    deg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .select(F.col("src").alias("node"), band.alias("band"))
    )
    j = (
        e.join(deg.withColumnsRenamed({"node": "src", "band": "bs"}), "src")
        .join(deg.withColumnsRenamed({"node": "dst", "band": "bd"}), "dst")
    )
    return (
        j.groupBy(
            F.least("bs", "bd").alias("band_lo"),
            F.greatest("bs", "bd").alias("band_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


MIXING_SQL = f"""
    WITH e AS ({COOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (
      SELECT src AS node,
             CAST(length(bin(COUNT(*))) - 1 AS BIGINT) AS band
      FROM sym GROUP BY 1
    )
    SELECT LEAST(a.band, b.band) AS band_lo,
           GREATEST(a.band, b.band) AS band_hi,
           CAST(COUNT(*) AS BIGINT) AS n_edges
    FROM e JOIN deg a ON e.src = a.node JOIN deg b ON e.dst = b.node
    GROUP BY 1, 2
"""


QUERIES = {
    "graph_adamic_adar": q_adamic_adar,
    "graph_rich_club": q_rich_club,
    "graph_degree_gini": q_degree_gini,
    "graph_two_hop_reach": q_two_hop_reach,
    "graph_degree_mixing_matrix": q_degree_mixing_matrix,
}

ORACLES = {
    "graph_adamic_adar": _adamic_adar_sql(),
    "graph_rich_club": RICH_CLUB_SQL,
    "graph_degree_gini": DEGREE_GINI_SQL,
    "graph_two_hop_reach": TWO_HOP_SQL,
    "graph_degree_mixing_matrix": MIXING_SQL,
}
