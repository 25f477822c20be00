"""Item-item collaborative filtering over the order history — the
classic implicit-feedback recommender (Sarwar et al., "Item-Based
Collaborative Filtering Recommendation Algorithms", WWW 2001; Linden et
al., IEEE Internet Computing 2003 — public literature), expressed as the
equi-join + aggregate shapes Spark executes natively.

User–item interactions: c(u, i) = lineitem rows customer u has for part
i (orders ⋈ lineitem). Item-item similarity = cosine over the user
dimension; ranking avoids ALL floating arithmetic by ordering on
cos²·10⁶ computed with integer cross-multiplication in DECIMAL(38,0) /
HUGEINT (the PPS overflow-headroom convention):

    cos²(i,j)·10⁶ = (dot(i,j)² · 10⁶) div (‖i‖²·‖j‖²)

which preserves the cosine ORDER exactly (cos ≥ 0 here — counts are
non-negative) and is bit-identical across engines.

Scale design (100 TB of interactions):
- the pair generator self-joins user→items on user_id: fan-out per user
  is basket² — bounded by per-user activity, never corpus-quadratic
  (the basket_pair_counts argument); a production run caps pathological
  users first (the heavy-user filter is one degree aggregate).
- norms join on the HIGH-cardinality item key, map-side partial sums
  apply everywhere, and the final per-item top-k is a window over the
  item key (high-cardinality again).
- user recommendation joins the user's items against the top-k neighbor
  relation (k·basket rows per user) and anti-joins owned items — no
  user×item product anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.plans.pairsize import (
    sum_sq_group_bound,
    volume_repartition_pairs,
)

REC_TOP_K = 5  # neighbors kept per item
REC_USER_N = 3  # recommendations per user
REC_USER_MOD = 100  # user sample for the recommendation query
# Min-support pruning (standard in item-item CF): pairs co-interacted-with
# by less than this weight are never similarity-ranked. Without it the
# candidate relation is dominated by dot=1 coincidences — measured 20M
# groups / 55 s at sf0.1, vs ~2M / a few seconds with support ≥ 2 — and
# at 100 TB the singleton pairs ARE the scale problem.
REC_MIN_SUPPORT = 2


def _interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c(u, i): DataFrame[user_id, item_id, c] from orders ⋈ lineitem.

    r13 (guide §2.4 — two operations keyed the same way share one
    exchange; the basket-chassis subset-key pattern, re-A/B'd in a
    quiet window after the r12 attempt drowned in ambient noise): the
    aggregate's exchange is keyed on user_id ALONE — a subset of the
    grouping key satisfies the aggregate's required distribution — so
    the downstream Σ basket² self-join on user_id (item_item_topk) and
    the user-keyed pair-bound aggregate (sum_sq_group_bound) reuse THIS
    exchange instead of re-shuffling the interactions relation."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("user_id")
    )
    l = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item_id")
    )
    return (
        l.join(o, "ok")
        .repartition("user_id")
        .groupBy("user_id", "item_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )


# Pair-aggregation sizing: the candidate-pair stream is Σ basket² rows
# — the ONE relation in this module that outgrows the session's shuffle
# parallelism. The round-7 sf10 smoke (100× sf0.1 on one 8g JVM) OOMed
# the pair sort's spill reader at 32 partitions (~2B pair rows / 32 per
# task). The fix — volume-sized pair partitioning — was proven here and
# lifted to plans/pairsize.py in round 8 as the shared chassis for every
# Σ-bound pair exchange (basket pairs, lift pairs, hamming blocks).


def item_item_topk(
    inter: DataFrame, k: int = REC_TOP_K, bound_key: str | None = None
) -> DataFrame:
    """Top-k neighbors per item by integer-exact cos² ranking, over
    pairs passing REC_MIN_SUPPORT (dot ≥ 2 — singleton co-occurrences
    never rank).

    Returns DataFrame[item_id, neighbor_id, dot, cos2_micro] — both
    directions of each pair are ranked (a neighbor list per item).

    ``bound_key`` memoizes the pair-bound aggregate per session (see
    plans/pairsize.py) so repeated plan builds over the same input —
    explain sweeps, the registry preflight, the two uses inside
    q_rec_user_topn — pay the eager bound job once (ADVICE r7)."""
    norms = inter.groupBy("item_id").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    # Volume-proportional pair partitioning (plans/pairsize.py): the
    # explicit repartition on the pair key replaces (not adds to) the
    # groupBy exchange — hash partitioning on exactly the grouping key
    # satisfies the aggregate's distribution, so Catalyst elides its own
    # shuffle. Map-side combine loses nothing: a pair's contributions
    # come from different users, so same-key rows rarely co-locate
    # pre-shuffle anyway.
    pair_bound = sum_sq_group_bound(
        inter, ["user_id"], cache_key=bound_key
    )
    # r12 optimization (guide §2.3 shuffle fewer bytes): the pair
    # generator used to emit BOTH directions of every co-interaction
    # (item_id != neighbor_id) because the top-k ranks a neighbor list
    # per item — but dot(i,j) is symmetric, so the ordered stream is
    # halved at the source (item_id < neighbor_id) and each support-
    # filtered aggregate row is mirrored by a 2-element explode in the
    # SAME branch (a union of two projections over the aggregate was
    # A/B'd and lost — it re-runs the aggregate per branch): half the
    # rows through the volume-sized pair exchange, half the aggregate
    # groups. Result set identical by dot symmetry (A/B'd row-for-row
    # at sf0.1); the halved stream's volume bound is ceil(Σsz²/2).
    # Local walls tie within host noise; the win is the exchange bytes.
    a, b = inter.alias("a"), inter.alias("b")
    half = (
        a.join(b, "user_id")
        .filter(F.col("a.item_id") < F.col("b.item_id"))
        .select(
            F.col("a.item_id").alias("item_id"),
            F.col("b.item_id").alias("neighbor_id"),
            (F.col("a.c") * F.col("b.c")).alias("cc"),
        )
    )
    half = (
        volume_repartition_pairs(
            half, ["item_id", "neighbor_id"], (pair_bound + 1) // 2
        )
        .groupBy("item_id", "neighbor_id")
        .agg(F.sum("cc").alias("dot"))
        .filter(F.col("dot") >= REC_MIN_SUPPORT)
    )
    dots = half.select(
        F.explode(
            F.array(
                F.struct(F.col("item_id"), F.col("neighbor_id"), F.col("dot")),
                F.struct(
                    F.col("neighbor_id").alias("item_id"),
                    F.col("item_id").alias("neighbor_id"),
                    F.col("dot"),
                ),
            )
        ).alias("p")
    ).select("p.item_id", "p.neighbor_id", "p.dot")
    scored = (
        dots.join(norms.withColumnRenamed("item_id", "item_id").alias("na"), "item_id")
        .join(
            norms.select(
                F.col("item_id").alias("neighbor_id"), F.col("n2").alias("nb2")
            ),
            "neighbor_id",
        )
        .withColumn(
            "cos2_micro",
            F.expr(
                "CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000)"
                " div (CAST(n2 AS DECIMAL(38,0)) * nb2) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("item_id").orderBy(
        F.desc("cos2_micro"), F.desc("dot"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("item_id", "neighbor_id", "dot", "cos2_micro")
    )


def q_rec_item_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item top-5 most-similar items by implicit-feedback cosine,
    ranked without floating arithmetic (cos²·10⁶ via DECIMAL cross-
    multiplication) so both engines order identically."""
    return item_item_topk(
        _interactions(spark, sf_dir), bound_key=f"rec_inter:{sf_dir}"
    )


def q_rec_user_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 item recommendations for the sampled user cohort
    (user_id % REC_USER_MOD == 0): score(u, j) = Σ_{i∈I(u)} c(u,i) ·
    cos2_micro(i, j) over each owned item's top-k neighbors, excluding
    items the user already interacted with. Integer scores; ties break
    on item id."""
    inter = _interactions(spark, sf_dir)
    sims = item_item_topk(inter, bound_key=f"rec_inter:{sf_dir}")
    cohort = inter.filter(F.col("user_id") % REC_USER_MOD == 0)
    scores = (
        cohort.join(sims, "item_id")
        .groupBy("user_id", F.col("neighbor_id").alias("rec_id"))
        .agg(F.sum(F.col("c") * F.col("cos2_micro")).alias("score"))
    )
    owned = cohort.select("user_id", F.col("item_id").alias("rec_id"))
    fresh = scores.join(owned, ["user_id", "rec_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("rec_id"))
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= REC_USER_N)
        .select("user_id", "rec_id", "score")
    )


def q_rec_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage of the item-item recommender: what fraction of
    interacted-with items appear in ANY top-k neighbor list (the
    standard beyond-accuracy metric — a recommender that only ever
    surfaces bestsellers has high precision and terrible coverage).
    One row: (n_items, n_recommended, coverage_ppm).

    Scale shape: the certified item_item_topk chassis (volume-sized
    pair exchange, shared memoized bound) plus two distinct-counts on
    the item key; the final combine is a 1-row broadcast cross."""
    inter = _interactions(spark, sf_dir)
    sims = item_item_topk(inter, bound_key=f"rec_inter:{sf_dir}")
    items = inter.select("item_id").distinct()
    reco = sims.select(F.col("neighbor_id").alias("item_id")).distinct()
    n_items = items.agg(F.count(F.lit(1)).alias("n_items"))
    n_rec = (
        reco.join(items, "item_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_recommended"))
    )
    return n_items.crossJoin(F.broadcast(n_rec)).select(
        "n_items",
        "n_recommended",
        F.expr(
            "CAST(n_recommended * 1000000 div n_items AS BIGINT)"
        ).alias("coverage_ppm"),
    )


_INTER_CTE = """
    inter AS (
      SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
             COUNT(*) AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2)"""

_SIMS_CTE = f"""
    norms AS (SELECT item_id, SUM(c * c) AS n2 FROM inter GROUP BY 1),
    dots AS (
      SELECT a.item_id AS item_id, b.item_id AS neighbor_id,
             SUM(a.c * b.c) AS dot
      FROM inter a JOIN inter b ON a.user_id = b.user_id
      WHERE a.item_id <> b.item_id
      GROUP BY 1, 2
      HAVING SUM(a.c * b.c) >= 2),
    scored AS (
      SELECT d.item_id, d.neighbor_id, d.dot,
             CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000)
                  // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT) AS cos2_micro
      FROM dots d
      JOIN norms na ON d.item_id = na.item_id
      JOIN norms nb ON d.neighbor_id = nb.item_id),
    sims AS (
      SELECT item_id, neighbor_id, dot, cos2_micro
      FROM (SELECT *, row_number() OVER (PARTITION BY item_id
              ORDER BY cos2_micro DESC, dot DESC, neighbor_id) AS rn
            FROM scored)
      WHERE rn <= {REC_TOP_K})"""

ITEM_ITEM_SQL = f"""
    WITH {_INTER_CTE},
    {_SIMS_CTE}
    SELECT item_id, neighbor_id, CAST(dot AS BIGINT) AS dot, cos2_micro
    FROM sims
"""

USER_TOPN_SQL = f"""
    WITH {_INTER_CTE},
    {_SIMS_CTE},
    cohort AS (SELECT * FROM inter WHERE user_id % {REC_USER_MOD} = 0),
    scores AS (
      SELECT ch.user_id, s.neighbor_id AS rec_id,
             CAST(SUM(ch.c * s.cos2_micro) AS BIGINT) AS score
      FROM cohort ch JOIN sims s ON ch.item_id = s.item_id
      GROUP BY 1, 2),
    fresh AS (
      SELECT sc.* FROM scores sc
      WHERE NOT EXISTS (SELECT 1 FROM cohort ow
                        WHERE ow.user_id = sc.user_id
                          AND ow.item_id = sc.rec_id))
    SELECT user_id, rec_id, score
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY score DESC, rec_id) AS rn FROM fresh)
    WHERE rn <= {REC_USER_N}
"""

CATALOG_COVERAGE_SQL = f"""
    WITH {_INTER_CTE},
    {_SIMS_CTE},
    items AS (SELECT DISTINCT item_id FROM inter),
    reco AS (SELECT DISTINCT neighbor_id AS item_id FROM sims),
    a AS (SELECT COUNT(*) AS n_items FROM items),
    b AS (SELECT COUNT(*) AS n_recommended FROM reco
          WHERE item_id IN (SELECT item_id FROM items))
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(n_recommended AS BIGINT) AS n_recommended,
           CAST(n_recommended * 1000000 // n_items AS BIGINT)
               AS coverage_ppm
    FROM a, b
"""

QUERIES = {
    "rec_item_item_topk": q_rec_item_item_topk,
    "rec_user_topn": q_rec_user_topn,
    "rec_catalog_coverage": q_rec_catalog_coverage,
}

ORACLES = {
    "rec_item_item_topk": ITEM_ITEM_SQL,
    "rec_user_topn": USER_TOPN_SQL,
    "rec_catalog_coverage": CATALOG_COVERAGE_SQL,
}
