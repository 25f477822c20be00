"""Relational/analytics surface, batch 26 (round 8 growth, eighth
wave): component-size histogram of the derived graph, nation-affinity
lift (the normalized trade-flow matrix), winsorized mean on the
global-ranking chassis, embedding label-centroid distance matrix, and
the token savings a dedup keeper policy would realize.

Beyond-reference extension surface (SURVEY §2.9 / LLM-pipeline family).
Like batches 19-25, registered after the round-8 audit window filled:
locally oracle-certified at two scale factors and deferred to the
round-9 driver window via `_DEFER_TO_NEXT_ROUND`.

Exactness conventions (inherited): integer grains before sums,
DECIMAL(38,0)/HUGEINT sufficient statistics, integer `div` (truncation
parity) or the identical correctly-rounded double expression."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.catalog import load_table
from page_rank_mapreduce_java_spark.dedup.queries import (
    _dedup_clusters_sql,
    q_dedup_clusters,
)
from page_rank_mapreduce_java_spark.functions.money import cents, cents_sql
from page_rank_mapreduce_java_spark.functions.text_queries2 import WORDS_SQL
from page_rank_mapreduce_java_spark.functions.textfn import words
from page_rank_mapreduce_java_spark.graph.queries import (
    CC_ITERS,
    _cc_oracle_sql,
    derived_edges,
)
from page_rank_mapreduce_java_spark.operators.ranking import global_row_number
from page_rank_mapreduce_java_spark.operators.relational14 import (
    FLOW_SQL,
    q_supplier_nation_flow,
)


# --- component size histogram ---------------------------------------------------


def q_graph_wcc_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the weakly-connected components of the
    customer→supplier graph — the giant-component diagnostic (a
    healthy interaction graph has one giant component plus a dust
    tail; many mid-sized components flag partitioned marketplaces).
    Output per size: (component_size, n_components, n_nodes).

    Exactness: pure integer counting over the certified min-label-
    propagation component assignment (graph/algorithms.py).

    Scale shape: the certified CC superstep chassis, then a
    component-keyed count (high cardinality) into the bounded size
    domain.
    """
    from page_rank_mapreduce_java_spark.graph.algorithms import (
        connected_components,
    )

    comp = connected_components(
        derived_edges(spark, sf_dir), max_iterations=CC_ITERS
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    return (
        sizes.groupBy("component_size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .select(
            F.col("component_size").cast("long").alias("component_size"),
            F.col("n_components").cast("long").alias("n_components"),
            (F.col("component_size") * F.col("n_components"))
            .cast("long")
            .alias("n_nodes"),
        )
    )


WCC_HIST_SQL = f"""
    WITH sizes AS (
      SELECT component, COUNT(*) AS component_size
      FROM ({_cc_oracle_sql()}) GROUP BY component)
    SELECT CAST(component_size AS BIGINT) AS component_size,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(component_size * COUNT(*) AS BIGINT) AS n_nodes
    FROM sizes GROUP BY component_size
"""


# --- nation affinity lift ---------------------------------------------------------


def q_nation_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade affinity: observed (supplier nation →
    customer nation) revenue vs the independence expectation
    (row marginal × column marginal / total) — the lift normalization
    of supplier_nation_flow's raw matrix, in ppm (1e6 = exactly as
    expected; above = affine trade lanes). Output:
    (supp_nation, cust_nation, revenue_cents, lift_ppm).

    Exactness: exact cent sums; the terminal
    (rev·total)/(row·col) ratio is the identical correctly-rounded
    double expression on both engines.

    Scale shape: the certified broadcast-dim star join of
    supplier_nation_flow into a 25×25-bounded matrix; marginals and
    the total ride broadcast joins of bounded relations.
    """
    flow = q_supplier_nation_flow(spark, sf_dir)
    row = flow.groupBy("supp_nation").agg(F.sum("revenue_cents").alias("_row"))
    col = flow.groupBy("cust_nation").agg(F.sum("revenue_cents").alias("_col"))
    tot = flow.agg(F.sum("revenue_cents").alias("_tot"))
    lift = (
        (F.col("revenue_cents").cast("double") * F.col("_tot").cast("double"))
        / (F.col("_row").cast("double") * F.col("_col").cast("double"))
        * 1e6
    )
    return (
        flow.join(F.broadcast(row), "supp_nation")
        .join(F.broadcast(col), "cust_nation")
        .crossJoin(F.broadcast(tot))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("revenue_cents").cast("long").alias("revenue_cents"),
            F.round(lift).cast("long").alias("lift_ppm"),
        )
    )


AFFINITY_SQL = f"""
    WITH flow AS ({FLOW_SQL}),
    r AS (SELECT supp_nation, SUM(revenue_cents) AS rm FROM flow GROUP BY 1),
    c AS (SELECT cust_nation, SUM(revenue_cents) AS cm FROM flow GROUP BY 1),
    t AS (SELECT SUM(revenue_cents) AS tm FROM flow)
    SELECT f.supp_nation, f.cust_nation,
           CAST(f.revenue_cents AS BIGINT) AS revenue_cents,
           CAST(ROUND(CAST(f.revenue_cents AS DOUBLE) * CAST(tm AS DOUBLE)
                      / (CAST(rm AS DOUBLE) * CAST(cm AS DOUBLE)) * 1e6, 0)
                AS BIGINT) AS lift_ppm
    FROM flow f
      JOIN r ON f.supp_nation = r.supp_nation
      JOIN c ON f.cust_nation = c.cust_nation
      CROSS JOIN t
"""


# --- winsorized mean on the ranking chassis ----------------------------------------

WINSOR_LO_PCT = 1  # clamp below the 1st percentile
WINSOR_HI_PCT = 99  # clamp above the 99th


def q_lineitem_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of extended price: clamp both tails to the
    exact nearest-rank p01/p99 values, then average — the
    robust-location companion to agg_trimmed_mean (trimming DROPS the
    tails; winsorizing CLAMPS them, keeping n constant). One row:
    (n, p01_cents, p99_cents, mean_cents, winsorized_mean_cents).

    Exactness: the cut positions are nearest-rank (ceil(p·n)) picks on
    the two-pass global row number — no interpolation; both means are
    integer divisions of exact cent sums (clamped values are exact
    cents too, so the winsorized sum is exact).

    Scale shape: one range exchange (the certified global-ranking
    chassis); the two pivot rows ride a 1-row broadcast cross into a
    single full aggregate. No single-task window.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        cents("l_extendedprice").alias("v"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    ranked = global_row_number(li, [F.asc("v"), F.asc("ok"), F.asc("ln")], "rn")
    tot = ranked.agg(F.count(F.lit(1)).alias("n"))
    marked = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "_lo_pos", F.expr(f"({WINSOR_LO_PCT} * n + 99) div 100")
    ).withColumn(
        "_hi_pos", F.expr(f"({WINSOR_HI_PCT} * n + 99) div 100")
    )
    lo = marked.filter(F.col("rn") == F.col("_lo_pos")).select(
        F.col("v").alias("p01_cents")
    )
    hi = marked.filter(F.col("rn") == F.col("_hi_pos")).select(
        F.col("v").alias("p99_cents")
    )
    clamped = (
        ranked.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "v",
            "p01_cents",
            "p99_cents",
            F.greatest(
                F.col("p01_cents"), F.least(F.col("p99_cents"), F.col("v"))
            ).alias("w"),
        )
    )
    return clamped.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("p01_cents").alias("p01_cents"),
        F.first("p99_cents").alias("p99_cents"),
        F.expr(
            "CAST(SUM(CAST(v AS DECIMAL(38,0))) div COUNT(*) AS BIGINT)"
        ).alias("mean_cents"),
        F.expr(
            "CAST(SUM(CAST(w AS DECIMAL(38,0))) div COUNT(*) AS BIGINT)"
        ).alias("winsorized_mean_cents"),
    )


WINSORIZED_SQL = f"""
    WITH li AS (
      SELECT {cents_sql("l_extendedprice")} AS v,
             l_orderkey AS ok, l_linenumber AS ln
      FROM lineitem),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, ok, ln) AS rn,
             COUNT(*) OVER () AS n
      FROM li),
    piv AS (
      SELECT MIN(CASE WHEN rn = ({WINSOR_LO_PCT} * n + 99) // 100
                      THEN v END) AS p01,
             MIN(CASE WHEN rn = ({WINSOR_HI_PCT} * n + 99) // 100
                      THEN v END) AS p99
      FROM ranked)
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
           CAST(ANY_VALUE(p01) AS BIGINT) AS p01_cents,
           CAST(ANY_VALUE(p99) AS BIGINT) AS p99_cents,
           CAST(SUM(CAST(v AS HUGEINT)) // COUNT(*) AS BIGINT) AS mean_cents,
           CAST(SUM(CAST(GREATEST(p01, LEAST(p99, v)) AS HUGEINT))
                // COUNT(*) AS BIGINT) AS winsorized_mean_cents
    FROM ranked, piv
"""


# --- embedding label-centroid distance matrix ---------------------------------------


def q_embedding_label_centroid_distances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise squared distances between per-label embedding
    centroids — the class-separability audit before trusting the
    label column for supervised eval (two labels whose centroids
    nearly coincide are indistinguishable to a linear probe). Output
    per unordered label pair: (la, lb, dist_micro2).

    Exactness: with per-label per-dim micro-int sums S and counts n,
    ‖c_a − c_b‖² = Σ_d (S_a/n_a − S_b/n_b)² =
    [Σ_d (S_a·n_b − S_b·n_a)²] / (n_a·n_b)² EXACTLY — the numerator is
    a DECIMAL(38,0) integer (order-independent sum), the single
    terminal `div` floors to micro² (documented bound: exact while
    (S·n)² < 10³⁸, i.e. label sizes to ~3×10⁶ vectors at unit-scale
    embeddings; past that, sample the calibration set — this is an
    audit metric, not a corpus pass).

    Scale shape: posexplode → one (label, dim)-keyed aggregate
    (map-side combinable) → the bounded label-pair cross (≤k²/2 rows,
    k = label count) with a dim-keyed join underneath — never a
    vector-pair join.
    """
    e = load_table(spark, "embeddings", sf_dir)
    x = e.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v").cast("double") * 1e6).cast("long").alias("vm"),
    )
    agg = x.groupBy("label", "pos").agg(
        F.sum(F.col("vm").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    a = agg.select(
        F.col("label").alias("la"),
        "pos",
        F.col("s").alias("sa"),
        F.col("n").alias("na"),
    )
    b = agg.select(
        F.col("label").alias("lb"),
        "pos",
        F.col("s").alias("sb"),
        F.col("n").alias("nb"),
    )
    num = (
        a.join(b, "pos")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(
                (F.col("sa") * F.col("nb") - F.col("sb") * F.col("na"))
                * (F.col("sa") * F.col("nb") - F.col("sb") * F.col("na"))
            ).alias("_num"),
            F.first("na").alias("_na"),
            F.first("nb").alias("_nb"),
        )
    )
    return num.select(
        F.col("la").cast("long").alias("la"),
        F.col("lb").cast("long").alias("lb"),
        F.expr(
            "CAST(_num div (CAST(_na AS DECIMAL(38,0)) * _na * _nb * _nb)"
            " AS BIGINT)"
        ).alias("dist_micro2"),
    )


LABEL_DIST_SQL = """
    WITH x AS (
      SELECT label, unnest(range(1, len(embedding) + 1)) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6, 0)
                  AS BIGINT) AS vm
      FROM embeddings),
    agg AS (
      SELECT label, pos, SUM(CAST(vm AS HUGEINT)) AS s, COUNT(*) AS n
      FROM x GROUP BY 1, 2)
    SELECT CAST(a.label AS BIGINT) AS la, CAST(b.label AS BIGINT) AS lb,
           CAST(SUM((a.s * b.n - b.s * a.n) * (a.s * b.n - b.s * a.n))
                // (CAST(ANY_VALUE(a.n) AS HUGEINT) * ANY_VALUE(a.n)
                    * ANY_VALUE(b.n) * ANY_VALUE(b.n)) AS BIGINT)
             AS dist_micro2
    FROM agg a JOIN agg b ON a.pos = b.pos AND a.label < b.label
    GROUP BY 1, 2
"""


# --- dedup token savings -------------------------------------------------------------


def q_dedup_savings_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token savings of the keep-one-per-cluster dedup policy, per
    language: how many training tokens the near-dup drop list
    (dedup_clusters' non-canonical members) removes — the number that
    justifies the dedup stage's compute bill. Output per lang:
    (lang, n_docs, n_dropped_docs, tokens_total, tokens_dropped,
    saved_ppm).

    Exactness: pure integer token counting; saved_ppm is integer
    `div` (truncation parity).

    Scale shape: the certified dedup_clusters chassis (collision-
    volume CC), one token-count aggregate at document grain, one
    bounded per-lang rollup.
    """
    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "is_dup")
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", F.size(words(F.col("text"))).alias("tok")
    )
    j = d.join(clusters, "doc_id", "left").select(
        "lang",
        "tok",
        F.coalesce(F.col("is_dup").cast("int"), F.lit(0)).alias("dup"),
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dup").alias("n_dropped_docs"),
            F.sum("tok").alias("tokens_total"),
            F.sum(F.col("tok") * F.col("dup")).alias("tokens_dropped"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_dropped_docs").cast("long").alias("n_dropped_docs"),
            F.col("tokens_total").cast("long").alias("tokens_total"),
            F.col("tokens_dropped").cast("long").alias("tokens_dropped"),
            F.expr(
                "CAST(1000000 * tokens_dropped div tokens_total AS BIGINT)"
            ).alias("saved_ppm"),
        )
    )


SAVINGS_SQL = f"""
    WITH clusters AS (SELECT doc_id, is_dup FROM ({_dedup_clusters_sql()})),
    d AS (SELECT doc_id, lang, len({WORDS_SQL}) AS tok FROM documents),
    j AS (
      SELECT d.lang, d.tok,
             COALESCE(CAST(c.is_dup AS INT), 0) AS dup
      FROM d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dup) AS BIGINT) AS n_dropped_docs,
           CAST(SUM(tok) AS BIGINT) AS tokens_total,
           CAST(SUM(tok * dup) AS BIGINT) AS tokens_dropped,
           CAST(1000000 * SUM(tok * dup) // SUM(tok) AS BIGINT)
             AS saved_ppm
    FROM j GROUP BY 1
"""


QUERIES = {
    "graph_wcc_size_histogram": q_graph_wcc_size_histogram,
    "nation_affinity_lift": q_nation_affinity_lift,
    "lineitem_winsorized_mean": q_lineitem_winsorized_mean,
    "embedding_label_centroid_distances": q_embedding_label_centroid_distances,
    "dedup_savings_tokens": q_dedup_savings_tokens,
}

ORACLES = {
    "graph_wcc_size_histogram": WCC_HIST_SQL,
    "nation_affinity_lift": AFFINITY_SQL,
    "lineitem_winsorized_mean": WINSORIZED_SQL,
    "embedding_label_centroid_distances": LABEL_DIST_SQL,
    "dedup_savings_tokens": SAVINGS_SQL,
}
