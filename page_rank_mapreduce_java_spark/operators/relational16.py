"""Relational/analytics surface, batch 16 (round 7 final): the
exact-integer PCA top component over int8-quantized embeddings, a
null-safe join (NULL ≡ NULL key matching — the one join flavor the
family lacked), and the longest coverage-gap dual of interval-union
coverage.

Beyond-reference extension surface (SURVEY §2.9). Exactness: the gap
sweep is pure integer/count arithmetic; PCA quantizes once
through the SAME shared terminal expression the int8 audit uses
(similarity/queries._QUANT_Q) and then runs ENTIRELY on integers —
the Gram matrix is exact int64 sums of int8 products and every power-
iteration normalize is a sign-split integer floor division (positive
operands, so Spark's truncating ``div`` and DuckDB's flooring ``//``
agree), never a float. No float 2^53 ceiling anywhere; the w = Σ g·val
accumulator runs in DECIMAL(38,0) (mirroring DuckDB's HUGEINT
promotion of SUM(BIGINT)), so exact cross-engine parity holds to
~1e16 vectors — decimal38 overflow, not int64 wrap, is the bound.

Scale shape: PCA's one heavy shuffle
is the vec_id self-join building the bounded 64×64 Gram relation —
iterations then run on ≤64-row relations with broadcast scalars; the
null-safe join is an ordinary equi-join on a null-normalized key; the
gap sweep is the per-customer island chassis from interval coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.catalog import load_table


# --- exact-integer PCA top component ------------------------------------------

PCA_ITERS = 6


def q_embedding_pca_top_component(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leading principal direction of the embedding corpus (64 dims) by
    power iteration on the int8-quantized Gram matrix — the exactness
    trick: after the one shared-expression quantize step everything is
    integer (G = Σ q·qᵀ exact in int64; each of the PCA_ITERS (6)
    iterations renormalizes with a sign-split integer floor division by
    d = max|w| // 1e6 + 1, keeping entries ≤ 1e6 with no float and no
    2^53 ceiling). The all-ones start vector fixes the eigenvector sign.
    Output (pos, loading_ppm): each dimension's loading in ppm of the
    max-|loading| dimension.

    Scale shape: ONE fact-scale shuffle — the per-vector self-join that
    reduces straight into the bounded 64×64 Gram relation (map-side
    combine collapses the d² pair stream; pair volume per row is dim²,
    a constant). The Gram relation is lineage-cut once; all PCA_ITERS
    iterations are ≤64-row broadcast jobs. At 100 TB the corpus is
    touched exactly once."""
    from page_rank_mapreduce_java_spark.similarity.queries import _QUANT_Q

    emb = load_table(spark, "embeddings", sf_dir)
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("x").cast("double").alias("v"),
    )
    rng = x.groupBy("pos").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    q = (
        x.join(F.broadcast(rng), "pos")
        .withColumn("q", F.expr(_QUANT_Q))
        .select("vec_id", "pos", "q")
    )
    qj = q.select(
        F.col("vec_id").alias("vec_id2"),
        F.col("pos").alias("pos_j"),
        F.col("q").alias("q_j"),
    )
    gram = (
        q.join(qj, q.vec_id == qj.vec_id2)
        .groupBy(F.col("pos").alias("i"), F.col("pos_j").alias("j"))
        .agg(F.sum(F.col("q") * F.col("q_j")).alias("g"))
        .localCheckpoint()
    )
    v = gram.select(F.col("i").alias("pos")).distinct().select(
        "pos", F.lit(1_000_000).cast("long").alias("val")
    )
    for _ in range(PCA_ITERS):
        w_ = (
            gram.join(
                F.broadcast(v.select(F.col("pos").alias("jj"), "val")),
                F.col("j") == F.col("jj"),
            )
            .groupBy(F.col("i").alias("pos"))
            # Accumulate w in DECIMAL(38,0), matching DuckDB's HUGEINT
            # promotion of SUM(BIGINT): the g·val terms reach
            # ~16129·n_vectors·1e6, so an int64 accumulator would wrap
            # silently past ~1e7 vectors while the oracle promoted —
            # decimal keeps cross-engine parity to ~1e16 vectors (the
            # honest bound; decimal38 overflow, not 2^63).
            .agg(
                F.sum(
                    F.col("g").cast("decimal(38,0)") * F.col("val")
                ).alias("w")
            )
        )
        m = w_.agg((F.max(F.abs(F.col("w"))).alias("m")))
        v = (
            w_.crossJoin(F.broadcast(m))
            .select(
                "pos",
                F.expr(
                    "CAST(CASE WHEN w < 0 THEN -((-w) div (m div 1000000 + 1))"
                    " ELSE w div (m div 1000000 + 1) END AS BIGINT)"
                ).alias("val"),
            )
            .localCheckpoint()
        )
    m2 = v.agg(F.max(F.abs(F.col("val"))).alias("m2"))
    return v.crossJoin(F.broadcast(m2)).select(
        F.col("pos").cast("long").alias("pos"),
        F.expr(
            "CAST(CASE WHEN val < 0 THEN -((-val) * 1000000 div m2)"
            " ELSE val * 1000000 div m2 END AS BIGINT)"
        ).alias("loading_ppm"),
    )


def _pca_sql() -> str:
    from page_rank_mapreduce_java_spark.similarity.queries import _QUANT_Q

    iters = "".join(
        f""",
    w{k} AS (
      SELECT g.i AS pos, SUM(g.g * v.val) AS w
      FROM gram g JOIN v{k} v ON g.j = v.pos GROUP BY 1
    ),
    m{k} AS (SELECT MAX(abs(w)) AS m FROM w{k}),
    v{k + 1} AS (
      SELECT pos,
             CAST(CASE WHEN w < 0 THEN -((-w) // (m // 1000000 + 1))
                  ELSE w // (m // 1000000 + 1) END AS BIGINT) AS val
      FROM w{k} CROSS JOIN m{k}
    )"""
        for k in range(PCA_ITERS)
    )
    return f"""
    WITH x AS (
      SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    rng AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM x GROUP BY 1),
    q AS (
      SELECT vec_id, pos, {_QUANT_Q} AS q
      FROM x JOIN rng USING (pos)
    ),
    gram AS MATERIALIZED (
      SELECT a.pos AS i, b.pos AS j, SUM(a.q * b.q) AS g
      FROM q a JOIN q b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    v0 AS (
      SELECT DISTINCT i AS pos, CAST(1000000 AS BIGINT) AS val FROM gram
    ){iters},
    m_fin AS (SELECT MAX(abs(val)) AS m2 FROM v{PCA_ITERS})
    SELECT CAST(pos AS BIGINT) AS pos,
           CAST(CASE WHEN val < 0 THEN -((-val) * 1000000 // m2)
                ELSE val * 1000000 // m2 END AS BIGINT) AS loading_ppm
    FROM v{PCA_ITERS} CROSS JOIN m_fin
"""


# --- null-safe join -----------------------------------------------------------

# Deterministic NULL injection: every 97th customer and 89th supplier
# "loses" its nation key, modelling the unknown-dimension rows a real
# warehouse carries. The null-safe join must pair the unknowns with
# each other (NULL ≡ NULL), which a plain equi-join silently drops.


def q_join_null_safe_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (Spark's <=> / SQL's IS NOT DISTINCT FROM):
    customers and suppliers matched on a nation key where a
    deterministic slice of each side is NULL — the NULL×NULL pairs
    must survive. Output per matched key (-1 encodes the NULL group,
    keeping the result NULL-free for canonicalization): n_pairs.

    Scale shape: Spark plans <=> as an ordinary hash-partitioned
    equi-join on the null-normalized key, so this shuffles once per
    side like any join; the NULL bucket is a known single hot key.
    The mitigation is REGISTERED as the salted twin
    (join_null_safe_nations_salted below, on the plans/skew.py
    hot-key chassis) — run the twin when the NULL slice is heavy;
    this plain form stays optimal on balanced keys (A/B in PERF.md
    §r8)."""
    c = load_table(spark, "customer", sf_dir).select(
        F.when(F.col("c_custkey") % 97 != 0, F.col("c_nationkey")).alias(
            "c_nk"
        )
    )
    s = load_table(spark, "supplier", sf_dir).select(
        F.when(F.col("s_suppkey") % 89 != 0, F.col("s_nationkey")).alias(
            "s_nk"
        )
    )
    return (
        c.join(s, F.col("c_nk").eqNullSafe(F.col("s_nk")))
        .groupBy(F.coalesce(F.col("c_nk"), F.lit(-1)).alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(F.col("nk").cast("long").alias("nk"), "n_pairs")
    )


def q_join_null_safe_nations_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The hot-key-salted twin of join_null_safe_nations (VERDICT r7
    next #5): identical relation, but the single known hot key — the
    NULL bucket, normalized to -1 — is routed through the targeted
    salted-join chassis (plans/skew.salted_join_hot_keys). Customer
    rows on the hot key get salt = xxhash64(c_custkey) % 16, the
    matching supplier rows are replicated across the 16 salts, cold
    nation keys pay nothing, and the join key becomes (nk, salt) — so
    a 100 TB NULL-heavy column spreads its NULL×NULL product over 16
    reducers instead of one straggler. The count aggregate partial-
    aggregates map-side, so re-concentrating on nk after the join
    moves only 16 partials per key.

    Exactness: row-identical to the plain form by salted_join_hot_keys'
    contract; same oracle SQL."""
    from page_rank_mapreduce_java_spark.plans.skew import (
        salted_join_hot_keys,
    )

    c = load_table(spark, "customer", sf_dir).select(
        F.coalesce(
            F.when(F.col("c_custkey") % 97 != 0, F.col("c_nationkey")),
            F.lit(-1),
        )
        .cast("long")
        .alias("nk"),
        "c_custkey",
    )
    s = load_table(spark, "supplier", sf_dir).select(
        F.coalesce(
            F.when(F.col("s_suppkey") % 89 != 0, F.col("s_nationkey")),
            F.lit(-1),
        )
        .cast("long")
        .alias("nk")
    )
    hot = spark.createDataFrame([(-1,)], "nk long")
    joined = salted_join_hot_keys(
        c, s, "nk", hot, n_salts=16, salt_src=F.col("c_custkey")
    )
    return joined.groupBy("nk").agg(F.count(F.lit(1)).alias("n_pairs"))


NULL_SAFE_SQL = """
    WITH c AS (
      SELECT CASE WHEN c_custkey % 97 != 0 THEN c_nationkey END AS c_nk
      FROM customer
    ),
    s AS (
      SELECT CASE WHEN s_suppkey % 89 != 0 THEN s_nationkey END AS s_nk
      FROM supplier
    )
    SELECT CAST(COALESCE(c_nk, -1) AS BIGINT) AS nk, COUNT(*) AS n_pairs
    FROM c JOIN s ON c_nk IS NOT DISTINCT FROM s_nk
    GROUP BY 1
"""


# --- longest coverage gap -----------------------------------------------------


def q_interval_longest_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 customers by their LONGEST dormant stretch: the largest
    day gap between consecutive merged order-coverage islands (the
    extraction dual of interval_coverage_days' union length — same
    sweep, but the metric is the hole, not the cover). Customers whose
    islands all touch are excluded (no gap). Output (c_custkey,
    max_gap_days), ties on custkey.

    Scale shape: identical to the coverage sweep — per-customer keyed
    sort window carrying the running max end; a gap materializes only
    on island boundaries; the reduction is one max per customer and
    top-25 is TakeOrderedAndProject."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").cast("date").alias("lo"),
    )
    close = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("ship"))
    )
    iv = o.join(close, o.o_orderkey == close.l_orderkey, "left").select(
        "ck",
        "lo",
        F.greatest(F.coalesce(F.col("ship"), F.col("lo")), F.col("lo")).alias(
            "hi"
        ),
    )
    w = Window.partitionBy("ck").orderBy("lo", "hi").rowsBetween(
        Window.unboundedPreceding, -1
    )
    gaps = (
        iv.withColumn("prev_max", F.max("hi").over(w))
        .filter(
            F.col("prev_max").isNotNull()
            & (F.datediff(F.col("lo"), F.col("prev_max")) > 1)
        )
        .select(
            "ck",
            (F.datediff(F.col("lo"), F.col("prev_max")) - 1).alias("gap"),
        )
    )
    return (
        gaps.groupBy(F.col("ck").alias("c_custkey"))
        .agg(F.max("gap").cast("long").alias("max_gap_days"))
        .orderBy(F.desc("max_gap_days"), F.asc("c_custkey"))
        .limit(25)
    )


LONGEST_GAP_SQL = """
    WITH close AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS ship
      FROM lineitem GROUP BY 1
    ),
    iv AS (
      SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS lo,
             GREATEST(COALESCE(ship, CAST(o_orderdate AS DATE)),
                      CAST(o_orderdate AS DATE)) AS hi
      FROM orders LEFT JOIN close ON o_orderkey = l_orderkey
    ),
    marked AS (
      SELECT ck, lo,
             MAX(hi) OVER (PARTITION BY ck ORDER BY lo, hi
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ),
    gaps AS (
      SELECT ck, date_diff('day', prev_max, lo) - 1 AS gap
      FROM marked
      WHERE prev_max IS NOT NULL AND date_diff('day', prev_max, lo) > 1
    )
    SELECT ck AS c_custkey, CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM gaps GROUP BY 1
    ORDER BY max_gap_days DESC, c_custkey ASC
    LIMIT 25
"""


# --- LPA partition modularity -------------------------------------------------


def q_graph_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA community partition on the
    supplier co-occurrence graph (the quality score for
    graph_lpa_communities' output — "how much denser than chance are
    the communities?"). With sym the both-directions edge relation
    (|sym| = 2m), i2_c the directed intra-community pair count
    (= 2·e_c) and d_c the community degree sum,
    Q = (Σ_c i2_c·|sym| − Σ_c d_c²) / |sym|² — numerator and
    denominator are exact integers; ONE shared terminal double
    expression renders Q in ppm. Output one row (q_ppm, n_communities,
    sym_edges).

    Scale shape: labels ride the existing LPA chassis (edges shuffled
    once, lineage cut per round); modularity adds two label equi-joins
    on the edge relation reduced per community, then a bounded
    aggregate — no window, no new fact-scale state. Citation:
    Newman-Girvan '04 (the standard definition); reference repo has no
    graph ops beyond PageRank (pageRank_v2.java:80-103)."""
    from page_rank_mapreduce_java_spark.graph.algorithms import (
        _symmetrize,
        label_propagation,
    )
    from page_rank_mapreduce_java_spark.graph.queries import (
        LPA_ROUNDS,
        cooccurrence_edges,
    )

    e = cooccurrence_edges(spark, sf_dir)
    lbl = label_propagation(e, rounds=LPA_ROUNDS).select(
        "id", F.col("community").alias("c")
    )
    sym = _symmetrize(e).localCheckpoint()
    m2 = sym.agg(F.count(F.lit(1)).alias("m2"))
    deg = (
        sym.join(lbl, sym.src == lbl.id)
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lbl_b = lbl.select(F.col("id").alias("id_b"), F.col("c").alias("c_b"))
    intra = (
        sym.join(lbl, sym.src == lbl.id)
        .join(lbl_b, sym.dst == F.col("id_b"))
        .filter(F.col("c") == F.col("c_b"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("i2"))
    )
    per = deg.join(intra, "c", "left").select(
        "c", "d", F.coalesce("i2", F.lit(0)).alias("i2")
    )
    agg = per.crossJoin(F.broadcast(m2)).agg(
        F.sum(F.col("i2") * F.col("m2") - F.col("d") * F.col("d")).alias(
            "num"
        ),
        F.count(F.lit(1)).alias("n_communities"),
        F.first("m2").alias("m2"),
    )
    return agg.select(
        F.expr(
            "CAST(ROUND(CAST(num AS DOUBLE) * 1e6"
            " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 0) AS BIGINT)"
        ).alias("q_ppm"),
        "n_communities",
        F.col("m2").cast("long").alias("sym_edges"),
    )


def _lpa_modularity_sql() -> str:
    from page_rank_mapreduce_java_spark.graph.queries import (
        COOC_EDGES_SQL,
        _lpa_oracle_sql,
    )

    return f"""
    WITH lpa AS MATERIALIZED ({_lpa_oracle_sql()}),
    e AS MATERIALIZED ({COOC_EDGES_SQL}),
    sym AS MATERIALIZED (
      SELECT src, dst FROM e UNION SELECT dst, src FROM e
    ),
    two_m AS (SELECT COUNT(*) AS m2 FROM sym),
    deg AS (
      SELECT l.community AS c, COUNT(*) AS d
      FROM sym s JOIN lpa l ON s.src = l.id GROUP BY 1
    ),
    intra AS (
      SELECT a.community AS c, COUNT(*) AS i2
      FROM sym s
        JOIN lpa a ON s.src = a.id
        JOIN lpa b ON s.dst = b.id
      WHERE a.community = b.community
      GROUP BY 1
    ),
    per AS (
      SELECT deg.c, deg.d, COALESCE(intra.i2, 0) AS i2
      FROM deg LEFT JOIN intra ON deg.c = intra.c
    ),
    agg AS (
      SELECT SUM(i2 * m2 - d * d) AS num, COUNT(*) AS n_communities,
             ANY_VALUE(m2) AS m2
      FROM per CROSS JOIN two_m
    )
    SELECT CAST(ROUND(CAST(num AS DOUBLE) * 1e6
                / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 0) AS BIGINT)
             AS q_ppm,
           n_communities,
           CAST(m2 AS BIGINT) AS sym_edges
    FROM agg
"""


# --- Poisson dispersion index -------------------------------------------------


def q_events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio (the Poisson dispersion / Fisher index)
    of the daily event-count series — the standard one-number test for
    burstiness: D ≈ 1 for a Poisson process, D ≫ 1 overdispersed.
    D = s²/x̄ = (n·Σc² − (Σc)²) / ((n−1)·Σc) from exact integer
    sufficient statistics over the bounded daily relation; ONE shared
    terminal double expression renders micro units. Output one row
    (n_days, total_events, dispersion_micro).

    Scale shape: fact scan → ≤#days relation (map-side-combined count),
    then a 1-row aggregate; no window, no join."""
    e = load_table(spark, "events", sf_dir)
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("total_events"),
        F.expr(
            "CAST(ROUND((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
            " / ((CAST(n AS DOUBLE) - 1.0) * CAST(s AS DOUBLE))"
            " * 1e6, 0) AS BIGINT)"
        ).alias("dispersion_micro"),
    )


POISSON_DISPERSION_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1
    ),
    agg AS (
      SELECT COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q FROM daily
    )
    SELECT CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS total_events,
           CAST(ROUND((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / ((CAST(n AS DOUBLE) - 1.0) * CAST(s AS DOUBLE))
                * 1e6, 0) AS BIGINT) AS dispersion_micro
    FROM agg
"""


QUERIES = {
    "embedding_pca_top_component": q_embedding_pca_top_component,
    "join_null_safe_nations": q_join_null_safe_nations,
    "join_null_safe_nations_salted": q_join_null_safe_nations_salted,
    "interval_longest_gap": q_interval_longest_gap,
    "graph_lpa_modularity": q_graph_lpa_modularity,
    "events_poisson_dispersion": q_events_poisson_dispersion,
}

ORACLES = {
    "embedding_pca_top_component": _pca_sql(),
    "join_null_safe_nations": NULL_SAFE_SQL,
    "join_null_safe_nations_salted": NULL_SAFE_SQL,
    "interval_longest_gap": LONGEST_GAP_SQL,
    "graph_lpa_modularity": _lpa_modularity_sql(),
    "events_poisson_dispersion": POISSON_DISPERSION_SQL,
}
