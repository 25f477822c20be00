"""Sampled stress centrality — the integer-exact member of the
betweenness family (Shimbel 1953; the Brandes 2001 two-phase
accumulation, counting paths instead of summing fractional pair
dependencies).

stress(v) = Σ_{s,t} σ_st(v): the number of shortest s→t paths passing
through v as an INTERIOR vertex. Betweenness divides each term by
σ_st — a ratio whose floating accumulation is summation-order-dependent
and therefore violates this repo's partition-invariance bar (see
tests/test_determinism.py); stress keeps the identical two-phase
structure with pure BIGINT arithmetic, so results are bit-exact on any
partitioning and exactly oracle-mirrorable.

Algorithm (per sampled source s, all sources batched in one DataFrame
keyed by ``s`` — S sources cost one superstep sequence, not S):

- forward, level-synchronous BFS: level l+1 = neighbors of level l not
  yet visited for that source; σ(s,v) = Σ σ over level-l predecessors
  (level-synchronous BFS puts EVERY shortest-path predecessor of a
  level-(l+1) node exactly at level l, so one grouped sum per level is
  the complete path count);
- backward: g(s,v) = Σ_{w ∈ DAG-succ(v)} (1 + g(s,w)) = number of
  shortest-path continuations from v (the "+1" counts the path ending
  at w itself, g(w) the ones continuing past it), accumulated from the
  deepest level upward;
- stress(v) = Σ_s σ(s,v)·g(s,v) over levels ≥ 1 (a level-0 row is v=s,
  where v is an endpoint, not interior).

Scale shape: identical to the BFS chassis (graph/algorithms.py) — per
level one frontier⋈edges join keyed on the node id plus one (s, id)
grouped sum; state is frontier-sized × |sources|, never edge-sized;
``max_depth`` bounds the rounds (the oracle unrolls the same depth, so
truncation is part of the certified semantics, as with BFS_HOPS /
SSSP_ROUNDS). Sampling sources is the standard scale lever for
betweenness-family centralities (Brandes–Pich 2007): cost is linear in
|sources| with an unbiased rank estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from page_rank_mapreduce_java_spark.plans.checkpoints import cut_lineage


# Partition-sizing memo, keyed (applicationId, graph key) exactly like
# plans/pairsize._BOUND_CACHE: a plan-sizing scalar, dead across runs.
_EDGE_PARTS_CACHE: dict[tuple[str, str], int] = {}


def _key_partitioned_edges(
    sym: DataFrame, cache_key: str | None = None
) -> DataFrame:
    """Shuffle the symmetric edge relation ONCE onto the superstep join
    key and persist it (r12; the pagerank/connected-components recipe —
    graph/algorithms.py). The chassis used to persist ``sym`` with
    whatever partitioning the upstream distinct left (hash on
    (src, dst)), so EVERY forward and backward superstep re-exchanged
    the edge relation (guide §2.4: the per-iteration shuffle the
    persisted-links design exists to remove). Partition count is
    data-sized (~75k edge rows per partition, capped at the session's
    shuffle parallelism) so small graphs don't pay near-empty tasks
    per superstep.

    r13 (VERDICT r12 what's-wrong #4): the sizing count is memoized per
    (applicationId, ``cache_key``), so the steady state — every timed
    bench rep, every repeat invocation over the same graph — builds the
    keyed relation in exactly ONE materialization pass instead of
    persisting ``raw`` first and scanning it again; the first
    invocation per (app, graph) still pays the exact count, wrapped in
    try/finally so a mid-helper failure cannot leak cached edge blocks
    (ADVICE r12)."""
    spark = sym.sparkSession
    raw = sym.select("src", "dst")
    memo_key = (
        (spark.sparkContext.applicationId, cache_key) if cache_key else None
    )
    parts = _EDGE_PARTS_CACHE.get(memo_key) if memo_key else None
    if parts is not None:
        return raw.repartition(parts, "src").persist()
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    raw = raw.persist()
    try:
        parts = max(1, min(cap, -(-raw.count() // 75_000)))
        if memo_key:
            _EDGE_PARTS_CACHE[memo_key] = parts
        keyed = raw.repartition(parts, "src").persist()
        keyed.count()
    finally:
        raw.unpersist()
    return keyed


def stress_centrality_sampled(
    sym: DataFrame,
    sources: DataFrame,
    max_depth: int = 4,
    cache_key: str | None = None,
) -> DataFrame:
    """Exact depth-bounded stress centrality over the sampled sources.

    ``sym``: symmetrized simple edge relation DataFrame[src, dst]
    (distinct pairs — parallel edges would double-count paths).
    ``sources``: DataFrame[src]. Returns DataFrame[id, stress] covering
    every node of ``sym`` (0 where never interior).
    """
    sym = _key_partitioned_edges(sym, cache_key=cache_key)

    lvl0 = cut_lineage(
        sources.select(
            F.col("src").alias("s"),
            F.col("src").alias("id"),
            F.lit(1).cast("long").alias("sigma"),
        )
    )
    levels = [lvl0]
    # r12: ``visited`` is only ever a union of ALREADY-checkpointed level
    # relations, so its per-level cut_lineage was one pure-overhead eager
    # job per level (the union lineage is depth-bounded by max_depth and
    # recomputation-free — each leg scans a checkpoint). Dropping it
    # removes max_depth+1 jobs per invocation; results are unchanged.
    visited = lvl0.select("s", "id")
    for _ in range(max_depth):
        prev = levels[-1]
        cand = (
            prev.join(sym, prev.id == sym.src)
            .select("s", F.col("dst").alias("id"), "sigma")
            .groupBy("s", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = cut_lineage(cand.join(visited, ["s", "id"], "left_anti"))
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("s", "id"))

    # backward accumulation of continuation counts g
    deepest = levels[max_depth]
    parts = [
        deepest.select("s", "id", "sigma", F.lit(0).cast("long").alias("g"))
    ]
    g_above = parts[0].select("s", "id", "g")
    for l in range(max_depth - 1, -1, -1):
        cur = levels[l]
        succ = (
            cur.select("s", F.col("id").alias("v"))
            .join(sym, F.col("v") == sym.src)
            .select("s", "v", F.col("dst").alias("w"))
            .join(
                g_above.select(
                    "s", F.col("id").alias("w"), F.col("g").alias("gw")
                ),
                ["s", "w"],
            )
            .groupBy("s", F.col("v").alias("id"))
            .agg(F.sum(F.col("gw") + 1).alias("g"))
        )
        cur_g = cut_lineage(
            cur.join(succ, ["s", "id"], "left").select(
                "s",
                "id",
                "sigma",
                F.coalesce("g", F.lit(0)).cast("long").alias("g"),
            )
        )
        parts.append(cur_g)
        g_above = cur_g.select("s", "id", "g")

    # parts[-1] is level 0 (v = s: endpoint, not interior) — excluded.
    interior = parts[0]
    for p in parts[1:-1]:
        interior = interior.unionByName(p)
    stress = interior.groupBy("id").agg(
        F.sum(F.col("sigma") * F.col("g")).alias("stress")
    )
    nodes = sym.select(F.col("src").alias("id")).distinct()
    # Materialize before unpersisting sym: every invocation in a shared
    # session (tests, bench) would otherwise leak the cached edge blocks.
    out = cut_lineage(
        nodes.join(stress, "id", "left").select(
            "id", F.coalesce("stress", F.lit(0)).cast("long").alias("stress")
        )
    )
    sym.unpersist()
    return out


def betweenness_sampled(
    sym: DataFrame,
    sources: DataFrame,
    max_depth: int = 4,
    scale: int = 10_000,
    cache_key: str | None = None,
) -> DataFrame:
    """Depth-bounded, source-sampled betweenness centrality (Brandes
    2001 two-phase accumulation; Brandes–Pich 2007 source sampling) —
    the FRACTIONAL member of the family next to stress_centrality_
    sampled's integer path counts.

    Brandes' dependency δ(v) = Σ_{w ∈ DAG-succ(v)} σ(v)/σ(w)·(1+δ(w))
    sums true rationals, and floating accumulation of those ratios is
    summation-order-dependent — the reason this repo shipped stress
    first. The determinism fix is the money convention transplanted to
    rank space: δ is carried as a BIGINT in 1/scale units and every
    edge contribution rounds ONCE through integer division,

        δ_fp(v) = Σ_w (σ(v) · (scale + δ_fp(w))) div σ(w),

    which both engines evaluate bit-identically in any summation order
    (integer sums commute; the div happens at a fixed place in the
    level recursion, not "at the end"). σ(v) ≤ σ(w) along DAG edges
    (σ(w) sums over ALL its predecessors), so each term is ≤
    scale + δ_fp(w) and the per-term floor error is < 1 unit; the
    result is betweenness in 1/scale units with a deterministic,
    documented rounding — a SKETCH-grade rank statistic, not the exact
    rational (which no fixed-width engine returns anyway).

    Overflow: the product σ(v)·(scale + δ_fp(w)) is the widest value.
    Both engines run it in BIGINT with loud overflow (Spark under the
    pinned ANSI mode, DuckDB natively), so a graph that exceeds int64
    headroom FAILS rather than silently wrapping; tests pin the
    measured headroom at the certified SFs.

    ``sym``: symmetrized simple edge relation DataFrame[src, dst];
    ``sources``: DataFrame[src]. Returns DataFrame[id, betweenness_fp]
    over every node of ``sym`` (0 where never interior), fp = 1/scale
    units, endpoints excluded exactly as in stress.

    Scale shape: identical to stress_centrality_sampled — per level one
    frontier⋈edges join + one (s, id) grouped sum each way; state is
    frontier-sized × |sources|, never edge-sized.
    """
    sym = _key_partitioned_edges(sym, cache_key=cache_key)

    lvl0 = cut_lineage(
        sources.select(
            F.col("src").alias("s"),
            F.col("src").alias("id"),
            F.lit(1).cast("long").alias("sigma"),
        )
    )
    levels = [lvl0]
    # r12: ``visited`` is only ever a union of ALREADY-checkpointed level
    # relations, so its per-level cut_lineage was one pure-overhead eager
    # job per level (the union lineage is depth-bounded by max_depth and
    # recomputation-free — each leg scans a checkpoint). Dropping it
    # removes max_depth+1 jobs per invocation; results are unchanged.
    visited = lvl0.select("s", "id")
    for _ in range(max_depth):
        prev = levels[-1]
        cand = (
            prev.join(sym, prev.id == sym.src)
            .select("s", F.col("dst").alias("id"), "sigma")
            .groupBy("s", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = cut_lineage(cand.join(visited, ["s", "id"], "left_anti"))
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("s", "id"))

    # backward accumulation of fixed-point dependencies δ_fp
    deepest = levels[max_depth]
    parts = [
        deepest.select(
            "s", "id", "sigma", F.lit(0).cast("long").alias("delta")
        )
    ]
    above = parts[0]
    for l in range(max_depth - 1, -1, -1):
        cur = levels[l]
        succ = (
            cur.select(
                "s",
                F.col("id").alias("v"),
                F.col("sigma").alias("sv"),
            )
            .join(sym, F.col("v") == sym.src)
            .select("s", "v", "sv", F.col("dst").alias("w"))
            .join(
                above.select(
                    "s",
                    F.col("id").alias("w"),
                    F.col("sigma").alias("sw"),
                    F.col("delta").alias("dw"),
                ),
                ["s", "w"],
            )
            .groupBy("s", F.col("v").alias("id"))
            .agg(
                F.sum(
                    F.expr(f"(sv * ({scale} + dw)) div sw")
                ).alias("delta")
            )
        )
        cur_d = cut_lineage(
            cur.join(succ, ["s", "id"], "left").select(
                "s",
                "id",
                "sigma",
                F.coalesce("delta", F.lit(0)).cast("long").alias("delta"),
            )
        )
        parts.append(cur_d)
        above = cur_d

    # parts[-1] is level 0 (v = s: endpoint, not interior) — excluded.
    interior = parts[0]
    for p in parts[1:-1]:
        interior = interior.unionByName(p)
    bc = interior.groupBy("id").agg(F.sum("delta").alias("betweenness_fp"))
    nodes = sym.select(F.col("src").alias("id")).distinct()
    out = cut_lineage(
        nodes.join(bc, "id", "left").select(
            "id",
            F.coalesce("betweenness_fp", F.lit(0))
            .cast("long")
            .alias("betweenness_fp"),
        )
    )
    sym.unpersist()
    return out


def labeled_bfs_levels(
    sym: DataFrame,
    sources: DataFrame,
    max_depth: int = 4,
    cache_key: str | None = None,
) -> DataFrame:
    """Per-source BFS level labels: DataFrame[s, id, level] with level =
    d(s, id) ∈ [0, max_depth], one row per (source, first-visited node)
    — the shared forward pass of the distance-centrality family
    (harmonic/closeness, eccentricity, mean path length), identical to
    stress_centrality_sampled's forward phase minus the path counts.

    ``sym``: symmetrized simple edge relation DataFrame[src, dst];
    ``sources``: DataFrame[src]. Scale shape: one frontier⋈edges join
    per level keyed on the node id + a (s, id) anti-join against the
    visited set; state is visited-sized × |sources|, never edge-sized.
    The edge cache is released before returning (result materialized
    via localCheckpoint first).
    """
    sym = _key_partitioned_edges(sym, cache_key=cache_key)
    try:
        lvl = cut_lineage(
            sources.select(
                F.col("src").alias("s"),
                F.col("src").alias("id"),
                F.lit(0).cast("long").alias("level"),
            )
        )
        out = lvl
        # r12: same visited-checkpoint removal as the stress/betweenness
        # loops above — the union of checkpointed levels needs no cut.
        visited = lvl.select("s", "id")
        for depth in range(1, max_depth + 1):
            cand = (
                lvl.join(sym, lvl.id == sym.src)
                .select("s", F.col("dst").alias("id"))
                .distinct()
            )
            nxt = cut_lineage(
                cand.join(visited, ["s", "id"], "left_anti").withColumn(
                    "level", F.lit(depth).cast("long")
                )
            )
            out = out.unionByName(nxt)
            visited = visited.unionByName(nxt.select("s", "id"))
            lvl = nxt
        return cut_lineage(out)
    finally:
        sym.unpersist()
