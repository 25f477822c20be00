"""Product quantization (PQ) — the compressed-domain ANN scale path.

IVF (similarity/ann.py) prunes WHICH vectors to score; PQ compresses HOW
each vector is scored (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public literature). The d-dim embedding
is split into M subspaces; each subspace gets its own k-centroid
codebook (trained with the deterministic Lloyd chassis from
similarity/ann.kmeans_train, applied per sub-vector); a vector is then
M small integer codes (M·log2(k) bits ≈ 4 bytes here vs 256 bytes of
floats — the ~64× compression that lets a 100 TB embedding corpus fit
hot storage).

Query-time ADC (asymmetric distance computation) never touches raw
corpus vectors: the query precomputes a |Q|·M·k lookup table of partial
squared-L2 distances to every sub-centroid (tiny, broadcast), the codes
relation joins it on (subspace, code), and the per-(query, vector)
distance is the SUM of M partials — an equi-join plus a keyed aggregate,
Spark's native shapes. No UDFs anywhere; the sub-vector slice, the
assignment argmin, and the distance fold are all JVM higher-order
functions (functions/vectors.py contract), so a DuckDB oracle rendering
is possible exactly like kmeans_sql (deferred with the audit window
full this round — the recall/consistency contract is tested in
tests/test_pq.py instead).

Plan shapes at 100 TB:
- train: M independent kmeans_train runs over sliced columns — each is
  Lloyd's broadcast-assign + (k·d/M)-sized partial-sum shuffle;
- encode: ONE narrow pass over the corpus (codebook broadcast, argmin
  over M·k candidates per row via a per-vector window keyed on the
  high-cardinality vector id);
- search: codes ⋈ broadcast LUT on (m, code) then groupBy (query_id,
  vec_id) — both keys high-cardinality, map-side partials apply; final
  per-query top-k is a window over query_id (high-cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.functions.vectors import sq_l2
from page_rank_mapreduce_java_spark.similarity.ann import kmeans_train

PQ_M = 4  # subspaces
PQ_K = 16  # centroids per subspace (codes fit one nibble)


def subvector(vec: Column | str, m: int, n_sub: int, dim: int) -> Column:
    """The m-th of n_sub equal slices of a dim-length array column
    (1-based slice; dim must divide evenly — asserted by callers)."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    width = dim // n_sub
    return F.slice(vec, m * width + 1, width)


def pq_train(
    corpus: DataFrame,
    dim: int,
    n_sub: int = PQ_M,
    k: int = PQ_K,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks. Returns DataFrame[m INT,
    centroid_id LONG, cvec ARRAY<DOUBLE>] — M·k rows, broadcast-sized
    for any practical (M, k).

    Each subspace trains independently on its slice of the corpus via
    the deterministic Lloyd chassis (first-k init, micro-unit snapped
    means) — determinism carries over unchanged because slicing is a
    pure projection."""
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    parts = []
    for m in range(n_sub):
        sub = corpus.select(
            F.col(id_col).alias("vec_id"),
            subvector(vec_col, m, n_sub, dim).alias("embedding"),
        )
        parts.append(
            # parallel_corpus=False: the PQ chassis replays its five
            # trains per materialization, so the per-train corpus
            # repartition LOSES here (measured quiet A/B — see the
            # kmeans_train note).
            kmeans_train(
                sub, k=k, iters=iters, parallel_corpus=False
            ).withColumn("m", F.lit(m))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("m", "centroid_id", "cvec")


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    dim: int,
    n_sub: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as M codes: DataFrame[vec_id, m, code].

    One narrow pass: explode the M slices per vector (bounded ×M),
    broadcast-join the codebook on the subspace, argmin squared-L2 with
    centroid-id tiebreak via a per-(vec_id, m) window — the partition
    key is high-cardinality, so parallelism tracks the corpus."""
    slices = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        subvector(vec_col, m, n_sub, dim).alias("sv"),
                    )
                    for m in range(n_sub)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    w = Window.partitionBy("vec_id", "m").orderBy(
        F.asc(sq_l2(F.col("sv"), F.col("cvec"))), F.asc("centroid_id")
    )
    return (
        slices.join(F.broadcast(codebook), "m")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("centroid_id").alias("code"))
    )


def pq_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    dim: int,
    n_sub: int = PQ_M,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: DataFrame[query_id, neighbor_id, adc_sq] — for every
    query, the k corpus vectors with the smallest code-approximated
    squared L2 (ties → neighbor id). The corpus side is ONLY the codes
    relation — raw vectors are never read at query time."""
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        subvector(vec_col, m, n_sub, dim).alias("qv"),
                    )
                    for m in range(n_sub)
                ]
            )
        ).alias("s"),
    ).select("query_id", F.col("s.m").alias("m"), F.col("s.qv").alias("qv"))
    lut = qs.join(F.broadcast(codebook), "m").select(
        "query_id",
        "m",
        F.col("centroid_id").alias("code"),
        sq_l2(F.col("qv"), F.col("cvec")).alias("dsq"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dsq").alias("adc_sq"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_sq"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_sq")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_sub: int = PQ_M,
    k: int = 10,
    n_probe: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the standard large-scale ANN pairing: the IVF coarse
    quantizer prunes WHICH cells to search (candidates shrink
    ~n_probe/n_centroids), then ADC scores the survivors from their
    4-byte codes instead of raw vectors. At 100 TB the search-side I/O
    is (codes of probed cells) + one broadcast LUT — neither scales
    with raw vector bytes.

    Composition of existing pieces only: ann.kmeans_train/ivf_assign
    for cells, pq_train/pq_encode for codes, and the pq_topk ADC scored
    over the cell-pruned codes relation. Returns DataFrame[query_id,
    neighbor_id, adc_sq].
    """
    from page_rank_mapreduce_java_spark.functions.vectors import cosine
    from page_rank_mapreduce_java_spark.similarity.ann import (
        ivf_assign,
        kmeans_train,
    )

    centroids = kmeans_train(
        corpus,
        k=n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        parallel_corpus=False,  # five replayed trains: see kmeans_train note
    )
    cells = ivf_assign(
        corpus, centroids, id_col, vec_col, parallel_corpus=False
    )

    codebook = pq_train(corpus, dim=dim, n_sub=n_sub, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(corpus, codebook, dim=dim, n_sub=n_sub, id_col=id_col, vec_col=vec_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qvec"), F.col("cvec"))), F.asc("centroid_id")
    )
    probes = (
        q.join(F.broadcast(centroids), F.lit(True))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    # Per-query candidate vec_ids = members of probed cells; restrict the
    # codes relation to them via the (query_id, vec_id) pair set, then
    # ADC exactly as pq_topk but with the pair join replacing the full
    # codes × queries product.
    cand = probes.join(
        cells.withColumnRenamed(id_col, "vec_id"), "centroid_id"
    ).select("query_id", "vec_id")

    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        subvector(vec_col, m, n_sub, dim).alias("qv"),
                    )
                    for m in range(n_sub)
                ]
            )
        ).alias("s"),
    ).select("query_id", F.col("s.m").alias("m"), F.col("s.qv").alias("qv"))
    lut = qs.join(F.broadcast(codebook), "m").select(
        "query_id",
        "m",
        F.col("centroid_id").alias("code"),
        sq_l2(F.col("qv"), F.col("cvec")).alias("dsq"),
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dsq").alias("adc_sq"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_sq"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_sq")
    )
