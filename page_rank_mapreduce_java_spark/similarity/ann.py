"""Approximate-nearest-neighbor library over array<float> embeddings.

Two paths (SURVEY.md §7 M5):
- brute_force_topk: exact cosine top-k. Plan shape: broadcast the (small)
  query set against the (huge) corpus — a broadcast nested-loop producing
  |Q|·|C| rows that immediately collapse through a per-query top-k window.
  Scales in the corpus dimension (embarrassingly parallel per partition).
- lsh_buckets: random-hyperplane signed projections → integer bucket.
  Candidate generation becomes an equi-join on bucket; recall is tuned by
  n_planes (fewer planes → bigger buckets) and by probing neighboring
  buckets. Hyperplane weights come from a deterministic LCG so the same
  buckets are computable in any engine (and in the DuckDB oracle).

The true 100 TB path would add an IVF variant (k-means coarse quantizer,
probe nearest centroids); that needs a training step and is out of scope
for the oracle surface — the LSH variant is the same join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from page_rank_mapreduce_java_spark.functions.vectors import cosine

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_648  # 2^31


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for every row of ``queries``."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"),
                F.col("rn").cast("long").alias("rn"))
    )


def plane_weight_expr(j: int, dim_var: str = "d", dim: int = 64) -> str:
    """SQL fragment for hyperplane j's weight at dimension ``d`` — a
    deterministic LCG mapped to [-0.5, 0.5); identical text works in Spark
    SQL and DuckDB. The LCG seed stride is ``dim`` so consecutive planes
    never share weight subsequences."""
    return (
        f"(((CAST({LCG_A} AS BIGINT) * ({dim} * {j} + {dim_var}) + {LCG_C}) % {LCG_M}) "
        f"/ CAST({LCG_M} AS DOUBLE) - 0.5)"
    )


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector a sign-random-projection bucket in [0, 2^n_planes)."""
    bucket = None
    for j in range(n_planes):
        dot_j = F.expr(
            f"aggregate(transform(sequence(0, {dim - 1}), "
            f"d -> CAST(element_at({vec_col}, d + 1) AS DOUBLE) * {plane_weight_expr(j, dim=dim)}), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        bit = (dot_j > 0).cast("long") * F.lit(2**j)
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), bucket.alias("bucket"))


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, centroid-id
    tiebreak). Centroids broadcast; assignment is one narrow pass over the
    corpus — the IVF build step. At 100 TB the centroid set comes from a
    k-means sample; here it is any small DataFrame[centroid_id, cvec]."""
    scored = corpus.select(id_col, vec_col).join(
        F.broadcast(centroids), F.lit(True)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc(cosine(F.col(vec_col), F.col("cvec"))), F.asc("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest centroid cells
    per query and search only their members. The candidate join is an
    equi-join on centroid_id — the same never-cross-join shape as LSH,
    with recall tuned by n_probe/n_centroids.

    Centroids are (deterministically) the first ``n_centroids`` corpus
    vectors by id — swap for k-means output in production; the plan shape
    is identical.
    """
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"))
    )
    assignment = ivf_assign(corpus, centroids, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qvec"), F.col("cvec"))), F.asc("centroid_id")
    )
    probes = (
        q.join(F.broadcast(centroids), F.lit(True))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "centroid_id")
    )

    members = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec2")
    ).join(assignment.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    cands = probes.join(members, "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc(cosine(F.col("qvec"), F.col("cvec2"))), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec2")), 6).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def lsh_buckets_sql(n_planes: int = 8, dim: int = 64, vec_col: str = "embedding") -> str:
    """DuckDB expression computing the identical bucket value."""
    bits = []
    for j in range(n_planes):
        dot_j = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(0, {dim}), "
            f"d -> CAST({vec_col}[d + 1] AS DOUBLE) * {plane_weight_expr(j, dim=dim)})), "
            f"(acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {dot_j} > 0 THEN {2**j} ELSE 0 END)")
    return " + ".join(bits)
