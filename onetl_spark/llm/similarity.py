"""Similarity search over embedding columns (``array<float>``).

- ``cosine``: double-precision fold (zip_with + aggregate), JVM-side.
- ``bruteforce_topk``: exact top-k for a query vector — the broadcast side
  is one row, the scan is embarrassingly parallel, and the final top-k is
  Catalyst's TakeOrderedAndProject (per-partition heap + driver merge),
  so it holds at any scale.
- ``topk_per_query``: N query vectors joined broadcast against the corpus,
  per-query top-k via window row_number (single shuffle on query id).
- ``lsh_bucket_topk``: sign-random-projection LSH — deterministic
  hyperplanes derived from md5 hashes, bucket join, search only within the
  query's bucket. The scale path when the corpus no longer fits a
  per-partition scan per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")),
    )


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def bruteforce_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbours of corpus vector ``query_id``."""
    query = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"),
    )
    return (
        embeddings.filter(F.col(id_col) != query_id)
        .join(F.broadcast(query))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 9).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def topk_per_query(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k corpus neighbours for every query vector (broadcast join +
    windowed rank). queries must have columns (query_id, qvec)."""
    scored = (
        embeddings.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col(vec_col), F.col("qvec")), 9).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def near_dup_pairs_by_label(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking groups
    (block_col keeps the pair join off the full cross product).

    Norms are precomputed per ROW before the pair join (computing them
    inside the pair expression re-evaluates each norm once per pair —
    O(pairs·d) extra work). ``dot/(na·nb)`` is arithmetically identical.
    """
    left = embeddings.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        norm(F.col(vec_col)).alias("a_norm"),
        F.col(block_col).alias("_blk"),
    )
    right = embeddings.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        norm(F.col(vec_col)).alias("b_norm"),
        F.col(block_col).alias("_blk"),
    )
    return (
        left.join(right, "_blk")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm")), 9,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived, no RNG state — any engine can reproduce it."""
    import hashlib

    h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def sign_lsh_bucket(vec_col, dim: int, n_planes: int = 8):
    """Sign-random-projection bucket id (0..2^n_planes-1). Plane values are
    Python-precomputed constants, so the projection is a pure per-row
    multiply-add chain (codegen-friendly, no per-row hashing)."""
    bits = []
    for p in range(n_planes):
        proj = None
        for d in range(dim):
            term = F.element_at(vec_col, d + 1).cast("double") * F.lit(lsh_plane_component(p, d))
            proj = term if proj is None else proj + term
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket."""
    bucketed = embeddings.withColumn("_bucket", sign_lsh_bucket(F.col(vec_col), dim, n_planes))
    query = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"), F.col("_bucket").alias("_qbucket"),
    )
    return (
        bucketed.join(F.broadcast(query), F.col("_bucket") == F.col("_qbucket"))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 9).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    embeddings: DataFrame,
    centroid_filter: str = "vec_id % 64 = 7",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization with deterministic centroids (a fixed id
    predicate stands in for k-means init — reproducible on any engine).

    Returns (id, centroid_id): every vector assigned to its highest-cosine
    centroid. The centroid set is tiny → broadcast; assignment is one
    scan + windowed argmin, no shuffle of the corpus."""
    from pyspark.sql.window import Window as W

    centroids = embeddings.filter(centroid_filter).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("vnorm"),
    ).join(F.broadcast(centroids))
    w = W.partitionBy(id_col).orderBy(
        F.desc("ccos"), F.asc("centroid_id"),
    )
    return (
        scored.withColumn(
            "ccos",
            F.round(dot(F.col(vec_col), F.col("cvec")) / (F.col("vnorm") * F.col("cnorm")), 9),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(id_col, "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    centroid_filter: str = "vec_id % 64 = 7",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search (nprobe=1): candidates restricted to the query's cluster."""
    assigned = ivf_assign(embeddings, centroid_filter, id_col, vec_col)
    clustered = embeddings.join(assigned, id_col)
    query = clustered.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"), F.col("centroid_id").alias("_qc"),
    )
    return (
        clustered.join(F.broadcast(query), F.col("centroid_id") == F.col("_qc"))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 9).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
