"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline.  Dot products run
  JVM-side via higher-order functions (zip_with + aggregate) — no Python in
  the hot path.
- LSH-bucketed variant: sign-of-projection onto deterministic integer
  hyperplanes buckets vectors so candidate generation is a bucket-local
  join, not an all-pairs cross join — the 100 TB scale path (candidates
  per query ≈ N / 2^planes instead of N).

Similarities are floored to basis points (×10000) before ranking so the
ordering is reproducible across engines (ties broken by neighbor id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_bp(a, b):
    """Cosine similarity in floored basis points (integer, oracle-stable)."""
    return F.floor(dot(a, b) * 10000 / F.greatest(norm(a) * norm(b), F.lit(1e-12)))


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the full
    corpus; rank window per query.  At cluster scale the query side is the
    broadcast side; the corpus never shuffles."""
    q = embeddings.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin(query_ids))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_bp(F.col("qv"), F.col("cv")).alias("cosine_bp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_bp"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_bp", "rank")
    )


def hyperplane_weight(plane: int, dim: int):
    """Deterministic integer pseudo-hyperplane weight in {-3..3}\\{0}:
    w = ((dim*31 + plane*17) mod 7) - 3, with 0 mapped to 1."""
    v = (dim * 31 + plane * 17) % 7 - 3
    return v if v != 0 else 1


def lsh_bucket_expr(vec_col, num_planes: int, dims: int):
    """Bucket id = bits of sign(v · w_plane) over deterministic planes."""
    bucket = F.lit(0)
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(hyperplane_weight(p, d))) for d in range(dims)]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    num_planes: int = 3,
    dims: int = 64,
    query_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The join key is the bucket id, so the shuffle is equi-join-sized; at
    10^12 rows this is the difference between feasible and not.
    """
    with_bucket = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_expr(F.col(vec_col), num_planes, dims).alias("bucket"),
    )
    q = with_bucket.select(
        F.col("vid").alias("query_id"), F.col("vec").alias("qv"), F.col("bucket")
    )
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin(query_ids))
    c = with_bucket.select(
        F.col("vid").alias("neighbor_id"), F.col("vec").alias("cv"), F.col("bucket")
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_bp(F.col("qv"), F.col("cv")).alias("cosine_bp"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_bp"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_bp", "rank")
    )


# --- DuckDB oracle twin -------------------------------------------------------

BRUTE_FORCE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {nq}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    CAST(floor(
      list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) * 10000
      / greatest(
          sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
          1e-12)
    ) AS BIGINT) AS cosine_bp
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_bp,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine_bp DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine_bp, rnk FROM ranked WHERE rnk <= {k}
"""
