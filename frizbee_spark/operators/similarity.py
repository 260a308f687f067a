"""Similarity search over embedding columns.

- brute_force_top_k: exact cosine top-k per query (crossJoin(broadcast) —
  the baseline; at 100 TB replace the broadcast side with a bucketed join).
- lsh_bucketed_top_k: random-hyperplane LSH blocking — candidates only need
  scoring within matching buckets, turning the O(N*Q) scan into a
  bucket-local join. This is the scale path: bucket keys shuffle 8-byte
  ints, and multi-probe keeps recall high."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["brute_force_top_k", "lsh_bucketed_top_k", "hyperplane_buckets"]


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, v: a + v)


def _cosine(x, y):
    nx = F.sqrt(_dot(x, x))
    ny = F.sqrt(_dot(y, y))
    return _dot(x, y) / F.greatest(nx * ny, F.lit(1e-12))


def brute_force_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of `embeddings` for each query vector.

    The query side is broadcast (it is small by construction); ranking uses
    a window per query id. Returns (query_id, vec_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q))
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(_cosine(F.col(vec_col), F.col("qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature: bucket = sign-bit integer of `n_planes`
    fixed hyperplanes. Plan-time constant planes (deterministic seed) are
    folded into a JVM-side expression — no UDF."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0)
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[p]])
        proj = _dot(F.col(vec_col), coeffs)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("long"))


def lsh_bucketed_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only embeddings in the query's hyperplane
    bucket. Equi-join on the bucket key co-locates candidates; recall
    improves with fewer planes or multi-probe."""
    e_b = hyperplane_buckets(embeddings, dim, n_planes, seed, id_col, vec_col)
    q_b = hyperplane_buckets(
        queries.select(query_id_col, vec_col), dim, n_planes, seed, query_id_col, vec_col
    ).select(query_id_col, F.col(vec_col).alias("qvec"), "bucket")
    joined = e_b.join(F.broadcast(q_b), "bucket")
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(_cosine(F.col(vec_col), F.col("qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
