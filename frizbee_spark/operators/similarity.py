"""Similarity search over embedding columns.

- brute_force_top_k: exact cosine top-k per query (crossJoin(broadcast) —
  the baseline; at 100 TB replace the broadcast side with a bucketed join).
- lsh_bucketed_top_k: random-hyperplane LSH blocking — candidates only need
  scoring within matching buckets, turning the O(N*Q) scan into a
  bucket-local join. This is the scale path: bucket keys shuffle 8-byte
  ints, and multi-probe keeps recall high.
- ivf_top_k: inverted-file ANN — a k-means coarse quantizer (trained once
  on a bounded driver-side sample, the standard IVF recipe) partitions
  vectors into lists; queries probe only their `nprobe` nearest lists.
  Assignment and probing are pure JVM expressions over plan-time constant
  centroids — no UDF, no per-row Python."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..runtime import ensure_min_partitions

__all__ = [
    "brute_force_top_k",
    "lsh_bucketed_top_k",
    "hyperplane_buckets",
    "train_ivf_centroids",
    "ivf_assign",
    "ivf_top_k",
]


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
    # the cosine projection under the broadcast join inherits the big
    # side's scan partitioning — spread an unsplittable small file across
    # the cores (no-op for at-scale inputs)
    joined = ensure_min_partitions(embeddings).crossJoin(F.broadcast(q))
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
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only embeddings in the query's hyperplane
    bucket(s). Equi-join on the bucket key co-locates candidates.

    Multi-probe (`n_probes` > 1): each query also probes the buckets that
    differ in the sign bit of its LOWEST-|projection| planes — the planes
    the query sits closest to, i.e. the flips most likely to hide true
    neighbors (Lv et al., "Multi-Probe LSH", VLDB'07 — public algorithm).
    Probe selection is an array_sort over plan-time-constant projection
    structs + a bucket XOR — still zero UDF, and the probe side stays
    (queries x n_probes) rows, broadcast. This buys recall without
    re-hashing or extra shuffles of the big side."""
    # full-width bucket hashing for small unsplittable scans (no-op at
    # scale, where the scan itself is wide)
    e_b = hyperplane_buckets(
        ensure_min_partitions(embeddings), dim, n_planes, seed, id_col, vec_col
    )

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    q0 = queries.select(query_id_col, F.col(vec_col).alias("qvec"))
    bucket = F.lit(0)
    prox = []
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[p]])
        proj = _dot(F.col("qvec"), coeffs)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        prox.append(F.struct(F.abs(proj).alias("absproj"), F.lit(p).alias("p")))
    n_probes = max(1, min(int(n_probes), n_planes + 1))
    # probe list: own bucket first, then flips of the closest planes
    flips = F.transform(
        F.slice(F.array_sort(F.array(*prox)), 1, n_probes - 1),
        lambda s: F.pow(F.lit(2.0), s["p"]).cast("long"),
    )
    probe_buckets = F.concat(
        F.array(bucket.cast("long")),
        F.transform(flips, lambda m: m.bitwiseXOR(bucket.cast("long"))),
    )
    q_b = q0.withColumn("bucket", F.explode(probe_buckets))

    joined = e_b.join(F.broadcast(q_b), "bucket")
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(_cosine(F.col(vec_col), F.col("qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, 1e-12)


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 10,
    seed: int = 7,
    max_train: int = 100_000,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded driver-side sample —
    the standard IVF training recipe (train on ~10^5-10^6 sampled vectors
    regardless of corpus size; training cost must not grow with N).

    The bounded `limit(max_train)` collect is the ONLY driver-side
    materialization in the IVF path and is O(max_train), not O(N).
    Returns unit-norm centroids (n_centroids, dim), reproducible for a
    given (seed, input order)."""
    sample = embeddings.select(vec_col).limit(max_train).collect()
    x = _unit(np.asarray([r[0] for r in sample], dtype=np.float64))
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(n_iters):
        # spherical Lloyd step: assign by max cosine, re-mean, re-normalize
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
        cents = _unit(cents)
    return cents


def _centroid_cosines(vec_col_expr, centroids: np.ndarray):
    """array<struct<cos:double, idx:int>> of the vector's cosine against
    every plan-time-constant centroid — one JVM expression, no UDF."""
    norm = F.sqrt(_dot(vec_col_expr, vec_col_expr))
    entries = []
    for idx, c in enumerate(centroids):
        coeffs = F.array(*[F.lit(float(v)) for v in c])
        cos = _dot(vec_col_expr, coeffs) / F.greatest(norm, F.lit(1e-12))
        entries.append(F.struct(cos.alias("cos"), F.lit(idx).alias("idx")))
    return F.array(*entries)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each row to its nearest (max-cosine) centroid: `list_id` int.

    Struct ordering makes array_max pick the highest-cosine centroid
    (ties break to the higher index, deterministically) — the whole
    assignment is one whole-stage-codegen projection."""
    arr = _centroid_cosines(F.col(vec_col), centroids)
    return df.withColumn("list_id", F.array_max(arr)["idx"])


def ivf_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: each query scores only the vectors whose
    list is among its `nprobe` highest-cosine centroids.

    With nprobe == n_centroids every list is probed and the result is
    EXACTLY brute force (each vector lives in one list, so each
    (query, vector) pair is scored at most once) — that identity is the
    driver-oracle check; recall-at-lower-nprobe is pytest-covered.

    Scale shape: assignments shuffle on an int `list_id`; the probe side
    is (queries x nprobe) rows and is broadcast; per-list fan-out is
    bounded by list population, so a hot list behaves like any skewed
    join key (AQE skew split applies)."""
    cents = centroids if centroids is not None else train_ivf_centroids(
        embeddings, dim, n_centroids, seed=seed, vec_col=vec_col
    )
    # NOTE: the training sample above reads the ORIGINAL frame (its row
    # order feeds centroid init); only the assignment/probe side is spread
    e_a = ivf_assign(ensure_min_partitions(embeddings), cents, id_col, vec_col)

    q_arr = _centroid_cosines(F.col("qvec"), cents)
    # nprobe nearest centroids: sort desc by (cos, idx), slice, project idx
    probes = (
        queries.select(query_id_col, F.col(vec_col).alias("qvec"))
        .withColumn(
            "list_id",
            F.explode(
                F.transform(
                    F.slice(
                        F.reverse(F.array_sort(q_arr)), 1, int(nprobe)
                    ),
                    lambda s: s["idx"],
                )
            ),
        )
    )
    joined = e_a.join(F.broadcast(probes), "list_id")
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(_cosine(F.col(vec_col), F.col("qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
