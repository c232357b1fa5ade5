"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: JVM-side zip_with/aggregate dot products —
  the exact baseline. Cross join is bounded by broadcasting the (small)
  query set; at 100 TB the corpus side streams through executors once.
- LSH-bucketed variant (random hyperplane signatures): sign-bit
  signatures via deterministic pseudo-random hyperplanes derived from
  xxhash64 — no stored model, same result on any cluster size. Buckets
  shrink the candidate set; exact re-rank inside buckets.
- IVF-style variant: coarse quantize to the nearest of K seeded
  centroids (deterministic k-means-- one-pass assignment), probe the
  nearest P centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) — exact cosine top-k.

    queries is broadcast (small); ranking uses a window per query. Ties
    broken by neighbor id for determinism."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_sig(vec_col, n_planes: int, dim: int, seed: int = 42):
    """Sign-bit signature against n_planes pseudo-random hyperplanes.

    Plane p, dim d coefficient = centered hash in [-0.5, 0.5): fully
    deterministic, model-free — the same signature on every executor."""
    def coeff(p, d):
        return (
            F.pmod(F.xxhash64(F.lit(seed), p, d), F.lit(10_000)).cast("double") / 10_000.0
            - 0.5
        )

    def plane_bit(p):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda d: coeff(p, d)),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    sig = F.concat_ws("", *[plane_bit(F.lit(p)).cast("string") for p in range(n_planes)])
    return sig


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, n_planes: int = 8,
    dim: int = 16, id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket; exact
    cosine re-rank inside the bucket. Recall rises with fewer planes /
    multiple tables; this is the scale path (bucket join instead of
    cross join)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        _hyperplane_sig(F.col(vec_col), n_planes, dim, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _hyperplane_sig(F.col(vec_col), n_planes, dim, seed).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame, n_centroids: int = 16, dim: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
) -> DataFrame:
    """IVF coarse quantization: centroid c's coords are deterministic
    pseudo-random unit-ish vectors; each row assigned to argmax cosine.
    (corpus + centroid_id) — the partition key for IVF search."""
    def cent(cid):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.pmod(F.xxhash64(F.lit(seed), cid, d), F.lit(1000)).cast("double") / 1000.0 - 0.5,
        )

    sims = F.array(*[
        F.struct(
            cosine(F.col(vec_col), cent(F.lit(c))).alias("sim"),
            F.lit(c).alias("cid"),
        )
        for c in range(n_centroids)
    ])
    best = F.array_max(sims)
    return corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
        best["cid"].alias("centroid_id"),
    )
