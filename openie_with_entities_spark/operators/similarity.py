"""Similarity search over an embedding column (array<float>).

  * ``cosine_topk``      — brute-force exact top-k: queries × corpus with the
    dot product as a native higher-order-function expression (zip_with +
    aggregate, JVM codegen, no Python). Scale shape: broadcast the (small)
    query set against the (huge) corpus — one scan, no corpus shuffle.
  * ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH signs
    computed from deterministic per-dimension hash weights, equi-join on the
    bucket signature, exact re-rank inside buckets only.

Both rank by the cosine ROUNDED to 4 decimals with vec_id tiebreak, so
rankings are reproducible across engines and summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")
        )
    )
    return dot / (na * nb)


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """queries(q_id, q_vec) × embeddings(vec_id, embedding) → top-k rows
    (q_id, vec_id, cos_sim, rk)."""
    joined = embeddings.crossJoin(F.broadcast(queries)).select(
        "q_id",
        "vec_id",
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def _hyperplane_sign(vec, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane: weight of dimension i is the
    (zero-centered) xxhash of (plane, i). Sign of the projection = one LSH
    bit. Pure SQL, no RNG state."""
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.lit(plane), i), F.lit(2001)) - F.lit(1000)
        ).cast("double"),
    )
    proj = F.aggregate(
        F.zip_with(vec, weights, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (proj >= 0).cast("int")


def lsh_bucket(vec, n_planes: int, dim: int):
    bits = [
        _hyperplane_sign(vec, p, dim) * (2**p) for p in range(n_planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane-sign
    bucket; exact cosine re-rank within the bucket. At 100 TB the bucket
    join replaces the full-corpus scan per query."""
    emb_b = embeddings.withColumn(
        "bucket", lsh_bucket(F.col("embedding"), n_planes, dim)
    )
    q_b = queries.withColumn("bucket", lsh_bucket(F.col("q_vec"), n_planes, dim))
    joined = emb_b.join(F.broadcast(q_b), "bucket").select(
        "q_id",
        "vec_id",
        F.round(_cosine(F.col("q_vec"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return joined.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= k
    )
