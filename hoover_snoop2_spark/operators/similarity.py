"""Similarity search over an embedding column (`array<float>`).

Two paths:

- ``brute_force_topk`` — exact cosine top-k: cross join (queries broadcast)
  + window rank.  The correctness baseline and the oracle-checkable one
  (DuckDB ``list_cosine_similarity``).
- ``ann_lsh_topk`` — sign-random-projection LSH: both sides hashed into
  2^n_planes buckets with multi-probe (hamming-1 neighbors of the query
  bucket); candidates scored exactly.  The 100-TB path: the big side is
  shuffled once on bucket id, each query probes a handful of buckets.

Dot products stay JVM-side via ``zip_with`` + ``aggregate`` higher-order
functions — no Python round trip.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str | F.Column, b: str | F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(a) if isinstance(a, str) else a,
                   F.col(b) if isinstance(b, str) else b,
                   lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: str, b: str) -> F.Column:
    """cosine(a, b) as a pure column expression (doubles)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self).

    queries is expected small → broadcast; ranking is deterministic:
    (rounded cosine desc, neighbor id asc), so results are reproducible
    across engines/float orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "nv"), 4))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_literals(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).round(6).tolist()


def bucket_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-projection bucket id: bit i = (v . plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(F.col(vec_col).cast("array<double>"), F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket and
    its hamming-1 neighbor buckets (multi-probe), then exact cosine.

    At scale: ``vectors`` is hashed and shuffled ONCE on bucket; each query
    expands to n_planes+1 probe rows — the join is bucket-equi, no cross
    product.
    """
    if dim is None:
        first = vectors.select(F.size(vec_col)).first()
        dim = first[0]
    planes = _plane_literals(dim, n_planes)

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        bucket_expr(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        bucket_expr(vec_col, planes).alias("qbucket"),
    )
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr("qv", "nv"), 4))
        .select("query_id", "neighbor_id", "cosine")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
