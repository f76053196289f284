"""Similarity search over embedding columns (array<float/double>).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH-bucketed variant as the scale path (bucket join
instead of full cross product). Dot products stay JVM-side via
``F.zip_with`` + ``F.aggregate`` — no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query id → (query_id, rank,
    neighbor_id, cos_sim). The query side is tiny → broadcast; the
    corpus side streams (one pass, no shuffle before the top-k
    window)."""
    q = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    pairs = (
        embeddings.alias("c")
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_sim",
            _dot(F.col(vec_col), F.col("qvec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col(id_col).alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against fixed hyperplanes —
    the bucket key for approximate search."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        * F.lit(1 << i)
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: bucket by hyperplane signature, then
    exact scoring only within the query's bucket. At corpus scale the
    bucket equi-join replaces the cross product — candidate count
    drops ~2^n_planes-fold; recall is tested against the brute path."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    q = (
        bucketed.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col("bucket").alias("qbucket"),
        )
    )
    pairs = (
        bucketed.join(
            F.broadcast(q), bucketed["bucket"] == q["qbucket"]
        )
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_sim",
            _dot(F.col(vec_col), F.col("qvec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col(id_col).alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-
    blocked (bucket self-join) → (id_a, id_b, cos_sim)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    b = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, "bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .withColumn(
            "cos_sim",
            _dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
            / (_norm(F.col(f"l.{vec_col}")) * _norm(F.col(f"r.{vec_col}"))),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .distinct()
    )
