"""Similarity search over embedding columns — [ext] (SURVEY.md §2.12).

Brute-force cosine top-k is the exact baseline: dot products via
``F.zip_with`` + ``F.aggregate`` (JVM codegen, no Python).  The scale path is
random-hyperplane LSH: b sign-bits bucket the vectors; queries probe only
their own bucket (optionally multi-probe neighbors), turning the all-pairs
product into an equi join on bucket id.  Hyperplanes are seeded NumPy,
shipped as literal arrays (tiny: bits x dim doubles), so the plan stays
deterministic and broadcast-free.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "hyperplane_bucket",
    "lsh_cosine_topk",
    "embedding_near_dup_pairs",
]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k rows by cosine similarity to a literal query vector.

    Brute force, but fully distributed: the scan computes one fused
    projection per row and TakeOrdered keeps k per partition.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col), q).alias("cosine_sim")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def hyperplane_bucket(
    vec_col: Column, dim: int, bits: int = 12, seed: int = 7
) -> Column:
    """Random-hyperplane LSH bucket id (int) for a vector column."""
    planes = _hyperplanes(dim, bits, seed)
    bucket = F.lit(0).cast("long")
    for i in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (dot(vec_col, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    queries: DataFrame,
    q_vec_col: str,
    q_id_col: str,
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate per-query top-k: bucket both sides, equi-join on bucket,
    rank within query.  Output: (query id, match id, cosine_sim, rk).

    Recall/cost dial: fewer bits -> bigger buckets -> higher recall & cost.
    """
    base = df.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("__v"),
        hyperplane_bucket(F.col(vec_col), dim, bits, seed).alias("__bucket"),
    )
    qs = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.col(q_vec_col).alias("__q"),
        hyperplane_bucket(F.col(q_vec_col), dim, bits, seed).alias("__bucket"),
    )
    joined = base.join(F.broadcast(qs), "__bucket").select(
        "query_id",
        "match_id",
        cosine(F.col("__v"), F.col("__q")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("match_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join + exact verify.

    Output: (id_a, id_b, cosine_sim) with id_a < id_b, sim >= threshold.
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        hyperplane_bucket(F.col(vec_col), dim, bits, seed).alias("__bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    cand = a.join(
        b,
        (F.col("a.__bucket") == F.col("b.__bucket"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        cosine(F.col("a.__v"), F.col("b.__v")).alias("cosine_sim"),
    )
    return cand.where(F.col("cosine_sim") >= threshold)
