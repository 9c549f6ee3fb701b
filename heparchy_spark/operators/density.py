"""Grid-bucketed density operators (distributed DBSCAN building blocks).

The naive epsilon-neighborhood query is an all-pairs distance join —
quadratic, dead at scale.  The standard distributed decomposition
(spatial grid partitioning, the same cell trick every scale-out DBSCAN
paper uses — e.g. MR-DBSCAN, He et al. 2011) makes it an EQUI-join:

1. key every point by its grid cell ``(floor(x/eps), floor(y/eps))``;
2. a point's eps-neighbors can only live in the 3x3 block of adjacent
   cells, so explode each LEFT point to its 9 candidate cells and
   equi-join against the RIGHT points' single actual cell — every
   candidate pair is generated exactly once, shuffle keyed by cell;
3. verify the true euclidean distance on the bounded candidate set.

``neighbor_counts`` gives per-point eps-neighborhood sizes (DBSCAN's
core-point test: ``|N_eps(p)| >= min_pts``, self included).
``dbscan_core_clusters`` chains the core-core edges into cluster labels
via the corpus' min-label connected components — the full density
clustering of the core skeleton (border assignment is one more
broadcast join against the tiny frontier, same shape).

Determinism: cell keys are integer floors; distances are IEEE doubles
computed identically by any engine (same subtract/multiply/add order),
so the candidate filter and the counts are exact — no rounding grid
needed anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _celled(pts: DataFrame, eps: float) -> DataFrame:
    return pts.select(
        "__id",
        "__x",
        "__y",
        F.floor(F.col("__x") / F.lit(eps)).cast("long").alias("__cx"),
        F.floor(F.col("__y") / F.lit(eps)).cast("long").alias("__cy"),
    )


def _candidate_pairs(pts: DataFrame, eps: float) -> DataFrame:
    """(left id/x/y, right id/x/y) for every pair within ``eps`` —
    each unordered pair appears in both directions, once each."""
    cells = _celled(pts, eps)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = cells.select(
        F.col("__id").alias("__ida"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.explode(offsets).alias("__o"),
        "__cx",
        "__cy",
    ).select(
        "__ida",
        "__xa",
        "__ya",
        (F.col("__cx") + F.col("__o.dx")).alias("__kx"),
        (F.col("__cy") + F.col("__o.dy")).alias("__ky"),
    )
    right = cells.select(
        F.col("__id").alias("__idb"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__cx").alias("__kx"),
        F.col("__cy").alias("__ky"),
    )
    dx = F.col("__xb") - F.col("__xa")
    dy = F.col("__yb") - F.col("__ya")
    return (
        left.join(right, ["__kx", "__ky"])
        .where(dx * dx + dy * dy <= F.lit(eps) * F.lit(eps))
        .select("__ida", "__xa", "__ya", "__idb", "__xb", "__yb")
    )


def neighbor_counts(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """(id, n_neighbors, is_core): eps-neighborhood size per point
    (self included — DBSCAN's convention) and the core-point flag."""
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    return (
        _candidate_pairs(pts, eps)
        .groupBy(F.col("__ida").alias(id_col))
        .agg(F.count("*").alias("n_neighbors"))
        .withColumn("is_core", F.col("n_neighbors") >= F.lit(min_pts))
    )


def dbscan_core_clusters(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """(id, cluster): DBSCAN cluster labels of the CORE points —
    connected components (min reachable core id) of the core-core
    eps-graph.  Border/noise points are excluded; attaching borders is
    one more broadcast join against this (small) core table."""
    from heparchy_spark.operators.dedup import connected_components_star

    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    pairs = _candidate_pairs(pts, eps)
    cores = (
        pairs.groupBy("__ida")
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") >= F.lit(min_pts))
        .select(F.col("__ida").alias("__core"))
    )
    core_edges = (
        pairs.where(F.col("__ida") < F.col("__idb"))
        .join(cores.withColumnRenamed("__core", "__ida"), "__ida", "semi")
        .join(cores.withColumnRenamed("__core", "__idb"), "__idb", "semi")
        .select("__ida", "__idb")
    )
    # star contraction, not min-label propagation: a dense eps-graph over
    # a long spatial region has diameter ~ its extent / eps — O(log n)
    # rounds survive that where O(diameter) would not
    return connected_components_star(
        core_edges,
        "__ida",
        "__idb",
        nodes=cores.select(F.col("__core").alias("__id")),
        node_col="__id",
    ).select(F.col("node").alias(id_col), F.col("component").alias("cluster"))
