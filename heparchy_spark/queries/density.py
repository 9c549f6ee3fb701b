"""Density / DBSCAN corpus queries (operators/density.py).

Points are parts embedded in the (retail-price / 50, size) plane — the
axes scaled so one grid cell is one epsilon.  The Spark side never
forms all pairs (grid equi-join, candidate verify); the oracles DO
(quadratic self-join / recursive CTE), so parity again compares the
scalable plan against the textbook definition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.density import (
    dbscan_core_clusters,
    neighbor_counts,
)
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

_PTS_SQL = (
    "SELECT p_partkey AS id, p_retailprice / 50.0 AS x,"
    " CAST(p_size AS DOUBLE) AS y FROM part"
)


@register(
    "density_core_parts",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT a.id AS p_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           COUNT(*) >= 8 AS is_core
    FROM pts a JOIN pts b
      ON (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) <= 0.25
    GROUP BY a.id
    """,
    doc="DBSCAN core-point test over parts in the scaled "
    "(price, size) plane: eps-neighborhood size per point (eps=0.5, "
    "min_pts=8, self included).  Spark generates candidates with the "
    "3x3 grid-cell equi-join (never all pairs); the oracle runs the "
    "quadratic distance self-join the grid replaces.",
)
def density_core_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return neighbor_counts(
        part.select(
            "p_partkey",
            (F.col("p_retailprice") / F.lit(50.0)).alias("x"),
            F.col("p_size").cast("double").alias("y"),
        ),
        "p_partkey",
        "x",
        "y",
        eps=0.5,
        min_pts=8,
    )


@register(
    "density_dbscan_clusters",
    f"""
    WITH RECURSIVE
    pts AS ({_PTS_SQL.replace("FROM part", "FROM part WHERE p_brand = 'Brand#11'")}),
    pairs AS (
      SELECT a.id AS ida, b.id AS idb
      FROM pts a JOIN pts b
        ON (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) <= 1.0
    ),
    cores AS (
      SELECT ida AS id FROM pairs GROUP BY ida HAVING COUNT(*) >= 3
    ),
    ce AS (
      SELECT ida, idb FROM pairs
      WHERE ida < idb
        AND ida IN (SELECT id FROM cores)
        AND idb IN (SELECT id FROM cores)
    ),
    sym AS (
      SELECT ida AS a, idb AS b FROM ce
      UNION ALL
      SELECT idb AS a, ida AS b FROM ce
    ),
    reach(node, lab) AS (
      SELECT id, id FROM cores
      UNION
      SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS p_partkey, CAST(MIN(lab) AS BIGINT) AS cluster
    FROM reach GROUP BY node
    """,
    doc="DBSCAN cluster labels (min reachable core id) of the core "
    "points among Brand#11 parts in the scaled (price, size) plane "
    "(eps=1, min_pts=3).  Spark: grid-cell candidate join + "
    "large-star/small-star contraction (O(log n) rounds — the dense "
    "eps-graph's diameter scales with spatial extent, so min-label "
    "propagation would not survive).  Oracle: quadratic distance "
    "self-join + recursive-CTE reachability.",
)
def density_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    return dbscan_core_clusters(
        part.select(
            "p_partkey",
            (F.col("p_retailprice") / F.lit(50.0)).alias("x"),
            F.col("p_size").cast("double").alias("y"),
        ),
        "p_partkey",
        "x",
        "y",
        eps=1.0,
        min_pts=3,
    )
