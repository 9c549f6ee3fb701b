"""Skyline (Pareto frontier) corpus query.

Spark side: the distributed prefix-max plan (operators/skyline.py) —
per-x combinable reduction, two-level parallel prefix, broadcast
frontier semi-join.  Oracle: the independent all-pairs NOT EXISTS
dominance formulation (fine at sf scale on DuckDB, impossible at 100 TB
— which is the point of the operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.skyline import skyline_2d
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load


@register(
    "skyline_cheap_big_parts",
    """
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    doc="Pareto frontier of parts (minimize retail price, maximize size) "
    "via a distributed prefix-max: per-price combinable max-size "
    "reduction, bucket-level parallel prefix (only |buckets| rows ever "
    "on one node), broadcast frontier semi-join back. The oracle is the "
    "independent quadratic NOT-EXISTS dominance definition, so parity "
    "compares two different algorithms for the same frontier.",
    expects_bnlj=True,
    expects_broadcast="1-row bounds + <=64-row bucket-prefix frame",
    expects_global_window="n_buckets(=64)-row bucket-max table",
)
def skyline_cheap_big_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return skyline_2d(
        part.select("p_partkey", "p_retailprice", "p_size"),
        x_col="p_retailprice",
        y_col="p_size",
    )
