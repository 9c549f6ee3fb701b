"""Physical-layout corpus queries (Z-order key algebra).

The z-key itself is deterministic bit arithmetic over equi-width bucket
ids, so it hash-checks against a plain-SQL DuckDB mirror — the oracle
recomputes min/max and the interleave from scratch.  The *layout effect*
(per-file bounding boxes shrink, scans prune) is asserted separately in
``tests/test_layout.py`` on real Parquet footers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.layout import zorder_key
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

_BITS = 8
_K = 2


def _sql_bucket(expr: str, lo: str, hi: str, bits: int) -> str:
    n = 1 << bits
    return (
        f"LEAST(GREATEST(CAST(FLOOR((CAST({expr} AS DOUBLE) - {lo})"
        f" / (({hi} - {lo}) / {n})) AS BIGINT), 0), {n - 1})"
    )


def _sql_interleave(bucket_exprs: list[str], bits: int) -> str:
    terms = []
    for i, b in enumerate(bucket_exprs):
        for j in range(bits):
            terms.append(f"((({b} >> {j}) & 1) << {j * len(bucket_exprs) + i})")
    return " + ".join(terms)


_ORACLE = f"""
    WITH stats AS (
      SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo0,
             CAST(MAX(o_custkey) AS DOUBLE) AS hi0,
             CAST(MIN(o_totalprice) AS DOUBLE) AS lo1,
             CAST(MAX(o_totalprice) AS DOUBLE) AS hi1
      FROM orders
    ), bucketed AS (
      SELECT o_orderkey,
             {_sql_bucket('o_custkey', 'lo0', 'hi0', _BITS)} AS b0,
             {_sql_bucket('o_totalprice', 'lo1', 'hi1', _BITS)} AS b1
      FROM orders CROSS JOIN stats
    )
    SELECT o_orderkey, {_sql_interleave(['b0', 'b1'], _BITS)} AS zkey
    FROM bucketed
"""


@register(
    "layout_zorder_key",
    _ORACLE,
    doc="Morton (Z-order) key over (o_custkey, o_totalprice): equi-width "
    "bucket ids interleaved bit-by-bit — the write-time clustering key "
    "behind multi-column data skipping (operators/layout.py "
    "cluster_by_zorder). Stats pass + pure shift/mask algebra; the "
    "oracle recomputes the whole construction in portable SQL.",
    expects_bnlj=True,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    stats = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo0"),
        F.max(F.col("o_custkey").cast("double")).alias("hi0"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo1"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi1"),
    )
    # equiwidth_bucket takes literal bounds (the operator path computes
    # stats driver-side); here the bounds stay columnar via a broadcast
    # stats join so both engines derive them identically from the same
    # parquet doubles — same arithmetic as equiwidth_bucket otherwise.
    n = 1 << _BITS

    def bucket(v: str, lo: str, hi: str):
        raw = F.floor(
            (F.col(v).cast("double") - F.col(lo))
            / ((F.col(hi) - F.col(lo)) / F.lit(float(n)))
        ).cast("long")
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))

    bucketed = o.join(F.broadcast(stats)).select(
        "o_orderkey",
        bucket("o_custkey", "lo0", "hi0").alias("b0"),
        bucket("o_totalprice", "lo1", "hi1").alias("b1"),
    )
    return bucketed.select(
        "o_orderkey",
        zorder_key([F.col("b0"), F.col("b1")], _BITS).alias("zkey"),
    )
