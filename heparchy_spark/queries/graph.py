"""Graph corpus queries (PageRank over the part-supplier network).

The oracle replays the exact 8-iteration trajectory as UNROLLED SQL CTEs
(standard SQL forbids aggregates in recursive terms, so recursion is
spelled out) — possible because the operator runs in fixed-point int64
arithmetic (operators/graph.py), making every iteration bit-identical on
any engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.graph import SCALE, pagerank
from heparchy_spark.queries import register
from heparchy_spark.queries.tables import load

_ITERS = 8
_D_PCT = 85
_OFFSET = 1_000_000


def _pagerank_sql(iters: int) -> str:
    ctes = [
        "supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)",
        f"""edges AS (
          SELECT l_partkey AS src, l_suppkey + {_OFFSET} AS dst FROM supply
          UNION ALL
          SELECT l_suppkey + {_OFFSET} AS src, l_partkey AS dst FROM supply
        )""",
        """nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        )""",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        f"""bb AS (
          SELECT n, {SCALE} // n AS r0,
                 ({SCALE} * {100 - _D_PCT}) // 100 // n AS base
          FROM nn
        )""",
        "pr0 AS (SELECT node, r0 AS r FROM nodes CROSS JOIN bb)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""pr{i} AS (
          SELECT nodes.node,
                 bb.base + ({_D_PCT} * COALESCE(c.s, 0)) // 100 AS r
          FROM nodes CROSS JOIN bb
          LEFT JOIN (
            SELECT e.dst AS node, SUM(p.r // d.deg) AS s
            FROM edges e
            JOIN pr{i - 1} p ON p.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) c ON c.node = nodes.node
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(r AS DOUBLE) / {float(SCALE)} AS rank"
        + f" FROM pr{iters}"
    )


@register(
    "graph_pagerank_supply_network",
    _pagerank_sql(_ITERS),
    doc="PageRank (d=0.85, 8 fixed iterations) over the bipartite "
    "part-supplier network derived from lineitem: supply-chain "
    "centrality. Fixed-point int64 iteration (ticks of 1e-12) makes the "
    "trajectory engine-exact, so the oracle replays it as unrolled SQL "
    "(operators/graph.py pagerank).",
)
def graph_pagerank_supply_network(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    fwd = supply.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + _OFFSET).alias("dst"),
    )
    bwd = supply.select(
        (F.col("l_suppkey") + _OFFSET).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    return pagerank(
        fwd.unionByName(bwd), "src", "dst", damping_pct=_D_PCT, iters=_ITERS
    )
