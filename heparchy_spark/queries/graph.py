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
        f"""edges AS MATERIALIZED (
          SELECT l_partkey AS src, l_suppkey + {_OFFSET} AS dst FROM supply
          UNION ALL
          SELECT l_suppkey + {_OFFSET} AS src, l_partkey AS dst FROM supply
        )""",
        """nodes AS MATERIALIZED (
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


@register(
    "graph_triangle_counts",
    """
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_quantity >= 49
    ),
    e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM supply a JOIN supply b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    ),
    t AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM e e1
      JOIN e e2 ON e1.dst = e2.src
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    m AS (
      SELECT a AS node FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM m GROUP BY node
    """,
    doc="Per-supplier triangle counts in the high-quantity co-supply "
    "graph (suppliers adjacent when they ship the same part). Spark "
    "side runs the degree-ordered orientation (Suri-Vassilvitskii): "
    "wedges enumerate only at each edge's rank-smaller apex, bounding "
    "work at O(m^1.5) under any degree skew; the oracle uses the naive "
    "oriented triple join, valid because per-node participation counts "
    "are orientation-independent.",
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import triangle_counts

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    supply = li.select("l_partkey", "l_suppkey").distinct()
    a = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src")
    )
    b = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        a.join(b, "pk")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return triangle_counts(edges)


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled peeling oracle (the pagerank-CTE pattern): ``rounds``
    parallel peel steps — a fixpoint reached earlier makes later rounds
    no-ops, so any unroll >= the true peel depth yields the core (depth
    is 3 at sf0.01; 8 gives headroom).  CTEs are MATERIALIZED: each
    round references its predecessor several times, and DuckDB's
    default inlining re-expands the whole lineage exponentially."""
    parts = [
        """supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_quantity >= 49
    )""",
        """e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM supply a JOIN supply b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    )""",
    ]
    for i in range(rounds):
        parts.append(
            f"""d{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT src AS node FROM e{i} UNION ALL SELECT dst FROM e{i}
      ) GROUP BY node
    )"""
        )
        parts.append(
            f"""e{i + 1} AS MATERIALIZED (
      SELECT src, dst FROM e{i}
      WHERE src NOT IN (SELECT node FROM d{i} WHERE degree < {k})
        AND dst NOT IN (SELECT node FROM d{i} WHERE degree < {k})
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      SELECT src AS node FROM e{rounds} UNION ALL SELECT dst FROM e{rounds}
    ) GROUP BY node
    """
    )


@register(
    "graph_kcore_supply",
    _kcore_oracle_sql(k=18, rounds=8),
    doc="18-core of the high-quantity co-supply graph "
    "(operators/graph.py kcore): parallel peeling — every round drops "
    "ALL degree<k nodes at once (the unique core makes order "
    "irrelevant), one combinable degree aggregate + two anti-joins per "
    "round, localCheckpoint capping lineage like pagerank. The oracle "
    "unrolls 8 peel rounds as CTEs; the Spark side iterates to the "
    "true fixpoint (depth 3 at sf0.01).",
)
def graph_kcore_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import kcore

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    supply = li.select("l_partkey", "l_suppkey").distinct()
    a = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src")
    )
    b = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        a.join(b, "pk")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return kcore(edges, k=18)


def _lpa_oracle_sql(iters: int) -> str:
    """Unrolled synchronous-LPA replay (the pagerank-CTE pattern): each
    round every node takes the (count desc, label asc)-first label over
    its neighbours' previous labels.  MATERIALIZED like the k-core
    oracle — each round is referenced by the next."""
    parts = [
        """supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_quantity >= 49
    )""",
        """eu AS MATERIALIZED (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM supply a JOIN supply b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    )""",
        """e AS MATERIALIZED (
      SELECT src, dst FROM eu
      UNION ALL SELECT dst AS src, src AS dst FROM eu
    )""",
        """l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS label FROM e
    )""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""l{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT e.src AS node, p.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.src
                 ORDER BY COUNT(*) DESC, p.label
               ) AS rk
        FROM e JOIN l{i - 1} p ON p.node = e.dst
        GROUP BY e.src, p.label
      ) WHERE rk = 1
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, label AS community FROM l{iters}"
    )


@register(
    "graph_label_propagation",
    _lpa_oracle_sql(4),
    doc="Community detection over the high-quantity co-supply graph by "
    "deterministic synchronous label propagation "
    "(operators/graph.py label_propagation): 4 fixed rounds, argmax "
    "tie-break (votes desc, label asc) makes the trajectory a pure "
    "function of the edge set, so the oracle replays it as unrolled "
    "CTEs — the pagerank pattern. Per round: one label join, one "
    "combinable vote count, one bounded per-node window.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import label_propagation

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    supply = li.select("l_partkey", "l_suppkey").distinct()
    a = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src")
    )
    b = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        a.join(b, "pk")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return label_propagation(edges, iters=4)


@register(
    "graph_clustering_coefficient",
    """
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_quantity >= 49
    ),
    e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM supply a JOIN supply b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      ) GROUP BY node
    ),
    t AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM e e1
      JOIN e e2 ON e1.dst = e2.src
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    tc AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT a AS node FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t
      ) GROUP BY node
    )
    SELECT deg.node, CAST(deg.degree AS BIGINT) AS degree,
           CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
           ROUND(2.0 * COALESCE(tc.n_triangles, 0)
                 / (degree * (degree - 1)), 6) AS clustering_coeff
    FROM deg LEFT JOIN tc ON deg.node = tc.node
    WHERE deg.degree >= 2
    """,
    doc="Local clustering coefficient per supplier: 2T(v)/(d(v)(d(v)-1)) "
    "composed from the degree aggregate and the degree-oriented "
    "triangle counts (operators/graph.py triangle_counts) — the "
    "transitivity profile of the co-supply graph; nodes below degree 2 "
    "are excluded (coefficient undefined).",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import triangle_counts

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    supply = li.select("l_partkey", "l_suppkey").distinct()
    a = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src")
    )
    b = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        a.join(b, "pk")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tc = triangle_counts(edges)
    d = F.col("degree").cast("double")
    return (
        deg.join(tc, "node", "left")
        .where(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.round(
                2.0 * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (d * (d - 1.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )


def _bfs_oracle_sql(max_hops: int) -> str:
    """Unrolled frontier-BFS replay: levels past the true eccentricity
    are empty no-ops, so any unroll >= the reached depth is exact."""
    parts = [
        """supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_quantity >= 49
    )""",
        """eu AS MATERIALIZED (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM supply a JOIN supply b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    )""",
        """e AS MATERIALIZED (
      SELECT src, dst FROM eu
      UNION ALL SELECT dst AS src, src AS dst FROM eu
    )""",
        """f0 AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM e WHERE src <= 3
    )""",
        "v0 AS MATERIALIZED (SELECT node, 0 AS hops FROM f0)",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
      SELECT DISTINCT e.dst AS node
      FROM f{i - 1} JOIN e ON e.src = f{i - 1}.node
      WHERE e.dst NOT IN (SELECT node FROM v{i - 1})
    )"""
        )
        parts.append(
            f"""v{i} AS MATERIALIZED (
      SELECT node, hops FROM v{i - 1}
      UNION ALL SELECT node, {i} FROM f{i}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, CAST(hops AS INTEGER) AS hops FROM v{max_hops}"
    )


@register(
    "graph_bfs_hops",
    _bfs_oracle_sql(6),
    doc="Hop distances from the low-id supplier seed set over the high-"
    "quantity co-supply graph (operators/graph.py bfs_hops): Pregel-"
    "style frontier BFS — per level one neighbor equi-join, a "
    "combinable distinct, and an anti-join against the visited set; "
    "minimal hop counts are unique so the result is scheduling-"
    "independent and the oracle unrolls the levels as CTEs.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import bfs_hops

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    supply = li.select("l_partkey", "l_suppkey").distinct()
    a = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src")
    )
    b = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        a.join(b, "pk")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    sources = nodes.where(F.col("node") <= 3)
    out = bfs_hops(edges, sources, max_hops=6)
    return out.select("node", F.col("hops").cast("int").alias("hops"))


_HITS_ITERS = 6


def _hits_sql(iters: int) -> str:
    ctes = [
        "supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)",
        f"""edges AS (
          SELECT l_partkey AS src, l_suppkey + {_OFFSET} AS dst FROM supply
        )""",
        """nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        )""",
        f"h0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""ar{i} AS MATERIALIZED (
          SELECT e.dst AS node, CAST(SUM(h.h) AS BIGINT) AS s
          FROM edges e JOIN h{i - 1} h ON h.node = e.src
          GROUP BY e.dst
        )""")
        ctes.append(
            f"aq{i} AS MATERIALIZED (SELECT GREATEST(MAX(s) // {SCALE}, 1)"
            f" AS q FROM ar{i})"
        )
        ctes.append(f"""a{i} AS MATERIALIZED (
          SELECT n.node, COALESCE(ar.s, 0) // aq.q AS a
          FROM nodes n
          LEFT JOIN ar{i} ar ON ar.node = n.node
          CROSS JOIN aq{i} aq
        )""")
        ctes.append(f"""hr{i} AS MATERIALIZED (
          SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS s
          FROM edges e JOIN a{i} a ON a.node = e.dst
          GROUP BY e.src
        )""")
        ctes.append(
            f"hq{i} AS MATERIALIZED (SELECT GREATEST(MAX(s) // {SCALE}, 1)"
            f" AS q FROM hr{i})"
        )
        ctes.append(f"""h{i} AS MATERIALIZED (
          SELECT n.node, COALESCE(hr.s, 0) // hq.q AS h
          FROM nodes n
          LEFT JOIN hr{i} hr ON hr.node = n.node
          CROSS JOIN hq{i} hq
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT n.node,
               CAST(h.h AS DOUBLE) / {float(SCALE)} AS hub_score,
               CAST(a.a AS DOUBLE) / {float(SCALE)} AS authority_score
        FROM nodes n
        JOIN h{iters} h ON h.node = n.node
        JOIN a{iters} a ON a.node = n.node
        """
    )


@register(
    "graph_hits_supply",
    _hits_sql(_HITS_ITERS),
    doc="HITS hubs/authorities (6 fixed iterations) over the DIRECTED "
    "part->supplier graph from lineitem: parts are hubs (they point at "
    "good suppliers), suppliers are authorities — the bipartite "
    "co-citation weighting HITS reduces to on such graphs.  Fixed-point "
    "int64 trajectory with integer-quotient normalization makes every "
    "round engine-exact, so the oracle replays all 6 iterations as "
    "unrolled SQL CTEs (operators/graph.py hits — the pagerank "
    "technique extended to a two-phase iteration).",
    expects_bnlj=True,
    expects_broadcast="1-row normalization quotients; |V| score frames size-gated (unhinted above 1M nodes)",
)
def graph_hits_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import hits

    li = load(spark, sf_dir, "lineitem")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    edges = supply.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + _OFFSET).alias("dst"),
    )
    return hits(edges, "src", "dst", iters=_HITS_ITERS)


_SSSP_SQL = """WITH supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(ROUND(MIN(l_extendedprice) * 100) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    e AS (
      SELECT pk AS src, sk + 1000000 AS dst, w FROM supply
      UNION ALL
      SELECT sk + 1000000 AS src, pk AS dst, w FROM supply
    ),
    d0 AS (
      SELECT s_suppkey + 1000000 AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey <= 5
    ),
    d1 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d0
        UNION ALL
        SELECT e.dst AS node, d0.dist + e.w AS dist
        FROM d0 JOIN e ON e.src = d0.node
      ) u GROUP BY node
    ),
    d2 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d1
        UNION ALL
        SELECT e.dst AS node, d1.dist + e.w AS dist
        FROM d1 JOIN e ON e.src = d1.node
      ) u GROUP BY node
    ),
    d3 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d2
        UNION ALL
        SELECT e.dst AS node, d2.dist + e.w AS dist
        FROM d2 JOIN e ON e.src = d2.node
      ) u GROUP BY node
    ),
    d4 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d3
        UNION ALL
        SELECT e.dst AS node, d3.dist + e.w AS dist
        FROM d3 JOIN e ON e.src = d3.node
      ) u GROUP BY node
    )
    SELECT node, CAST(dist AS BIGINT) AS dist_cents,
           ROUND(CAST(dist AS DOUBLE) / 100, 2) AS min_cost
    FROM d4"""


@register(
    "graph_sssp_supply_cost",
    _SSSP_SQL,
    doc="Weighted shortest supply-chain cost from the low-id supplier "
    "seed set over the bipartite part<->supplier graph (edge weight = "
    "cents of the cheapest observed lineitem price for that pair), "
    "4 min-plus Bellman-Ford relaxations (operators/graph.py sssp): "
    "per round ONE edge equi-join + one combinable min-aggregate, "
    "edge list materialized once, lazy per-round checkpoints — the "
    "Pregel SSSP shape.  Integer min-plus is exact, so the oracle "
    "replays the rounds as unrolled CTEs.",
)
def graph_sssp_supply_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import sssp

    li = load(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.round(F.min("l_extendedprice") * 100)
        .cast("long")
        .alias("w")
    )
    edges = supply.select(
        F.col("pk").alias("src"),
        (F.col("sk") + _OFFSET).alias("dst"),
        "w",
    ).unionAll(
        supply.select(
            (F.col("sk") + _OFFSET).alias("src"),
            F.col("pk").alias("dst"),
            "w",
        )
    )
    sup = load(spark, sf_dir, "supplier")
    sources = sup.where(F.col("s_suppkey") <= 5).select(
        (F.col("s_suppkey") + _OFFSET).alias("node")
    )
    out = sssp(edges, sources, iters=4)
    return out.select(
        "node",
        F.col("dist").alias("dist_cents"),
        F.round(F.col("dist").cast("double") / 100, 2).alias("min_cost"),
    )


# ---------------------------------------------------------------------------
# graph_ppr_supply_seeded — personalized PageRank from a supplier seed set
# ---------------------------------------------------------------------------

_PPR_ITERS = 6
_PPR_TOP = 20


def _ppr_sql() -> str:
    d = _D_PCT
    ctes = [
        "supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)",
        f"""edges AS MATERIALIZED (
          SELECT l_partkey AS src, l_suppkey + {_OFFSET} AS dst FROM supply
          UNION ALL
          SELECT l_suppkey + {_OFFSET} AS src, l_partkey AS dst FROM supply
        )""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        f"""seeds AS (
          SELECT s_suppkey + {_OFFSET} AS node FROM supplier
          WHERE s_suppkey <= 5
        )""",
        "ks AS (SELECT COUNT(*) AS k FROM seeds)",
        f"""sb AS (
          SELECT node,
                 ({SCALE} * {100 - _D_PCT}) // 100 // k AS base
          FROM seeds CROSS JOIN ks
        )""",
        f"pr0 AS (SELECT node, {SCALE} // k AS r FROM seeds CROSS JOIN ks)",
    ]
    for i in range(1, _PPR_ITERS + 1):
        ctes.append(f"""pr{i} AS (
          SELECT COALESCE(c.node, sb.node) AS node,
                 COALESCE(sb.base, 0) + ({d} * COALESCE(c.s, 0)) // 100 AS r
          FROM (
            SELECT e.dst AS node, SUM(p.r // dg.deg) AS s
            FROM edges e
            JOIN pr{i - 1} p ON p.node = e.src
            JOIN deg dg ON dg.src = e.src
            GROUP BY e.dst
          ) c FULL JOIN sb ON sb.node = c.node
        )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT node, CAST(r AS DOUBLE) / {float(SCALE)} AS rank_score
    FROM pr{_PPR_ITERS}
    ORDER BY r DESC, node
    LIMIT {_PPR_TOP}
    """
    )


@register(
    "graph_ppr_supply_seeded",
    _ppr_sql(),
    doc="Personalized PageRank (d=0.85, 6 fixed int64 rounds) seeded at "
    "suppliers 1-5 over the bipartite part-supplier graph: proximity "
    "ranking to the seed set, top-20. Teleport mass lands only on the "
    "seeds, so the rank table stays SPARSE — per-round state is the "
    "reached set, not |V| (operators/graph.py personalized_pagerank); "
    "the oracle replays the trajectory as unrolled CTEs with a "
    "full-outer seed-base join per round. Seed keys are low-id "
    "(scale-stable at every sf).",
)
def graph_ppr_supply_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import personalized_pagerank

    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    fwd = supply.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + _OFFSET).alias("dst"),
    )
    bwd = supply.select(
        (F.col("l_suppkey") + _OFFSET).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    seeds = sup.where(F.col("s_suppkey") <= 5).select(
        (F.col("s_suppkey") + _OFFSET).alias("node")
    )
    pr = personalized_pagerank(
        fwd.unionByName(bwd),
        seeds,
        damping_pct=_D_PCT,
        iters=_PPR_ITERS,
    )
    return (
        pr.orderBy(F.col("rank").desc(), F.col("node"))
        .limit(_PPR_TOP)
        .select("node", F.col("rank").alias("rank_score"))
    )


# ---------------------------------------------------------------------------
# graph_boruvka_forest — MST rounds over the weighted co-supply graph
# ---------------------------------------------------------------------------

_MST_ROUNDS = 3


# Pointer-doubling depth for the oracle's label merge: each doubling
# step squares the walk length, so K steps cover merge trees of depth
# 2^K.  Tree depth is bounded by the component count (<= supplier
# count: 1000 at sf0.1, 10000 at sf1), so K=14 covers every sweep
# scale with margin; each step is one self-join on a <=|suppliers|-row
# CTE, so over-unrolling is nearly free (vs the old recursive-CTE
# transitive closure that materialized O(n^2) (node, label) pairs and
# took >550 s alone at sf0.01).
_MST_PTR_STEPS = 14


def _boruvka_sql() -> str:
    parts = [
        """supply AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(ROUND(MIN(l_extendedprice) * 100) AS BIGINT) AS mn
      FROM lineitem WHERE l_quantity >= 49 GROUP BY 1, 2
    )""",
        """e AS MATERIALIZED (
      SELECT a.sk AS src, b.sk AS dst, MIN(a.mn + b.mn) AS w
      FROM supply a JOIN supply b
        ON a.pk = b.pk AND a.sk < b.sk
      GROUP BY 1, 2
    )""",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        """lab1 AS (SELECT node, node AS c FROM nodes)""",
    ]
    for r in range(1, _MST_ROUNDS + 1):
        parts.append(f"""cand{r} AS (
      SELECT lu.c AS cu, lv.c AS cv, e.src, e.dst, e.w
      FROM e
      JOIN lab{r} lu ON lu.node = e.src
      JOIN lab{r} lv ON lv.node = e.dst
      WHERE lu.c <> lv.c
    )""")
        # Each component's unique (w, src, dst)-min candidate, with the
        # partner component riding along (rk = 1 row per comp).
        parts.append(f"""pk{r} AS MATERIALIZED (
      SELECT comp, other, src, dst, w,
             ROW_NUMBER() OVER (
               PARTITION BY comp ORDER BY w, src, dst) AS rk
      FROM (
        SELECT cu AS comp, cv AS other, src, dst, w FROM cand{r}
        UNION ALL
        SELECT cv AS comp, cu AS other, src, dst, w FROM cand{r}
      )
    )""")
        parts.append(
            f"p{r} AS (SELECT DISTINCT src, dst, w FROM pk{r}"
            " WHERE rk = 1)"
        )
        parts.append(
            f"f{r} AS ("
            + (
                f"SELECT src, dst, w, {r} AS round_added FROM p{r}"
                if r == 1
                else f"SELECT * FROM f{r - 1} UNION ALL "
                f"SELECT src, dst, w, {r} AS round_added FROM p{r}"
            )
            + ")"
        )
        if r < _MST_ROUNDS:
            # Incremental label merge via pointer doubling over the
            # component-level functional pick graph (one out-pointer per
            # component; every directed pick cycle has length exactly 2
            # under the (w, src, dst) total order — see
            # operators/graph.py boruvka_forest).  pt{r}_K walks every
            # component onto its group's 2-cycle; min(cycle pair) is the
            # group's canonical label.
            parts.append(f"""pt{r}_0 AS MATERIALIZED (
      SELECT base.c AS c, COALESCE(pk.other, base.c) AS p
      FROM (SELECT DISTINCT c FROM lab{r}) base
      LEFT JOIN (SELECT comp, other FROM pk{r} WHERE rk = 1) pk
        ON pk.comp = base.c
    )""")
            for k in range(_MST_PTR_STEPS):
                parts.append(
                    f"pt{r}_{k + 1} AS MATERIALIZED (SELECT a.c, b.p"
                    f" FROM pt{r}_{k} a JOIN pt{r}_{k} b ON b.c = a.p)"
                )
            parts.append(
                f"rt{r} AS (SELECT a.c, LEAST(a.p, b.p) AS root"
                f" FROM pt{r}_{_MST_PTR_STEPS} a"
                f" JOIN pt{r}_0 b ON b.c = a.p)"
            )
            parts.append(
                f"lab{r + 1} AS MATERIALIZED (SELECT l.node, rt.root AS c"
                f" FROM lab{r} l JOIN rt{r} rt ON rt.c = l.c)"
            )
    # Loud bound check: the unrolled pointer-doubling walk covers merge
    # trees of depth <= 2^_MST_PTR_STEPS.  The Spark side derives its
    # doubling depth from the live node count, so at a sweep scale with
    # more active components than the oracle's fixed unroll this would
    # otherwise under-double and fail parity as a confusing hash
    # mismatch — fail with an explicit error instead.
    parts.append(
        "guard AS (SELECT CASE WHEN"
        f" (SELECT COUNT(*) FROM nodes) > {1 << _MST_PTR_STEPS}"
        " THEN error('boruvka oracle: node count exceeds the"
        f" 2^{_MST_PTR_STEPS} pointer-doubling unroll —"
        " raise _MST_PTR_STEPS') ELSE 0 END AS ok)"
    )
    return (
        "WITH\n    "
        + ",\n    ".join(parts)
        + f"\n    SELECT src, dst, w, round_added FROM f{_MST_ROUNDS}"
        + "\n    WHERE (SELECT ok FROM guard) = 0"
    )


@register(
    "graph_boruvka_forest",
    _boruvka_sql(),
    doc="Boruvka minimum-spanning-forest rounds (3, fixed) over the "
    "high-quantity co-supply graph, edge weight = cheapest combined "
    "min-price of a shared part (long cents, the SSSP convention). "
    "Every component adds its (w, src, dst)-minimum outgoing edge per "
    "round — the total order makes simultaneous picks cycle-free and "
    "the forest a pure function of the edges, so the oracle unrolls "
    "the rounds with pointer-doubled pick-graph labels in between "
    "(operators/graph.py boruvka_forest). Scale shape per round: one "
    "label join + one per-component combinable struct-min + log2(C) "
    "component-table self-joins; never an all-pairs step.",
)
def graph_boruvka_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heparchy_spark.operators.graph import boruvka_forest

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    supply = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.round(F.min("l_extendedprice") * 100)
        .cast("long")
        .alias("mn")
    )
    a, b = supply.alias("a"), supply.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.pk") == F.col("b.pk"))
            & (F.col("a.sk") < F.col("b.sk")),
        )
        .groupBy(
            F.col("a.sk").alias("src"), F.col("b.sk").alias("dst")
        )
        .agg(F.min(F.col("a.mn") + F.col("b.mn")).alias("w"))
    )
    return boruvka_forest(e, rounds=_MST_ROUNDS)


# ---------------------------------------------------------------------------
# graph_link_prediction_jaccard — common-neighbor link prediction
# ---------------------------------------------------------------------------


@register(
    "graph_link_prediction_jaccard",
    """
    WITH inc AS (
      SELECT DISTINCT l_partkey AS it, l_suppkey AS nd
      FROM lineitem WHERE l_quantity >= 49
    ),
    deg AS (SELECT nd, COUNT(*) AS d FROM inc GROUP BY nd),
    common AS (
      SELECT a.nd AS src, b.nd AS dst, COUNT(*) AS c
      FROM inc a JOIN inc b ON a.it = b.it AND a.nd < b.nd
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT src, dst, CAST(c AS BIGINT) AS n_common,
             CAST(c AS DOUBLE) / CAST(da.d + db.d - c AS DOUBLE) AS jaccard
      FROM common
      JOIN deg da ON da.nd = src
      JOIN deg db ON db.nd = dst
    )
    SELECT src, dst, n_common, jaccard, CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT src, dst, n_common, jaccard,
             ROW_NUMBER() OVER (ORDER BY jaccard DESC, src, dst) AS rk
      FROM scored
    ) WHERE rk <= 20
    """,
    doc="Jaccard common-neighbor link prediction (Liben-Nowell & "
    "Kleinberg 2003) over the high-quantity co-supply incidence: for "
    "supplier pairs sharing a part, |shared parts| / |union of part "
    "sets|, global top-20 under the (score desc, src, dst) total "
    "order — 'which suppliers will co-supply next'.  Candidate pairs "
    "come from the part-keyed equi-join (LSH-bucket shape, never "
    "all-pairs); counts are exact ints and the score is one int/int "
    "double division, IEEE-identical cross-engine, so the oracle "
    "needs no rounding grid (operators/graph.py "
    "link_prediction_jaccard).",
    expects_global_window="k-row sort-limit frame (top-k rank after TakeOrdered)",
)
def graph_link_prediction_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from heparchy_spark.operators.graph import link_prediction_jaccard

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return link_prediction_jaccard(li, "l_partkey", "l_suppkey", k=20)


@register(
    "graph_degree_assortativity",
    """
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_quantity >= 49
    ), e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM supply a JOIN supply b ON a.l_partkey = b.l_partkey
      WHERE a.l_suppkey < b.l_suppkey
    ), both_dir AS (
      SELECT src, dst FROM e
      UNION ALL SELECT dst AS src, src AS dst FROM e
    ), deg AS (
      SELECT src AS n, COUNT(*) AS d FROM both_dir GROUP BY src
    ), paired AS (
      SELECT dx.d AS x, dy.d AS y
      FROM both_dir b JOIN deg dx ON b.src = dx.n
                      JOIN deg dy ON b.dst = dy.n
    ), sums AS (
      SELECT COUNT(*) AS n_edges,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               AS sxy,
             SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
               AS sxx,
             SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               AS syy
      FROM paired
    )
    SELECT n_edges,
           CASE WHEN CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN ROUND((CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (sqrt(CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * sqrt(CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                           6) + 0.0
                ELSE 0.0 END AS assortativity
    FROM sums
    """,
    doc="Degree assortativity (Newman 2002) of the co-supplier graph: "
    "Pearson r of (deg(u), deg(v)) over the directed edge list (each "
    "undirected edge both ways) — hubs-link-hubs vs hub-and-spoke as "
    "ONE number beside the clustering coefficient.  Degrees are exact "
    "ints, the five moment sums accumulate in DECIMAL(38,0) "
    "(order-free at any edge count), r is one shared double "
    "expression round 6 (+0.0 normalizes IEEE -0.0).  One "
    "map-combinable degree aggregate, two endpoint-keyed joins, one "
    "1-row rollup.  Full SQL oracle.",
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from heparchy_spark.operators.graph import degree_assortativity

    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    supply = li.select("l_partkey", "l_suppkey").distinct()
    a = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src")
    )
    b = supply.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst")
    )
    edges = (
        a.join(b, "pk")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return degree_assortativity(edges)
