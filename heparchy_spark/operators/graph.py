"""Graph operators beyond connected components — iterative numeric
fixpoints (PageRank).

Connected components (`operators/dedup.py`) iterates on integer labels;
PageRank iterates on real numbers, where per-node contribution sums
depend on float aggregation order AND decimal-cast rounding modes differ
between engines (HALF_UP vs HALF_EVEN on non-grid addends — measured as
a 2e-10 systematic drift per iteration).  The robust fix is FIXED-POINT
arithmetic: ranks live as int64 in units of 1e-12, every update is
integer division and integer sums — exactly reproducible on any engine,
so a SQL oracle can replay the full trajectory bit-for-bit.  The
floor-division mass loss (< 1e-12 per edge per iteration) is orders of
magnitude below PageRank's own convergence tolerance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["pagerank", "SCALE"]

SCALE = 10**12  # fixed-point unit: 1 rank = SCALE ticks


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    damping_pct: int = 85,
    iters: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list: (node, rank) with
    ``rank`` = int64 ticks / 1e12 cast to double at the end.

    Scale shape per iteration: one shuffle summing contributions on the
    destination key (map-side combinable longs) plus one join back to
    the node set; out-degrees compute once.  Ranks ``localCheckpoint``
    each round so lineage stays one iteration deep (same rationale as
    ``connected_components``).  Dangling nodes follow the standard
    simplification — contribute nothing, keep receiving teleport mass.

    ``damping_pct`` is an integer percentage so the damping step is
    ``(pct * s) div 100`` — exact on every engine.  Fixed ``iters``
    keeps the output a pure function of the input (oracle-replayable);
    8 rounds at d=0.85 is stable to ~1e-3, plenty for centrality use.

    The returned DataFrame is persisted (the iteration checkpoints are
    released before returning); callers ``unpersist()`` once consumed —
    same contract as ``connected_components``.
    """
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # Empty edge list (e.g. an upstream filter matched nothing):
        # return an empty (node, rank) frame instead of dividing by zero.
        nodes.unpersist()
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        )
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    base = (SCALE * (100 - damping_pct)) // 100 // n  # teleport ticks
    ranks = nodes.select(
        "node", F.lit(SCALE // n).cast("long").alias("__r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contribs = (
            e.join(ranks, e["__src"] == ranks["node"])
            .join(deg, "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr("__r div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(__s, 0L)) div 100"
                    )
                ).cast("long").alias("__r"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select(
        "node", (F.col("__r").cast("double") / F.lit(float(SCALE))).alias("rank")
    ).persist()
    out.count()
    nodes.unpersist()
    ranks.unpersist()
    return out
