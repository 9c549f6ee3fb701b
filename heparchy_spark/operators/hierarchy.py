"""Event-generation DAG reachability over the hep-store ``edges`` table.

The reference stores each event's generation graph as COO (src, dst)
vertex pairs (``/root/reference/heparchy/write/hdf.py:291-299``) and a
``signal_pdgs`` process attribute (``write/hdf.py:461-466``) precisely
so users can build decay-chain masks downstream (the graphicle
workflow: particles align 1:1 with edges, so "edges reachable from a
vertex" IS the descendant-particle mask).  This operator runs that
reachability INSIDE the engine, across every event at once.

Plan shape: frontier BFS where the frontier is a DataFrame keyed by
(process, event_id, vertex) — each round is one equi-join against the
edges table (same key partitioning reused every round) plus a distinct.
Rounds = DAG depth (generator shower depth, tens); every round is
map-side work over co-partitioned keys, no driver state beyond the
fixpoint counter.  Events parallelize freely — the 100 TB shape for
per-event graph queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_KEYS = ["process", "event_id"]


def descendant_edges(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 64,
) -> DataFrame:
    """Edges reachable from per-event seed vertices, following the
    generation arrows (src -> dst).

    ``edges``: the store's edges frame (process, event_id, edge_idx,
    src, dst, ...).  ``seeds``: (process, event_id, vertex) — e.g. the
    decay vertex of each event's hardest signal particle.  Returns
    (process, event_id, edge_idx, src, dst) for every edge on a
    descendant path — joined back to ``particles`` by position
    (edge_idx == particle row index, the COO alignment) this is the
    reference's signal-descendants mask.

    Raises ``RuntimeError`` if the frontier is still growing after
    ``max_iter`` rounds (a cyclic "DAG" would otherwise loop silently).
    """
    e = edges.select(*_KEYS, "edge_idx", "src", "dst")
    reached = (
        seeds.select(*_KEYS, F.col("vertex").alias("__v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = reached
    for _ in range(max_iter):
        # fresh attribute ids on the frontier side: after round 1 the
        # frontier itself descends from a join with ``e``, so unrenamed
        # columns would be ambiguous against ``e``'s
        f = frontier.select(
            F.col("process").alias("__fp"),
            F.col("event_id").alias("__fe"),
            "__v",
        )
        step = (
            f.join(
                e,
                on=[
                    f["__fp"] == e["process"],
                    f["__fe"] == e["event_id"],
                    f["__v"] == e["src"],
                ],
            )
            .select("process", "event_id", F.col("dst").alias("__v"))
            .distinct()
        )
        new_frontier = step.join(
            reached, on=[*_KEYS, "__v"], how="anti"
        ).localCheckpoint(eager=True)
        if new_frontier.limit(1).count() == 0:
            break
        reached = reached.unionByName(new_frontier).localCheckpoint(
            eager=True
        )
        frontier = new_frontier
    else:
        raise RuntimeError(
            f"descendant_edges: frontier still growing after {max_iter} "
            "rounds — cyclic graph or pathological depth; raise max_iter"
        )
    return e.join(
        reached.withColumnRenamed("__v", "src"),
        on=[*_KEYS, "src"],
        how="semi",
    ).select(*_KEYS, "edge_idx", "src", "dst")


def hardest_signal_seeds(
    particles: DataFrame,
    edges: DataFrame,
    signal_pdgs: list[int],
) -> DataFrame:
    """(process, event_id, vertex): per event, the decay vertex (edge
    ``dst``) of the highest-energy particle whose |pdg| is in
    ``signal_pdgs`` — the canonical seed for a signal-descendants mask.
    Particles align with edges by row position (COO convention)."""
    cand = (
        particles.where(
            F.abs(F.col("pdg")).isin([abs(p) for p in signal_pdgs])
        )
        .groupBy(*_KEYS)
        .agg(
            F.max(F.struct(F.col("e"), F.col("pcl_idx"))).alias("__best")
        )
        .select(*_KEYS, F.col("__best.pcl_idx").alias("idx"))
    )
    return cand.join(
        edges.select(*_KEYS, F.col("edge_idx").alias("idx"), "dst"),
        on=[*_KEYS, "idx"],
    ).select(*_KEYS, F.col("dst").alias("vertex"))
