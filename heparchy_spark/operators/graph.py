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

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from heparchy_spark.plans.barrier import checkpoint_stats_barrier

__all__ = [
    "pagerank",
    "personalized_pagerank",
    "boruvka_forest",
    "triangle_counts",
    "kcore",
    "label_propagation",
    "bfs_hops",
    "link_prediction_jaccard",
    "SCALE",
]

SCALE = 10**12  # fixed-point unit: 1 rank = SCALE ticks

# Per-round score/degree frames are |V|-sized; when |V| is broadcastable
# the edge frame (the BIG side — checkpointed, so its partitioning
# metadata is gone and a shuffle join would re-exchange it EVERY round)
# never shuffles at all: the iteration becomes cached-scan + broadcast
# build + one combinable contribution shuffle.  Measured at sf0.1
# (1.18M edges, 21k nodes): ~30-40% off PageRank/HITS wall-clock,
# bit-identical trajectories.  Above the threshold (a 100 TB graph's
# |V| won't broadcast) the operators keep plain shuffle joins.
_BROADCAST_NODES_MAX = 1_000_000


def _score_side(n_nodes: int):
    """broadcast() wrapper for |V|-sized per-round frames, identity when
    the node set is too big to broadcast."""
    if n_nodes <= _BROADCAST_NODES_MAX:
        return F.broadcast
    return lambda df: df


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    damping_pct: int = 85,
    iters: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list: (node, rank) with
    ``rank`` = int64 ticks / 1e12 cast to double at the end.

    Scale shape per iteration: on the broadcast-rank path the
    contribution sum needs NO shuffle — the edge list persists once
    hash-partitioned by ``__dst`` (``persist``, not ``localCheckpoint``:
    InMemoryRelation keeps the cached plan's outputPartitioning, an
    ExistingRDD scan does not), so the ``groupBy`` on the aliased
    destination key is satisfied by the cached partitioning and the
    partial aggregate combines fully (all rows of a key co-located; the
    old unpartitioned layout degraded to ~E shuffled rows per round at
    10x, shuffle exponent 1.34).  That leaves one N-sized join back to
    the node set per round; out-degrees compute once.  Ranks
    ``localCheckpoint`` each round so lineage stays one iteration deep
    (same rationale as ``connected_components``).  Dangling nodes follow the standard
    simplification — contribute nothing, keep receiving teleport mass.

    ``damping_pct`` is an integer percentage so the damping step is
    ``(pct * s) div 100`` — exact on every engine.  Fixed ``iters``
    keeps the output a pure function of the input (oracle-replayable);
    8 rounds at d=0.85 is stable to ~1e-3, plenty for centrality use.

    The returned DataFrame is persisted; callers ``unpersist()`` once
    consumed — same contract as ``connected_components``.  Superseded
    iteration checkpoints are RDD-level storage that ``Dataset.unpersist``
    cannot release (localCheckpoint blocks are not in the CacheManager);
    they are reclaimed by the ContextCleaner once the driver drops the
    references, which the loop does each round — at most two snapshots
    are strongly referenced at any time.
    """
    from pyspark import StorageLevel

    # Materialize the edge list once, hash-partitioned by destination
    # (see docstring): each per-round checkpoint job reads the cache
    # instead of re-running the at-rest source scan.
    e = (
        edges.select(
            F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
        )
        .repartition("__dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
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
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        )
    # Out-degrees are loop-invariant; materialize once instead of
    # re-aggregating inside every per-round checkpoint job.
    deg = (
        e.groupBy("__src")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .localCheckpoint(eager=True)
    )
    base = (SCALE * (100 - damping_pct)) // 100 // n  # teleport ticks
    wrap = _score_side(n)
    # No per-round node fill-in (the HITS pattern): the rank of a node
    # ABSENT from the round's dst-sum table is exactly
    # ``base + (damping * 0) div 100``, so the rank expression is
    # FOLDED into the next round's contribution via a left join and
    # coalesce instead of materializing an N-row rank frame and joining
    # it back to the node set every round — bit-identical trajectory
    # (same integer expression, evaluated per edge source instead of
    # per node), 8 fewer N-sized joins, and the per-round state shrinks
    # to the reached destination set.  Zeros/danglers are restored once
    # on the final output.
    rank_expr = (
        f"{base}L + ({damping_pct} * coalesce(__s, 0L)) div 100"
    )
    contribs = None  # None = the exact uniform first-round ranks
    for _ in range(iters):
        if contribs is None:
            esrc = e.join(wrap(deg), "__src")
            contrib = F.expr(f"{SCALE // n}L div __deg")
        else:
            esrc = e.join(
                wrap(contribs), e["__src"] == contribs["node"], "left"
            ).join(wrap(deg), "__src")
            contrib = F.expr(f"({rank_expr}) div __deg")
        contribs = (
            esrc.select(
                F.col("__dst").alias("node"), contrib.alias("__c")
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
            # Lazy: all rounds materialize inside the single final
            # persist job, each round's rows cached as computed (the
            # HITS pattern — bit-identical ranks).  Dropping the old
            # reference lets the ContextCleaner reclaim the superseded
            # checkpoint's RDD blocks.
            .localCheckpoint(eager=False)
        )
    out = (
        nodes.join(contribs, "node", "left")
        .select(
            "node",
            (
                F.expr(rank_expr).cast("double") / F.lit(float(SCALE))
            ).alias("rank"),
        )
        .persist()
    )
    out.count()
    # all per-round checkpoints are materialized by the count above;
    # the partitioned edge cache is dead weight from here on
    e.unpersist()
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    ``edges`` must be canonical: (src, dst) distinct with src < dst, no
    self-loops.  Returns (node, n_triangles) for every node in at least
    one triangle.

    Degree-ordered orientation (the MapReduce-era standard — Suri &
    Vassilvitskii 2011): direct every edge from its (degree, id)-smaller
    endpoint to the larger, enumerate wedges only at each edge's apex,
    and close them against the canonical edge set.  Each triangle is
    generated exactly once, and the wedge count is bounded by
    O(m^{3/2}) regardless of degree skew — a hub of degree d generates
    no wedges unless its NEIGHBORS have higher rank, which at most
    sqrt(m) of them can.  Both the wedge step and the closing step are
    equi-joins; nothing quadratic in the node count.

    Per-node counts are orientation-independent, so an oracle may
    verify with the naive a<b<c triple join.
    """
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        edges.join(deg.withColumnsRenamed({"node": "src", "deg": "ds"}), "src")
        .join(deg.withColumnsRenamed({"node": "dst", "deg": "dd"}), "dst")
        .select(
            F.when(
                (F.col("ds") < F.col("dd"))
                | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
                F.struct(F.col("src").alias("lo"), F.col("dst").alias("hi")),
            )
            .otherwise(
                F.struct(F.col("dst").alias("lo"), F.col("src").alias("hi"))
            )
            .alias("e")
        )
        .select(F.col("e.lo").alias("u"), F.col("e.hi").alias("v"))
    )
    w1 = ranked.select(F.col("u").alias("apex"), F.col("v").alias("x"))
    w2 = ranked.select(F.col("u").alias("apex"), F.col("v").alias("y"))
    wedges = w1.join(w2, "apex").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        edges,
        (F.least("x", "y") == F.col("src"))
        & (F.greatest("x", "y") == F.col("dst")),
    ).select("apex", "x", "y")
    members = (
        closed.select(F.col("apex").alias("node"))
        .unionAll(closed.select(F.col("x").alias("node")))
        .unionAll(closed.select(F.col("y").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def kcore(edges: DataFrame, k: int, max_iters: int = 50) -> DataFrame:
    """The k-core of an undirected graph: iteratively peel nodes of
    degree < k until none remain.  Returns (node, degree) for the
    surviving subgraph (its degrees within the core).

    ``edges`` must be canonical (src < dst, distinct).  The core is
    unique, so peeling order doesn't matter — each round drops ALL
    currently-weak nodes at once (the parallel variant), which converges
    in the same fixpoint in O(peel depth) rounds.

    Scale shape per round: one degree aggregate (combinable) + two
    anti-joins against the weak-node set (node-sized, usually
    broadcast; AQE decides).  ``localCheckpoint`` caps lineage exactly
    like pagerank's iteration; the per-round driver check is a bounded
    scalar count.  Peel depth is typically tiny (single digits) on
    real graphs — the loop bound is a runaway guard, not a tuning knob.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iters):
        deg = (
            e.select(F.col("src").alias("node"))
            .unionAll(e.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        weak = deg.where(F.col("degree") < k).select("node")
        if weak.count() == 0:
            return deg
        e = (
            e.join(weak.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(weak.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        if e.isEmpty():
            return deg.where(F.lit(False))
    raise RuntimeError(f"k-core did not converge in {max_iters} rounds")


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007): every node starts with its own id as label; each round,
    every node adopts the most frequent label among its neighbours.
    Returns (node, community) after ``iters`` fixed rounds.

    Determinism: the classic algorithm breaks frequency ties randomly
    and updates asynchronously — both unreproducible.  This is the
    deterministic parallel form: ALL nodes update simultaneously from
    the previous round's labels, and the argmax tie-break is total
    (vote count desc, then label asc), so the trajectory is a pure
    function of the edge set and an oracle can replay it round by round
    (the unrolled-CTE pattern ``pagerank`` established).  Synchronous
    LPA can oscillate between two colourings on bipartite-ish structure
    instead of converging — a fixed ``iters`` makes the output
    well-defined either way, and community quality at 4 rounds is the
    method's published behaviour (labels stabilize in a handful of
    sweeps on real graphs).

    Scale shape per round: propagate labels across edges (one join on
    the neighbour key — broadcast while |V| fits), then count votes per
    (node, label) and take the bounded per-node argmax window — BOTH
    shuffle-free: the doubled edge list persists once hash-partitioned
    by ``src`` (``persist``, not ``localCheckpoint``: InMemoryRelation
    keeps the cached plan's outputPartitioning), which satisfies the
    clustered distribution of the (node, label) aggregate AND the
    window's partitionBy(node), so neither inserts an exchange and the
    vote partial-aggregate combines fully.  Labels ``localCheckpoint``
    each round so lineage stays one round deep.  ``edges`` must be
    canonical undirected (src < dst, distinct); both directions are
    derived here so every endpoint votes.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    e = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    wrap = _score_side(labels.count())
    w = Window.partitionBy("node").orderBy(
        F.desc("votes"), F.asc("label")
    )
    for _ in range(iters):
        votes = (
            e.join(wrap(labels.withColumnRenamed("node", "dst")), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    # every round is eagerly checkpointed above; the partitioned edge
    # cache is dead weight from here on
    e.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = 85,
    iters: int = 6,
) -> DataFrame:
    """Personalized PageRank: the teleport mass lands ONLY on ``seeds``
    (single-column ``node`` frame), so ranks measure proximity to the
    seed set — the standard graph feature for recommendation /
    related-entity queries.  Same fixed-point int64 contract as
    :func:`pagerank` (ticks of 1e-12, integer quotients, fixed rounds,
    oracle-replayable as unrolled CTEs).

    The rank table stays SPARSE: nodes the walk has not reached are
    absent (= exactly 0 ticks, since a 0-rank node contributes nothing
    and receives no teleport), so per-round state is bounded by the
    reached set, not the node set — the property that makes seeded
    ranking cheap on a 100 TB graph where |reached| << |V|.  Per round:
    one contribution shuffle + one full-outer join against the bounded
    seed-base frame; lazy checkpoints truncate lineage (the HITS
    pattern).
    """
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).localCheckpoint(eager=True)
    deg = (
        e.groupBy("__src")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .localCheckpoint(eager=True)
    )
    seedb = seeds.select("node").localCheckpoint(eager=True)
    k = seedb.count()
    if k == 0:
        return seedb.select(
            "node", F.lit(0.0).alias("rank")
        )
    # The broadcast frames are `deg` (one row per distinct source) and
    # `ranks` (the reached set).  Reached is bounded by seeds ∪
    # destination nodes — NOT by the source count: on a fan-out graph a
    # few sources reach unboundedly many dst-only sinks, so sizing the
    # decision from deg alone risks broadcasting an arbitrarily larger
    # frame every round.  Take the max of both bounds; above the
    # threshold fall back to shuffle joins for both sides.
    n_src = deg.count()
    n_reach_max = k + e.select("__dst").distinct().count()
    wrap = _score_side(max(n_src, n_reach_max))
    base = (SCALE * (100 - damping_pct)) // 100 // k
    ranks = seedb.select(
        "node", F.lit(SCALE // k).cast("long").alias("__r")
    )
    for _ in range(iters):
        contribs = (
            e.join(wrap(ranks), e["__src"] == ranks["node"])
            .join(wrap(deg), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr("__r div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            contribs.join(
                seedb.withColumn("__b", F.lit(base).cast("long")),
                "node",
                "full",
            )
            .select(
                "node",
                (
                    F.coalesce("__b", F.lit(0))
                    + F.expr(
                        f"({damping_pct} * coalesce(__s, 0L)) div 100"
                    )
                ).cast("long").alias("__r"),
            )
            .localCheckpoint(eager=False)
        )
    out = ranks.select(
        "node",
        (F.col("__r").cast("double") / F.lit(float(SCALE))).alias("rank"),
    ).persist()
    out.count()
    return out


def boruvka_forest(
    edges: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """Boruvka minimum-spanning-forest rounds over an undirected weighted
    edge list (``src < dst``, LONG weights): each round, every component
    adds its minimum outgoing edge under the TOTAL order (w, src, dst),
    then components merge.  The total-order tie-break makes simultaneous
    picks cycle-free and the whole forest a pure function of the edge
    set, so a SQL oracle replays the rounds verbatim.

    Fixed ``rounds`` caps work the way the corpus' BFS/SSSP round limits
    do — components at least halve per round, so r rounds span any
    component of <= 2^r nodes; the function stops early (value-identical)
    once no cross-component edge remains.

    Labels are merged INCREMENTALLY from the picked edges — never by
    re-running a connected-components fixpoint over the whole forest.
    Per round, each component's pick induces a FUNCTIONAL graph on
    component ids (one out-edge per component: its pick's partner).
    Under the (w, src, dst) total order every directed pick cycle has
    length exactly 2 (a longer cycle c1->c2->..->ck->c1 would need
    strictly decreasing pick edges all the way around), so each merge
    group is a tree hanging off one 2-cycle.  Pointer DOUBLING
    (p <- p∘p, ceil(log2(C)) steps on the C-row component table) walks
    every component onto its group's 2-cycle, and min(cycle pair) is the
    group's canonical label.  The output (src, dst, w, round_added)
    depends only on the PARTITION the labels induce — true components
    either way — so the rewrite is value-identical to the old
    fixpoint-per-round form (pytest asserts the hash).

    Scale shape per round: one label join + one <=2x-edges union + one
    per-component min aggregate (map-side combinable struct min), then
    log2(C) tiny self-joins on the component table (C at least halves
    per round).  No step touches more than the edge list once.
    """
    e = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    labels = nodes.select("node", F.col("node").alias("component"))
    forest = None
    for r in range(1, rounds + 1):
        lu = labels.select(
            F.col("node").alias("src"), F.col("component").alias("lu")
        )
        lv = labels.select(
            F.col("node").alias("dst"), F.col("component").alias("lv")
        )
        cand = (
            e.join(lu, "src")
            .join(lv, "dst")
            .where(F.col("lu") != F.col("lv"))
        )
        # Union of two swapped projections, NOT a 2-way struct explode:
        # the r11 interleaved A/B (sf0.1, two session pairs) measured the
        # explode variant 1.5-2.2x slower wall on this loop (10.3/7.3 s
        # vs 4.7/5.5 s) and the r10 10x rehearsal recorded 10.9 -> 49.0 s
        # with it; the union's two branches reuse the candidate join's
        # exchange and run as parallel stages, which beats the single
        # serial Generate pipeline at every measured scale.
        both = cand.select(
            F.col("lu").alias("comp"),
            F.col("lv").alias("other"),
            "w",
            "src",
            "dst",
        ).union(
            cand.select(
                F.col("lv").alias("comp"),
                F.col("lu").alias("other"),
                "w",
                "src",
                "dst",
            )
        )
        # Each comp's unique (w, src, dst)-min candidate; `other` rides
        # along (the edge key is already unique) as the merge partner.
        pick_full = checkpoint_stats_barrier(
            both.groupBy("comp").agg(
                F.min(F.struct("w", "src", "dst", "other")).alias("m")
            )
        )
        picks = checkpoint_stats_barrier(
            pick_full.select("m.src", "m.dst", "m.w")
            .distinct()
            .withColumn("round_added", F.lit(r))
        )
        n_new = picks.count()
        # picks frames are already checkpointed, so the union lineage
        # stays shallow without re-materializing the forest per round.
        forest = picks if forest is None else forest.unionByName(picks)
        if n_new == 0:
            break
        if r == rounds:
            break
        # Incremental merge: pointer-double the component-level pick
        # pointers, then canonicalize to min of the terminal 2-cycle.
        # Merge-tree depth is bounded by the component count at round
        # start, which at least halves per round.
        doubling_steps = max(
            1, math.ceil(math.log2(max(2, n_nodes >> (r - 1))))
        )
        ptr0 = (
            labels.select(F.col("component").alias("c"))
            .distinct()
            .join(
                pick_full.select(
                    F.col("comp").alias("c"), F.col("m.other").alias("p")
                ),
                "c",
                "left",
            )
            .select("c", F.coalesce("p", "c").alias("p"))
        )
        ptr0 = checkpoint_stats_barrier(ptr0, eager=False)
        ptr = ptr0
        for _ in range(doubling_steps):
            nxt = ptr.alias("a").join(
                ptr.alias("b"), F.col("a.p") == F.col("b.c")
            ).select(F.col("a.c").alias("c"), F.col("b.p").alias("p"))
            ptr = checkpoint_stats_barrier(nxt, eager=False)
        canon = (
            ptr.alias("a")
            .join(ptr0.alias("b"), F.col("a.p") == F.col("b.c"))
            .select(
                F.col("a.c").alias("c"),
                F.least(F.col("a.p"), F.col("b.p")).alias("root"),
            )
        )
        labels = checkpoint_stats_barrier(
            labels.join(canon, labels["component"] == canon["c"])
            .select("node", F.col("root").alias("component"))
        )
    return forest


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
) -> DataFrame:
    """Minimal hop distance from a source set over an undirected graph
    (Pregel-style frontier BFS): returns (node, hops) for every node
    reached within ``max_hops``; unreached nodes are absent.

    ``edges`` must be canonical (src < dst, distinct); ``sources`` is a
    single-column (node) frame.  Hop distances are unique minima, so
    the result is a pure function of (edges, sources, max_hops) —
    frontier scheduling cannot change it, and a SQL oracle replays the
    levels as unrolled CTEs (extra unrolled levels past the true
    eccentricity are empty no-ops).

    Scale shape per level: one equi-join frontier->neighbors, a
    distinct (combinable), and an anti-join against the visited set;
    ``localCheckpoint`` caps lineage like the other iterative graph
    operators, and the per-level driver check is a bounded emptiness
    probe.  Frontier size is bounded by the node set; no level touches
    more than the graph's edges once.
    """
    e = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    visited = (
        sources.select("node")
        .distinct()
        .select("node", F.lit(0).alias("hops"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(h).alias("hops"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def hits(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 6,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) over a directed edge list:
    (node, hub_score, authority_score), scores = int64 ticks / 1e12.

    Fixed-point integer trajectory, like :func:`pagerank`: each round
    sums int64 ticks on the destination key (authority step) then the
    source key (hub step), and normalizes by the INTEGER quotient
    ``ticks div (max_ticks div SCALE)`` instead of the usual L2 norm —
    every operation is exact integer arithmetic, so the whole trajectory
    is a pure function of the edge set and an oracle can replay it as
    unrolled SQL CTEs.  The quotient normalization keeps scores in
    [0, ~SCALE] with relative error <= SCALE/max_ticks per round
    (~1e-4 at realistic fan-in), well under the 1e-3 the centrality use
    cares about.

    Scale shape per iteration: ZERO shuffles on the broadcast-score
    path — the edge list is materialized twice up-front, hash-
    partitioned by ``__dst`` (authority half) and ``__src`` (hub half),
    so each half-round's sum groups on its side's partitioning key and
    the exchange is elided entirely (the partial aggregate also
    combines fully, since every occurrence of a key is co-located);
    the two single-row max quotients ride as broadcast joins — no
    driver collect, no per-round node-set join (zero-score nodes are
    restored once on the final output).  The copies must be ``persist``
    (InMemoryRelation keeps the cached plan's outputPartitioning);
    ``localCheckpoint`` would scan as an ExistingRDD with UNKNOWN
    partitioning and re-insert the per-round exchange — measured at 10x
    this was ~E shuffled rows per half-round (map-side combine degrades
    to nothing once keys/partition ~ 1), shuffle exponent 1.39.
    ``localCheckpoint`` per round still caps lineage exactly as in
    ``pagerank``.  Overflow bound: max fan-in * 2*SCALE < 2^63 -> fan-in
    < ~4.6e6; beyond that drop SCALE a decade.
    """
    from pyspark import StorageLevel

    # Two partitioned, persisted edge copies (see docstring); e_src is
    # derived FROM e_dst's cache so the at-rest source scans once.
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    e_dst = e.repartition("__dst").persist(StorageLevel.MEMORY_AND_DISK)
    e_src = e_dst.repartition("__src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    nodes = (
        e_src.select(F.col("__src").alias("node"))
        .union(e_src.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0.0).alias("hub_score"),
            F.lit(0.0).alias("authority_score"),
        )
    wrap = _score_side(n_nodes)
    # The per-round state is carried as (raw integer sums, scalar
    # quotient) and the normalization division is FOLDED into the next
    # half-round's contribution expression (per-row ``__s div __q``
    # BEFORE the sum — integer division does not distribute over
    # addition, so the fold point matters for bit-exactness).  The old
    # form materialized a separate normalized frame per half-round;
    # folding removes that map stage + cache write while every score in
    # the trajectory stays identical (the power-iteration rewrite's
    # pattern, operators/similarity.py).
    #
    # No per-round node fill-in: a node ABSENT from the score table
    # flows through the inner e-join and the sums exactly like a
    # zero-score row (contributes nothing; all-absent groups vanish
    # instead of summing to 0, which normalizes to the same 0), so
    # the trajectory is unchanged while 2*iters node-keyed shuffle
    # joins disappear — zeros are restored ONCE on the final output
    # (values asserted identical; ~20% wall-clock at sf0.1).
    qexpr = F.expr(f"greatest(max(__s) div {SCALE}, 1L)").alias("__q")
    hraw = nodes.select(
        "node", F.lit(SCALE).cast("long").alias("__s")
    )
    hq = None  # first-round hub scores are exact: no quotient to apply
    araw = aq = None
    for _ in range(iters):
        # authority half: sum normalized hub scores over in-edges; the
        # hub normalization rides the contribution expression.  Lazy
        # checkpoint: the quotient's broadcast sub-job materializes the
        # raw sums before the next main stage reads them.
        contrib_h = (
            F.expr("__s div __q") if hq is not None else F.col("__s")
        )
        pairs_h = e_dst.join(wrap(hraw), e_dst["__src"] == hraw["node"])
        if hq is not None:
            pairs_h = pairs_h.join(F.broadcast(hq))
        araw = (
            pairs_h.select(F.col("__dst"), contrib_h.alias("__c"))
            .groupBy("__dst")
            .agg(F.sum("__c").alias("__s"))
            .select(F.col("__dst").alias("node"), "__s")
            .localCheckpoint(eager=False)
        )
        aq = araw.agg(qexpr)
        # hub half: same fold with the fresh authority quotient
        hraw = (
            e_src.join(wrap(araw), e_src["__dst"] == araw["node"])
            .join(F.broadcast(aq))
            .select(F.col("__src"), F.expr("__s div __q").alias("__c"))
            .groupBy("__src")
            .agg(F.sum("__c").alias("__s"))
            .select(F.col("__src").alias("node"), "__s")
            .localCheckpoint(eager=False)
        )
        hq = hraw.agg(qexpr)
    h = hraw.join(F.broadcast(hq)).select(
        "node", F.expr("__s div __q").alias("__h")
    )
    a = araw.join(F.broadcast(aq)).select(
        "node", F.expr("__s div __q").alias("__a")
    )
    out = (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            (
                F.coalesce("__h", F.lit(0)).cast("double")
                / F.lit(float(SCALE))
            ).alias("hub_score"),
            (
                F.coalesce("__a", F.lit(0)).cast("double")
                / F.lit(float(SCALE))
            ).alias("authority_score"),
        )
        .persist()
    )
    out.count()
    # every per-round checkpoint is materialized by the count above;
    # the partitioned edge caches are dead weight from here on
    e_dst.unpersist()
    e_src.unpersist()
    return out


def sssp(edges: DataFrame, sources: DataFrame, iters: int = 4) -> DataFrame:
    """Multi-source weighted shortest paths by min-plus (Bellman-Ford)
    relaxation: ``edges`` carries (src, dst, w) with LONG weights,
    ``sources`` a single-column (node) seed set; returns (node, dist)
    for every node reachable within ``iters`` relaxations (others are
    absent, like :func:`bfs_hops`).

    Integer min-plus is exact and associative, so the distance table is
    a pure function of (edges, sources, iters) — relaxation scheduling
    cannot change it, and a SQL oracle replays the rounds as unrolled
    CTEs.  Scale shape per round: ONE equi-join frontier-relaxation
    (all current distances against the edge list on the source key) and
    one combinable min-aggregate; the edge list materializes once, and
    per-round lazy checkpoints truncate lineage at first compute (the
    HITS pattern).  For diameter-bounded graphs ``iters`` caps both
    work and result staleness the way any Pregel SSSP round limit does.
    """
    e = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    # `dist` (the broadcast side) holds every REACHED node — bounded by
    # sources ∪ destination nodes, not by the distinct-source count (a
    # fan-out graph reaches many dst-only sinks), so size the broadcast
    # decision from that union.
    n_reach_max = (
        sources.select("node").distinct().count()
        + e.select("dst").distinct().count()
    )
    wrap = _score_side(n_reach_max)
    dist = sources.select(
        "node", F.lit(0).cast("long").alias("dist")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        relax = e.join(wrap(dist), e["src"] == dist["node"]).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def link_prediction_jaccard(
    bipartite: DataFrame,
    item_col: str,
    node_col: str,
    k: int = 20,
) -> DataFrame:
    """Jaccard-coefficient link prediction over a bipartite incidence
    list (item, node): for every node pair sharing at least one item,
    score = |items(a) n items(b)| / |items(a) u items(b)|, and keep the
    global top-``k`` under the (score desc, src, dst) total order.
    This is the classic common-neighbors predictor (Liben-Nowell &
    Kleinberg 2003) — "suppliers likely to co-supply next".

    Determinism: intersection and degree counts are exact integers and
    the score is ONE double division of two exact ints — IEEE-identical
    on every engine, so a SQL oracle reproduces the ranking bit-for-bit
    with no rounding grid.

    Scale shape: candidate pairs come from the item-keyed equi-join
    (the LSH-bucket shape — pairs are generated per shared item, never
    all-pairs), one combinable count per pair, degrees from one
    map-side count, and the global top-k is a distributed sort-limit
    (TakeOrderedAndProject — per-partition top-k then a k-row merge,
    never a global row_number window over |candidate-pairs| rows; the
    r10 gate measured Spark 4.1 does NOT insert WindowGroupLimit for
    the rank-then-filter form, so the sort-limit is explicit) followed
    by a rank over the k surviving rows.  A hot item with d nodes fans
    out d^2/2 pairs — cap or salt upstream if item degrees are skewed
    (same contract as the dedup pair generators).
    """
    from pyspark.sql import Window

    inc = bipartite.select(
        F.col(item_col).alias("__it"), F.col(node_col).alias("__nd")
    ).distinct()
    deg = inc.groupBy("__nd").agg(F.count(F.lit(1)).alias("__deg"))
    a, b = inc.alias("a"), inc.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.__it") == F.col("b.__it"))
            & (F.col("a.__nd") < F.col("b.__nd")),
        )
        .groupBy(
            F.col("a.__nd").alias("src"), F.col("b.__nd").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    scored = (
        common.join(deg.withColumnsRenamed({"__nd": "src", "__deg": "__da"}), "src")
        .join(deg.withColumnsRenamed({"__nd": "dst", "__deg": "__db"}), "dst")
        .select(
            "src",
            "dst",
            F.col("__common").cast("long").alias("n_common"),
            (
                F.col("__common").cast("double")
                / (F.col("__da") + F.col("__db") - F.col("__common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    # distributed top-k first (TakeOrderedAndProject), THEN the rank
    # window — which now sorts k rows, not |candidate-pairs| rows
    top = scored.orderBy(
        F.desc("jaccard"), F.asc("src"), F.asc("dst")
    ).limit(k)
    w = Window.orderBy(F.desc("jaccard"), F.asc("src"), F.asc("dst"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("src", "dst", "n_common", "jaccard", F.col("rank").cast("long").alias("rank"))
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity of an undirected graph (Newman 2002): the
    Pearson correlation of (deg(u), deg(v)) over the DIRECTED edge list
    (each undirected edge counted both ways — the standard convention,
    making the two marginals identical).  Positive r = hubs link hubs
    (social cores), negative = hub-and-spoke (infrastructure); the
    one-number structural health check beside the clustering
    coefficient.

    Determinism: degrees are exact integers, so the five moment sums
    accumulate in DECIMAL(38,0) (order-free, overflow-safe at any edge
    count); r is ONE shared double expression over their double casts —
    identical literal algebra in the SQL oracle, round 6.  Scale shape:
    one degree aggregate (map-combinable), two degree joins shuffled on
    the endpoint keys, one global 1-row aggregate.

    Input must already be the deduplicated src < dst undirected form.
    """
    # Both directions from ONE pass over the edge subtree (a union of
    # swapped projections would re-run the upstream pipeline per branch
    # — and `both` is referenced twice below, doubling that again).
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias(src), F.col(dst).alias(dst)),
                F.struct(F.col(dst).alias(src), F.col(src).alias(dst)),
            )
        ).alias("__e")
    ).select(f"__e.{src}", f"__e.{dst}")
    deg = both.groupBy(F.col(src).alias("__n")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    paired = (
        both.join(deg.withColumnRenamed("__n", src), src)
        .withColumnRenamed("__deg", "__dx")
        .join(
            deg.select(
                F.col("__n").alias(dst), F.col("__deg").alias("__dy")
            ),
            dst,
        )
    )
    dec = "decimal(38,0)"
    sums = paired.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.col("__dx").cast(dec)).alias("__sx"),
        F.sum(F.col("__dy").cast(dec)).alias("__sy"),
        # cast each degree BEFORE multiplying: the decimal product is
        # exact at any degree, where an int64 pre-cast product would
        # silently wrap above ~3.04e9 (and diverge from the oracle)
        F.sum(F.col("__dx").cast(dec) * F.col("__dy").cast(dec)).alias(
            "__sxy"
        ),
        F.sum(F.col("__dx").cast(dec) * F.col("__dx").cast(dec)).alias(
            "__sxx"
        ),
        F.sum(F.col("__dy").cast(dec) * F.col("__dy").cast(dec)).alias(
            "__syy"
        ),
    )
    n = F.col("n_edges").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    r = F.when(
        (var_x > 0) & (var_y > 0),
        F.round(
            (n * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)), 6
        )
        + 0.0,
    ).otherwise(F.lit(0.0))
    return sums.select("n_edges", r.alias("assortativity"))
