"""DAG reachability over the hep-store edges: hand-built decay chains
vs a plain-Python BFS, cycle detection, and the signal-seed helper."""

from __future__ import annotations

import pyspark.sql.functions as F


def _edges_df(spark, rows):
    # rows: (event_id, edge_idx, src, dst)
    return spark.createDataFrame(
        [("p", ev, i, s, d) for ev, i, s, d in rows],
        "process string, event_id long, edge_idx int, src int, dst int",
    )


def _brute(rows, ev, seeds):
    adj = {}
    for e, i, s, d in rows:
        if e == ev:
            adj.setdefault(s, []).append((i, d))
    seen, out, stack = set(seeds), set(), list(seeds)
    while stack:
        v = stack.pop()
        for i, d in adj.get(v, []):
            out.add(i)
            if d not in seen:
                seen.add(d)
                stack.append(d)
    return out


def test_descendants_match_bruteforce(spark, rng):
    from heparchy_spark.operators.hierarchy import descendant_edges

    rows = []
    for ev in range(3):
        # random DAG on vertices -1..-30: edges only from higher to lower
        for i in range(40):
            a, b = sorted(rng.integers(1, 31, 2).tolist(), reverse=False)
            if a == b:
                b = a + 1
            rows.append((ev, i, -a, -b))
    edges = _edges_df(spark, rows)
    seeds = spark.createDataFrame(
        [("p", 0, -1), ("p", 1, -2), ("p", 2, -1)],
        "process string, event_id long, vertex int",
    )
    got = {}
    for r in descendant_edges(edges, seeds).collect():
        got.setdefault(r.event_id, set()).add(r.edge_idx)
    for ev, sv in [(0, -1), (1, -2), (2, -1)]:
        assert got.get(ev, set()) == _brute(rows, ev, {sv})


def test_deep_chain_and_isolation_between_events(spark):
    from heparchy_spark.operators.hierarchy import descendant_edges

    chain = [(0, i, -(i + 1), -(i + 2)) for i in range(30)]
    other = [(1, 0, -1, -2)]
    edges = _edges_df(spark, chain + other)
    seeds = spark.createDataFrame(
        [("p", 0, -1)], "process string, event_id long, vertex int"
    )
    got = sorted(
        r.edge_idx for r in descendant_edges(edges, seeds).collect()
    )
    assert got == list(range(30))  # full chain, nothing from event 1


def test_cycle_raises(spark):
    from heparchy_spark.operators.hierarchy import descendant_edges

    edges = _edges_df(spark, [(0, 0, -1, -2), (0, 1, -2, -1)])
    seeds = spark.createDataFrame(
        [("p", 0, -1)], "process string, event_id long, vertex int"
    )
    import pytest

    with pytest.raises(RuntimeError, match="frontier still growing"):
        descendant_edges(edges, seeds, max_iter=1)


def test_hardest_signal_seeds(spark):
    from heparchy_spark.operators.hierarchy import hardest_signal_seeds

    pcls = spark.createDataFrame(
        [
            ("p", 0, 0, 10.0, 25),
            ("p", 0, 1, 90.0, 6),   # hardest signal (|pdg| in set)
            ("p", 0, 2, 99.0, 21),  # harder but not signal
        ],
        "process string, event_id long, pcl_idx int, e double, pdg int",
    )
    edges = spark.createDataFrame(
        [("p", 0, 0, -1, -2), ("p", 0, 1, -2, -3), ("p", 0, 2, -3, -4)],
        "process string, event_id long, edge_idx int, src int, dst int",
    )
    got = hardest_signal_seeds(pcls, edges, signal_pdgs=[6, -6]).collect()
    assert [(r.event_id, r.vertex) for r in got] == [(0, -3)]
