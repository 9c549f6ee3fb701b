"""Grid DBSCAN: neighbor counts vs brute force, eps boundary
inclusion, core-cluster labels on a planted two-cluster layout."""

from __future__ import annotations

from heparchy_spark.operators.density import (
    dbscan_core_clusters,
    neighbor_counts,
)


def test_neighbor_counts_match_bruteforce(spark, rng):
    pts = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(
            zip(rng.uniform(0, 10, 200), rng.uniform(0, 10, 200))
        )
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {
        r.id: r.n_neighbors
        for r in neighbor_counts(df, "id", "x", "y", 1.5, 4).collect()
    }
    for i, xi, yi in pts:
        want = sum(
            1
            for _, xj, yj in pts
            if (xj - xi) ** 2 + (yj - yi) ** 2 <= 1.5 * 1.5
        )
        assert got[i] == want


def test_eps_boundary_is_inclusive_and_self_counts(spark):
    # two points exactly eps apart across a CELL boundary, plus a loner
    pts = [(1, 0.9, 0.0), (2, 1.9, 0.0), (3, 50.0, 50.0)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {
        r.id: (r.n_neighbors, r.is_core)
        for r in neighbor_counts(df, "id", "x", "y", 1.0, 2).collect()
    }
    assert got[1] == (2, True)  # self + the boundary point
    assert got[2] == (2, True)
    assert got[3] == (1, False)


def test_two_planted_clusters(spark):
    left = [(i, 0.0 + 0.1 * i, 0.0) for i in range(5)]
    right = [(10 + i, 100.0 + 0.1 * i, 0.0) for i in range(5)]
    noise = [(99, 50.0, 50.0)]
    df = spark.createDataFrame(
        left + right + noise, "id long, x double, y double"
    )
    out = dbscan_core_clusters(df, "id", "x", "y", eps=1.0, min_pts=3)
    got = {r.id: r.cluster for r in out.collect()}
    assert 99 not in got  # noise: no 3-point neighborhood
    assert {got[i] for i, _, _ in left} == {0}
    assert {got[i] for i, _, _ in right} == {10}
