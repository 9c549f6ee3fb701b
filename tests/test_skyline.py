"""Skyline operator: toy frontier, dominance ties, brute-force cross-check."""

from __future__ import annotations

from heparchy_spark.operators.skyline import skyline_2d


def _brute(points):
    out = []
    for px, py in points:
        dominated = any(
            qx <= px and qy >= py and (qx < px or qy > py)
            for qx, qy in points
        )
        if not dominated:
            out.append((px, py))
    return sorted(set(out))


def test_toy_frontier(spark):
    pts = [(1.0, 1), (1.0, 5), (2.0, 7), (2.0, 3), (3.0, 7), (4.0, 9),
           (5.0, 2)]
    df = spark.createDataFrame(pts, "x double, y long")
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    # (1,5): cheapest; (2,7): bigger than every cheaper; (3,7) dominated
    # by (2,7); (4,9) biggest overall; rest dominated.
    assert got == [(1.0, 5), (2.0, 7), (4.0, 9)]


def test_all_x_equal_degenerate_bucket(spark):
    pts = [(2.0, 1), (2.0, 9), (2.0, 9), (2.0, 4)]
    df = spark.createDataFrame(pts, "x double, y long")
    got = [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()]
    # equal (x, y) pairs never strictly dominate each other: both survive
    assert got == [(2.0, 9), (2.0, 9)]


def test_matches_bruteforce_random(spark, rng):
    pts = [
        (float(x), int(y))
        for x, y in zip(
            rng.integers(0, 40, 300), rng.integers(0, 40, 300)
        )
    ]
    df = spark.createDataFrame(pts, "x double, y long")
    got = sorted(
        set((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    )
    assert got == _brute(pts)
