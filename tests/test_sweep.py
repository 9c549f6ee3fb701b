"""Distributed prefix sum: exactness vs serial scan, bucket seams,
degenerate ranges, interval concurrency semantics."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from heparchy_spark.operators.sweep import interval_concurrency, prefix_sum


def test_prefix_sum_matches_serial(spark, rng):
    keys = rng.permutation(500).tolist()
    vals = rng.integers(-5, 10, 500).tolist()
    rows = [(int(k), int(v)) for k, v in zip(keys, vals)]
    df = spark.createDataFrame(rows, "o long, v long")
    got = {
        r.o: r.v_cum
        for r in prefix_sum(df, "o", ["v"], n_buckets=7).collect()
    }
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc


def test_prefix_sum_multi_column_and_single_bucket(spark):
    rows = [(1, 1, 10), (2, 2, 20), (3, 3, 30)]
    df = spark.createDataFrame(rows, "o long, a long, b long")
    out = {
        r.o: (r.a_cum, r.b_cum)
        for r in prefix_sum(df, "o", ["a", "b"], n_buckets=64).collect()
    }
    assert out == {1: (1, 10), 2: (3, 30), 3: (6, 60)}


def test_prefix_sum_all_equal_order_range(spark):
    # lo == hi (single distinct key) must not divide by zero
    df = spark.createDataFrame([(7, 3)], "o long, v long")
    assert prefix_sum(df, "o", ["v"]).collect()[0].v_cum == 3


def test_interval_concurrency_half_open(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    # [0,10) [5,15) [10,20): at t=10 the first closes as the third opens
    rows = [(ts(0), ts(10)), (ts(5), ts(15)), (ts(10), ts(20))]
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    got = {
        r.t: r.concurrent
        for r in interval_concurrency(df, "s", "e").collect()
    }
    assert got[ts(0)] == 1
    assert got[ts(5)] == 2
    assert got[ts(10)] == 2  # -1 and +1 net at the seam
    assert got[ts(15)] == 1
    assert got[ts(20)] == 0


def test_interval_concurrency_never_single_partition_window(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "s timestamp, e timestamp",
    )
    plan = (
        interval_concurrency(df, "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every unbounded Window must be over __b (bucketed, parallel) —
    # except the one on the |buckets|-row offsets table, which shows up
    # partitioned by nothing but reads a bounded aggregate
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            continue
    sums = [ln for ln in plan.splitlines() if "Window " in ln]
    assert any("__b" in ln for ln in sums)


def test_grouped_prefix_sum_matches_serial(spark, rng):
    # several groups with different sizes, ranges, and duplicate-free keys
    rows = []
    for gi, size in enumerate([1, 3, 40, 200]):
        keys = (rng.permutation(size * 3)[:size] + gi * 10000).tolist()
        vals = rng.integers(-5, 10, size).tolist()
        rows += [(f"g{gi}", int(k), int(v)) for k, v in zip(keys, vals)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = {
        (r.g, r.o): r.v_cum
        for r in prefix_sum(
            df, "o", ["v"], n_buckets=7, partition_cols=["g"]
        ).collect()
    }
    assert len(got) == len(rows)
    by_g: dict[str, list] = {}
    for g, k, v in rows:
        by_g.setdefault(g, []).append((k, v))
    for g, kv in by_g.items():
        acc = 0
        for k, v in sorted(kv):
            acc += v
            assert got[(g, k)] == acc


def test_grouped_prefix_sum_groups_are_independent(spark):
    # same key values in two groups must not bleed into each other
    rows = [("a", 1, 10), ("a", 2, 100), ("b", 1, 7), ("b", 2, 70)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    out = {
        (r.g, r.o): r.v_cum
        for r in prefix_sum(
            df, "o", ["v"], partition_cols=["g"]
        ).collect()
    }
    assert out == {
        ("a", 1): 10,
        ("a", 2): 110,
        ("b", 1): 7,
        ("b", 2): 77,
    }
