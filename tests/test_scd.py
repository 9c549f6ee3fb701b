"""SCD Type-2 build: run-length collapse, NULL-safe change detection,
versioning, current-row flag."""

from __future__ import annotations

import datetime as dt

from heparchy_spark.operators.scd import scd2_build


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_runs_collapse_and_versions(spark):
    rows = [
        (1, "a", _ts(0), 10),
        (1, "a", _ts(1), 11),  # unchanged: collapses into v1
        (1, "b", _ts(2), 12),
        (1, "a", _ts(3), 13),  # back to 'a': NEW run, not merged with v1
        (2, "x", _ts(0), 14),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, id long")
    out = scd2_build(df, "k", ["attr"], "ts", "id")
    got = {
        (r.k, r.version): (r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got[(1, 1)] == ("a", _ts(0), _ts(2), False)
    assert got[(1, 2)] == ("b", _ts(2), _ts(3), False)
    assert got[(1, 3)] == ("a", _ts(3), None, True)
    assert got[(2, 1)] == ("x", _ts(0), None, True)
    assert len(got) == 4


def test_null_transitions_are_changes(spark):
    rows = [
        (1, None, _ts(0), 1),
        (1, "a", _ts(1), 2),
        (1, None, _ts(2), 3),
        (1, None, _ts(3), 4),  # still NULL: no change
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, id long")
    out = scd2_build(df, "k", ["attr"], "ts", "id").collect()
    assert [r.attr for r in sorted(out, key=lambda r: r.version)] == [
        None,
        "a",
        None,
    ]


def test_timestamp_tie_broken_by_id(spark):
    rows = [(1, "b", _ts(0), 2), (1, "a", _ts(0), 1)]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, id long")
    out = sorted(
        scd2_build(df, "k", ["attr"], "ts", "id").collect(),
        key=lambda r: r.version,
    )
    assert [r.attr for r in out] == ["a", "b"]
    assert out[1].is_current
