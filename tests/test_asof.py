"""asof_join vs pandas merge_asof (the semantics oracle) across directions
and exact-match settings, on randomized grouped data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from heparchy_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 80),
            "t": rng.integers(0, 1000, 80).astype("int64"),
            "lv": rng.normal(size=80),
        }
    ).drop_duplicates(["g", "t"])
    right = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 60),
            "t": rng.integers(0, 1000, 60).astype("int64"),
            "rv": rng.normal(size=60),
        }
    ).drop_duplicates(["g", "t"])
    return (
        left,
        right,
        spark.createDataFrame(left),
        spark.createDataFrame(right),
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_matches_pandas(frames, direction, exact):
    lp, rp, ls, rs = frames
    got = (
        asof_join(
            ls,
            rs,
            on="t",
            by="g",
            right_cols={"rv": "rv"},
            direction=direction,
            allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values(["g", "t"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            lp.sort_values("t"),
            rp.sort_values("t"),
            on="t",
            by="g",
            direction=direction,
            allow_exact_matches=exact,
        )
        .sort_values(["g", "t"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for (_, g), (_, w) in zip(got.iterrows(), want.iterrows()):
        assert g["g"] == w["g"] and g["t"] == w["t"]
        if pd.isna(w["rv"]):
            assert pd.isna(g["rv"])
        else:
            assert g["rv"] == pytest.approx(w["rv"])


def test_asof_bad_direction(frames):
    _, _, ls, rs = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(ls, rs, on="t", by="g", right_cols={"rv": "rv"}, direction="sideways")


def test_asof_null_right_payload_matches_pandas(spark):
    # A NULL in the matched right row must come through as NULL — not be
    # substituted by an older right row's value (pandas merge_asof
    # semantics; regression for the per-column last(ignorenulls) bug).
    lp = pd.DataFrame({"g": [1, 1, 1], "t": [10, 20, 30], "lv": [1.0, 2.0, 3.0]})
    rp = pd.DataFrame(
        {
            "g": [1, 1, 1],
            "t": [5, 15, 25],
            "rv": [100.0, None, 300.0],
            "rw": [None, 200.0, None],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            on="t",
            by="g",
            right_cols={"rv": "rv", "rw": "rw"},
        )
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(lp, rp, on="t", by="g").sort_values("t").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "t", "lv", "rv", "rw"]].astype({"g": "int64"}),
        want[["g", "t", "lv", "rv", "rw"]].astype({"g": "int64"}),
        check_dtype=False,
    )
    # the matched row at t=15 carries rv=NULL, rw=200 — both fields from
    # THAT row, not a blend of rows
    row20 = got[got["t"] == 20].iloc[0]
    assert pd.isna(row20["rv"]) and row20["rw"] == 200.0
