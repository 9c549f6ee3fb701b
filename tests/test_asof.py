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
