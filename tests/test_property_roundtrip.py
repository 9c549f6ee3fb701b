"""Hypothesis property tests for the store round-trip (SURVEY.md §5.1):
arbitrary event shapes — including zero-particle events, single events,
varied chunk factors — must survive write->read with exact equality."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from heparchy_spark.sources import HepReader, HepWriter


@st.composite
def event_batches(draw):
    n_events = draw(st.integers(min_value=1, max_value=6))
    epc = draw(st.sampled_from([1, 2, 1000]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    events = []
    for _ in range(n_events):
        n = int(draw(st.integers(min_value=0, max_value=12)))
        events.append(
            {
                "pdg": rng.integers(-1000, 1000, n).astype("int32"),
                "status": rng.integers(-30, 30, n).astype("int16"),
                "mask": rng.random(n) < 0.5,
            }
        )
    return events, epc


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=event_batches())
def test_roundtrip_any_shape(spark, tmp_path_factory, batch):
    events, epc = batch
    root = tmp_path_factory.mktemp("prop") / "s"
    with HepWriter(spark, root, evts_per_chunk=epc) as w:
        with w.new_process("p") as proc:
            for evt_w, d in proc.event_iter(events):
                evt_w.pdg = d["pdg"]
                evt_w.status = d["status"]
                evt_w.masks["m"] = d["mask"]
    with HepReader(spark, root) as r:
        proc = r["p"]
        assert len(proc) == len(events)
        for i, d in enumerate(events):
            evt = proc[i]
            assert evt.count == len(d["pdg"])
            np.testing.assert_array_equal(evt.pdg, d["pdg"])
            np.testing.assert_array_equal(evt.status, d["status"])
            np.testing.assert_array_equal(evt.masks["m"], d["mask"])
