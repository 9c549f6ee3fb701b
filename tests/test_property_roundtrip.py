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


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(
            alphabet="ab c",  # tiny alphabet -> heavy token collisions
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    ),
    chunk=st.integers(min_value=2, max_value=7),
    overlap=st.integers(min_value=0, max_value=3),
)
def test_chunking_reconstruction_property(spark, docs, chunk, overlap):
    """For ANY corpus and (chunk, overlap) sizing: dropping each chunk's
    overlap prefix (except chunk 0) and concatenating in chunk order
    restores each document's exact token stream; token counts add up."""
    from hypothesis import assume

    from heparchy_spark.operators.text import chunk_documents

    assume(overlap < chunk)
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out = chunk_documents(df, "text", "doc_id", chunk, overlap)
    rows = sorted(
        out.collect(), key=lambda r: (r.doc_id, r.chunk_idx)
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, text in enumerate(docs):
        toks = [t for t in text.split() if t]
        chunks = by_doc.get(did, [])
        if not toks:
            assert chunks == []
            continue
        rebuilt: list[str] = []
        for i, r in enumerate(chunks):
            assert r.chunk_idx == i
            ctoks = r.chunk_text.split(" ")
            assert r.n_tokens == len(ctoks)
            # subset-chunk suppression: every non-initial chunk must add
            # tokens beyond the overlap it shares with its predecessor
            if i > 0:
                assert len(ctoks) > overlap
            rebuilt.extend(ctoks if i == 0 else ctoks[overlap:])
        assert rebuilt == toks, (did, chunks)


def test_kcore_invariant_all_degrees_at_least_k(spark):
    """k-core postcondition on the corpus graph: every surviving node
    has in-core degree >= k."""
    import pyspark.sql.functions as F

    from heparchy_spark.operators.graph import kcore
    from heparchy_spark.queries.tables import load

    li = load(spark, "/root/testdata/sf0.001", "lineitem").where(
        F.col("l_quantity") >= 45
    )
    supply = li.select("l_partkey", "l_suppkey").distinct()
    a = supply.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("src"))
    b = supply.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("dst"))
    edges = (
        a.join(b, "pk").where(F.col("src") < F.col("dst"))
        .select("src", "dst").distinct()
    )
    for k in (3, 6):
        core = kcore(edges, k).collect()
        assert all(r.degree >= k for r in core), k


def test_merge_snapshot_idempotent(spark):
    """MERGE postconditions: merging a table with itself is the identity,
    and re-applying the same update batch is idempotent."""
    import pyspark.sql.functions as F

    from heparchy_spark.operators.upsert import merge_snapshot
    from heparchy_spark.queries.tables import load

    orders = (
        load(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(200)
    )
    self_merge = merge_snapshot(orders, orders, ["o_orderkey"])
    assert sorted(map(tuple, self_merge.select(*orders.columns).collect())) \
        == sorted(map(tuple, orders.collect()))
    upd = orders.limit(50).withColumn(
        "o_orderpriority", F.lit("1-URGENT")
    )
    once = merge_snapshot(orders, upd, ["o_orderkey"])
    twice = merge_snapshot(once, upd, ["o_orderkey"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )
