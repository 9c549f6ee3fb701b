"""Structured Streaming tests: each streaming op must agree with its batch
twin on the same data, run as a real streaming query (file source, multiple
micro-batches via maxFilesPerTrigger, memory/parquet sinks)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from heparchy_spark.queries.tables import load
from heparchy_spark.streaming import (
    dedup_within_watermark,
    read_event_stream,
    running_user_totals,
    sessionize,
    stream_to_store,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """Stage sf0.001 events as two arrival files → two+ micro-batches."""
    d = tmp_path_factory.mktemp("landing")
    ev = load(spark, SF_DIR, "events")
    half = ev.count() // 2
    ev.where(F.col("event_id") < half).coalesce(1).write.parquet(str(d / "b0"))
    ev.where(F.col("event_id") >= half).coalesce(1).write.parquet(str(d / "b1"))
    # flatten: file source wants a flat dir of files
    flat = tmp_path_factory.mktemp("flat")
    i = 0
    for sub in sorted(d.iterdir()):
        for f in sorted(sub.glob("*.parquet")):
            f.rename(flat / f"part-{i:03d}.parquet")
            i += 1
    return str(flat)


def _run_to_memory(stream_df, name: str, mode: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_ingest_to_store(spark, landing, tmp_path):
    """event_iter analog: landing files -> incremental partitioned append."""
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")
    q = stream_to_store(
        stream.withColumn("day", F.to_date("ts")),
        dest,
        ckpt,
        partition_by=["day"],
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(dest)
    want = load(spark, SF_DIR, "events")
    assert got.count() == want.count()
    assert set(got.columns) == set(want.columns) | {"day"}


def test_tumbling_counts_matches_batch(spark, landing):
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(tumbling_counts(stream), "t_tumbling", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from t_tumbling").collect()
    }
    batch = tumbling_counts(load(spark, SF_DIR, "events"))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def test_sessionize_matches_batch(spark, landing):
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(sessionize(stream, gap="30 minutes"), "t_sessions", "complete")
    got = spark.sql("select * from t_sessions")
    batch = sessionize(load(spark, SF_DIR, "events"), gap="30 minutes")
    assert got.count() == batch.count()
    g = got.agg(F.sum("n_events")).first()[0]
    b = batch.agg(F.sum("n_events")).first()[0]
    assert g == b


def test_dedup_within_watermark_stream(spark, tmp_path):
    ev = load(spark, SF_DIR, "events").limit(200)
    dup_dir = str(tmp_path / "dup")
    ev.union(ev).coalesce(1).write.parquet(dup_dir)
    stream = read_event_stream(spark, dup_dir)
    out = dedup_within_watermark(stream, keys=["event_id"], watermark="1 hour")
    _run_to_memory(out, "t_dedup", "append")
    assert spark.sql("select * from t_dedup").count() == 200


def test_running_user_totals_stateful(spark, landing):
    """applyInPandasWithState across micro-batches: the last update per user
    must equal the batch per-user totals."""
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(running_user_totals(stream), "t_running", "update")
    # update mode appends one row per user per batch; last row wins
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("select * from t_running").collect()
        # rows arrive in batch order; dict update keeps the last
    }
    want = {
        r["user_id"]: (r["n"], r["total"])
        for r in load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def test_stream_stream_join_matches_batch(spark, landing):
    """Stream-stream inner join with watermarks on both sides must produce
    the batch join's rows once all data is processed."""
    from heparchy_spark.streaming import purchase_view_join

    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    out = purchase_view_join(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        watermark="1 hour",
        horizon="2 hours",
    )
    _run_to_memory(out, "t_ssjoin", "append")
    got = {
        (r["user_id"], r["view_ts"], r["purchase_ts"])
        for r in spark.sql("select * from t_ssjoin").collect()
    }
    ev = load(spark, SF_DIR, "events")
    want = {
        (r["user_id"], r["view_ts"], r["purchase_ts"])
        for r in purchase_view_join(
            ev.where(F.col("event_type") == "view"),
            ev.where(F.col("event_type") == "purchase"),
            watermark=None,
            horizon="2 hours",
        ).collect()
    }
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: an event older than the watermark horizon,
    arriving in a later micro-batch, must be EXCLUDED from append-mode
    windowed aggregation output. Two sequential checkpointed runs guarantee
    the late row arrives after the watermark advanced (the checkpoint
    persists the watermark between runs)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    rows_b0 = [
        (1, base + dt.timedelta(minutes=m), 7, "view", 1.0, "{}")
        for m in (0, 10, 20)
    ] + [(2, base + dt.timedelta(hours=6), 7, "view", 1.0, "{}")]
    rows_b1 = [
        (3, base + dt.timedelta(hours=6, minutes=10), 7, "view", 1.0, "{}"),
        (4, base + dt.timedelta(minutes=30), 7, "view", 1.0, "{}"),  # late 5.5h
    ]

    land = tmp_path / "land"
    land.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def stage(rows, name):
        tmp = tmp_path / (name + ".d")
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(str(tmp))
        i = len(list(land.glob("*.parquet")))
        for f in sorted(tmp.glob("*.parquet")):
            f.rename(land / f"part-{i:03d}.parquet")
            i += 1

    def run_once():
        stream = read_event_stream(spark, str(land))
        agg = tumbling_counts(stream, window="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    stage(rows_b0, "b0")
    run_once()  # watermark advances to 6:00 - 1h = 5:00 in the checkpoint
    stage(rows_b1, "b1")
    run_once()  # late event (0:30 < 5:00) must be dropped on entry

    out = {
        r["window_start"].hour: r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    # hour-0 window finalized with ONLY the 3 on-time events; event 4 dropped
    assert out.get(0) == 3


def test_stream_dedup_ingest(spark, tmp_path):
    """Dedup-at-ingest: duplicate content across micro-batches is dropped;
    only first-seen rows reach the store."""
    from heparchy_spark.streaming.ingest import stream_dedup_ingest

    land = tmp_path / "land"
    land.mkdir()
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema
    )
    b1 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma"), (6, "gamma")], schema
    )
    b0.coalesce(1).write.parquet(str(tmp_path / "s0"))
    b1.coalesce(1).write.parquet(str(tmp_path / "s1"))
    i = 0
    for sub in ("s0", "s1"):
        for f in sorted((tmp_path / sub).glob("*.parquet")):
            f.rename(land / f"part-{i:03d}.parquet")
            i += 1

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    q = stream_dedup_ingest(
        stream,
        "text",
        "doc_id",
        str(tmp_path / "dest"),
        str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    out = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(str(tmp_path / "dest")).collect()
    }
    # first id per content wins; cross-batch duplicate (beta) dropped
    assert out == {(1, "alpha"), (2, "beta"), (5, "gamma")}
    hashes = spark.read.parquet(str(tmp_path / "dest") + "_hashes")
    assert hashes.distinct().count() == 3


def test_streaming_count_min_matches_batch_sketch(spark, landing):
    """The Count-Min build run as a real streaming aggregation over 2+
    micro-batches must land on the exact counters of the batch sketch —
    sketch state is bounded (d*w) and merges by summing."""
    from heparchy_spark.streaming import read_event_stream, streaming_count_min

    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    sk = streaming_count_min(stream, "user_id", width=1 << 12, depth=3)
    _run_to_memory(sk, "cm_sketch", "complete")
    got = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in spark.sql("select * from cm_sketch").collect()
    }
    batch = streaming_count_min(
        load(spark, SF_DIR, "events"), "user_id", width=1 << 12, depth=3
    )
    want = {
        (r["row_idx"], r["col_idx"]): r["cnt"] for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_stream_corpus_pipeline_matches_batch_twin(spark, tmp_path):
    """The full streaming corpus pipeline (gates -> dedup-at-ingest ->
    sharded append) over multiple micro-batches must land exactly the
    documents the batch-computed twin selects, in the same shards —
    including cross-batch duplicate suppression."""
    from heparchy_spark.streaming import corpus_gates, stream_corpus_pipeline

    docs = load(spark, SF_DIR, "documents")
    # two arrival files; the second re-delivers some of the first's docs
    # under new ids (cross-batch dups) plus genuinely new docs
    half = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)
    redelivered = half.limit(40).withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    landing = tmp_path / "landing"
    half.coalesce(1).write.parquet(str(landing / "b0"))
    rest.unionByName(redelivered).coalesce(1).write.parquet(str(landing / "b1"))
    flat = tmp_path / "flat"
    flat.mkdir()
    i = 0
    for sub in sorted(landing.iterdir()):
        for f in sorted(sub.glob("*.parquet")):
            f.rename(flat / f"part-{i:03d}.parquet")
            i += 1

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    dest, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    q = stream_corpus_pipeline(
        stream, "text", "doc_id", dest, ckpt,
        min_quality=0.5, langs=("en", "de"), n_shards=4,
        trigger_available_now=True,
    )
    q.awaitTermination(180)

    got = spark.read.parquet(dest)
    # batch twin: same gates, first-id-wins exact dedup over ALL docs
    twin = corpus_gates(
        docs.unionByName(redelivered), "text",
        min_quality=0.5, langs=("en", "de"), n_shards=4,
    )
    w_ch = F.sha2(F.col("text"), 256)
    from pyspark.sql import Window as W

    twin_dedup = (
        twin.withColumn("__ch", w_ch)
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("__ch").orderBy("doc_id")
            ),
        )
        .where(F.col("__rn") == 1)
    )
    got_set = {
        (r["doc_id"], r["shard"]) for r in got.select("doc_id", "shard").collect()
    }
    want_set = {
        (r["doc_id"], r["shard"])
        for r in twin_dedup.select("doc_id", "shard").collect()
    }
    assert got_set == want_set and len(want_set) > 100
    # redelivered duplicates were suppressed
    assert not any(d >= 100_000 for d, _ in got_set)


def test_streaming_funnel_matches_batch(spark, landing):
    """Per-user funnel state machine across micro-batches: the final
    update row per user must equal the batch strict-order funnel (the
    landing fixture arrives in event-time order)."""
    from heparchy_spark.operators.funnel import funnel_reach
    from heparchy_spark.streaming import read_event_stream, streaming_funnel

    steps = ["view", "click", "purchase"]
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(streaming_funnel(stream, steps), "t_funnel", "update")
    got = {
        r["user_id"]: (r["stage_reached"], r["reached_ts"])
        for r in spark.sql("select * from t_funnel").collect()
        # update-mode rows arrive in batch order; dict keeps the last
    }
    ev = load(spark, SF_DIR, "events")
    reach = funnel_reach(ev, "user_id", "ts", "event_type", steps)
    want: dict[int, tuple[int, object]] = {
        r["user_id"]: (0, None) for r in ev.select("user_id").distinct().collect()
    }
    for k, frame in enumerate(reach, start=1):
        for r in frame.collect():
            want[r["__u"]] = (k, r["__t"])
    assert set(got) == set(want)
    for u, (stage, t) in want.items():
        assert got[u][0] == stage, u
        if stage:
            assert got[u][1] == t, u


def test_streaming_scd2_matches_batch(spark, landing):
    """Per-user SCD2 run tracker across micro-batches: the latest row per
    (user, run_idx) must reconstruct exactly the batch scd2_history
    intervals, including the open current run."""
    from heparchy_spark.operators.upsert import scd2_history
    from heparchy_spark.streaming import read_event_stream, streaming_scd2

    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(streaming_scd2(stream), "t_scd2", "update")
    got: dict[tuple, tuple] = {}
    for r in spark.sql("select * from t_scd2").collect():
        # update-mode rows arrive in batch order; last write per run wins
        got[(r["user_id"], r["run_idx"])] = (
            r["attr"], r["valid_from"], r["valid_to"], r["n_events"]
        )
    ev = load(spark, SF_DIR, "events")
    batch = scd2_history(ev, "user_id", "event_type", "ts", tiebreak_col="event_id")
    want: dict[tuple, tuple] = {}
    runs: dict[int, int] = {}
    for r in sorted(batch.collect(), key=lambda r: (r["user_id"], r["valid_from"])):
        k = runs.get(r["user_id"], 0)
        runs[r["user_id"]] = k + 1
        want[(r["user_id"], k)] = (
            r["event_type"], r["valid_from"], r["valid_to"], r["n_events"]
        )
    assert got == want


def test_windowed_token_counts_matches_batch(spark, tmp_path):
    """Streaming per-window wordcount over a document stream (two arrival
    files -> two+ micro-batches, complete mode) must equal the batch
    twin on the same data."""
    import pyspark.sql.functions as F

    from heparchy_spark.streaming import windowed_token_counts

    docs = load(spark, SF_DIR, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id") * 600
        ).alias("ts"),
    )
    half = docs.count() // 2
    d = tmp_path / "doclanding"
    docs.where(F.col("doc_id") < half).coalesce(1).write.parquet(
        str(d / "b0")
    )
    docs.where(F.col("doc_id") >= half).coalesce(1).write.parquet(
        str(d / "b1")
    )
    flat = tmp_path / "docflat"
    flat.mkdir()
    i = 0
    for sub in sorted(d.iterdir()):
        for f in sorted(sub.glob("*.parquet")):
            f.rename(flat / f"part-{i:03d}.parquet")
            i += 1
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    _run_to_memory(
        windowed_token_counts(stream, "text", "ts"), "t_trending", "complete"
    )
    got = {
        (r["window_start"], r["token"]): r["n"]
        for r in spark.sql("select * from t_trending").collect()
    }
    want = {
        (r["window_start"], r["token"]): r["n"]
        for r in windowed_token_counts(
            docs, "text", "ts", watermark=None
        ).collect()
    }
    assert got == want


def test_streaming_hll_ledger_matches_batch(spark, landing):
    """The HLL register aggregate is mergeable state, so the SAME
    expression runs as a streaming complete-mode aggregation — the final
    ledger (and its engine-side estimate) must equal the batch ledger."""
    from heparchy_spark.operators.sketch import (
        hll_estimate_df,
        hll_registers,
    )
    from heparchy_spark.streaming import read_event_stream

    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(
        hll_registers(stream, F.col("user_id")), "t_hll", "complete"
    )
    got = {
        (r["register_idx"], r["max_rank"])
        for r in spark.sql("select * from t_hll").collect()
    }
    batch = hll_registers(load(spark, SF_DIR, "events"), F.col("user_id"))
    want = {(r["register_idx"], r["max_rank"]) for r in batch.collect()}
    assert got == want
    est_stream = hll_estimate_df(
        spark.sql("select register_idx, max_rank from t_hll")
    ).collect()[0].est_distinct
    est_batch = hll_estimate_df(batch).collect()[0].est_distinct
    assert est_stream == est_batch


def test_stream_stream_left_outer_join_matches_batch(spark, landing):
    """Left-outer stream-stream join: abandoned views (no purchase within
    the horizon) must null-extend once the watermark proves no match can
    arrive. Outer results trail the watermark, so the comparison is
    restricted to views old enough that eviction has provably fired
    (max_ts - watermark - horizon - 1h slack); the batch twin gets the
    same cutoff."""
    from datetime import timedelta

    from heparchy_spark.streaming import purchase_view_join

    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    out = purchase_view_join(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        watermark="1 hour",
        horizon="2 hours",
        how="left_outer",
    )
    _run_to_memory(out, "t_ssloj", "append")

    ev = load(spark, SF_DIR, "events")
    cutoff = ev.agg(F.max("ts")).first()[0] - timedelta(hours=4)

    def keyset(rows):
        return {
            (r["user_id"], r["view_ts"], r["purchase_ts"])
            for r in rows
            if r["view_ts"] <= cutoff
        }

    got = keyset(spark.sql("select * from t_ssloj").collect())
    want = keyset(
        purchase_view_join(
            ev.where(F.col("event_type") == "view"),
            ev.where(F.col("event_type") == "purchase"),
            watermark=None,
            horizon="2 hours",
            how="left_outer",
        ).collect()
    )
    assert got == want
    # the outer semantics were actually exercised: unmatched views exist
    assert any(p is None for (_, _, p) in got)
    # and matched rows ride along identically
    assert any(p is not None for (_, _, p) in got)

    with pytest.raises(ValueError):
        purchase_view_join(ev, ev, how="full_outer")



def test_stream_corpus_pipeline_txn_exactly_once(spark, tmp_path):
    """Transactional corpus pipeline: gates -> cross-corpus dedup ->
    atomic snapshot commits; matches the batch twin, and a checkpointed
    re-run commits nothing new."""
    from heparchy_spark.sources.snapshot import SnapshotTable
    from heparchy_spark.streaming import corpus_gates
    from heparchy_spark.streaming.pipeline import stream_corpus_pipeline_txn

    docs = load(spark, SF_DIR, "documents")
    half = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)
    redelivered = half.limit(40).withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, part in enumerate([half, rest.unionByName(redelivered)]):
        sub = tmp_path / f"b{i}"
        part.coalesce(1).write.parquet(str(sub))
        for j, f in enumerate(sorted(sub.glob("*.parquet"))):
            f.rename(flat / f"part-{i}{j}.parquet")

    def run_once(tbl):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(flat))
        )
        q = stream_corpus_pipeline_txn(
            stream, "text", "doc_id", tbl, str(tmp_path / "ckpt"),
            min_quality=0.5, langs=("en", "de"), n_shards=4,
        )
        q.awaitTermination(180)

    table = SnapshotTable(spark, tmp_path / "corpus_tbl")
    run_once(table)

    got_set = {
        (r["doc_id"], r["shard"])
        for r in table.read().select("doc_id", "shard").collect()
    }
    twin = corpus_gates(
        docs.unionByName(redelivered), "text",
        min_quality=0.5, langs=("en", "de"), n_shards=4,
    ).withColumn("__ch", F.sha2(F.col("text"), 256))
    from pyspark.sql import Window as W

    twin_dedup = twin.withColumn(
        "__rn", F.row_number().over(W.partitionBy("__ch").orderBy("doc_id"))
    ).where(F.col("__rn") == 1)
    want_set = {
        (r["doc_id"], r["shard"])
        for r in twin_dedup.select("doc_id", "shard").collect()
    }
    assert got_set == want_set and len(want_set) > 100
    assert not any(d >= 100_000 for d, _ in got_set)  # dups suppressed
    # every micro-batch landed as an atomic append with its batch token
    vers = table.versions()
    assert {v["operation"] for v in vers} == {"append"}
    assert table.latest_batch_id() == len(vers) - 1

    # checkpointed re-run: engine replays nothing, table unchanged
    n_before = len(vers)
    run_once(table)
    assert len(table.versions()) == n_before
    assert {
        (r["doc_id"], r["shard"])
        for r in table.read().select("doc_id", "shard").collect()
    } == want_set


def test_txn_pipeline_classifier_batch_gate(spark, tmp_path):
    """Model-based gating composes with exactly-once ingest: a logistic
    quality classifier trained on a labeled seed corpus scores each
    micro-batch inside foreachBatch (batch_gate_fn), only keep=True
    docs land in the snapshot table, and every batch still banks its
    batch-id token."""
    from heparchy_spark.operators.classifier import (
        hashed_features,
        logreg_score,
        logreg_train,
    )
    from heparchy_spark.sources.snapshot import SnapshotTable
    from heparchy_spark.streaming.pipeline import stream_corpus_pipeline_txn

    seed = spark.createDataFrame(
        [
            (0, "good clean helpful prose", 1),
            (1, "good careful writing good", 1),
            (2, "good good good content here", 1),
            (3, "spam junk garbage words", 0),
            (4, "junk spam noise spam", 0),
            (5, "garbage noise junk filler", 0),
        ],
        "doc_id long, text string, y int",
    )
    weights = logreg_train(
        hashed_features(seed, "text", "doc_id", n_buckets=16),
        seed.select("doc_id", "y"),
        n_buckets=16, iters=8, lr_pct=900,
    )

    def gate(batch):
        feats = hashed_features(batch, "text", "doc_id", n_buckets=16)
        keep = logreg_score(feats, weights).where(F.col("keep")).select(
            "doc_id"
        )
        return batch.join(keep, "doc_id")

    incoming = spark.createDataFrame(
        [
            (100, "the good clean prose arrives", "en", "s", 1),
            (101, "the junk spam garbage arrives", "en", "s", 1),
            (102, "the good good clean helpful prose arrives", "en", "s", 1),
            (103, "the noise junk filler arrives", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    flat = tmp_path / "in"
    incoming.coalesce(1).write.parquet(str(flat))
    stream = spark.readStream.schema(incoming.schema).parquet(str(flat))
    table = SnapshotTable(spark, tmp_path / "tbl")
    q = stream_corpus_pipeline_txn(
        stream, "text", "doc_id", table, str(tmp_path / "ckpt"),
        min_quality=0.0, langs=("en",), n_shards=2,
        batch_gate_fn=gate,
    )
    q.awaitTermination(120)
    landed = sorted(r.doc_id for r in table.read().select("doc_id").collect())
    assert landed == [100, 102]
    assert table.latest_batch_id() is not None  # token banked regardless


def test_txn_pipeline_near_dup_batch_gate(spark, tmp_path):
    """Near-dup dedup at ingest: the batch gate probes the TABLE ITSELF
    as the seen corpus through incremental_minhash_near_dups — an
    edited copy of an already-ingested doc (which exact-hash dedup
    cannot catch) is dropped, fresh docs land."""
    from heparchy_spark.operators.dedup import incremental_minhash_near_dups
    from heparchy_spark.sources.snapshot import SnapshotTable
    from heparchy_spark.streaming.pipeline import stream_corpus_pipeline_txn

    base = (
        "the quick brown fox jumps over the lazy dog and then naps in "
        "the warm afternoon sun for quite a while"
    )
    table = SnapshotTable(spark, tmp_path / "tbl")

    def near_dup_gate(batch):
        if table.latest_version() == 0:
            return batch
        seen = table.read().select("doc_id", "text")
        dups = (
            incremental_minhash_near_dups(
                batch, seen, "text", "doc_id", jaccard_threshold=0.5
            )
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        return batch.join(dups, "doc_id", "left_anti")

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    seed = spark.createDataFrame([(1, base, "en", "s", 1)], schema)
    b2 = spark.createDataFrame(
        [
            # one edited word: not an exact dup, but jaccard >> 0.5
            (2, base.replace("warm", "cold"), "en", "s", 1),
            (3, "the completely different new document talks about spark "
                "shuffle partitions and the adaptive query engine today",
             "en", "s", 1),
        ],
        schema,
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    seed.coalesce(1).write.mode("append").parquet(str(in_dir / "b0"))
    for f in (in_dir / "b0").glob("*.parquet"):
        f.rename(in_dir / "part-0.parquet")
    q = stream_corpus_pipeline_txn(
        spark.readStream.schema(seed.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(in_dir)),
        "text", "doc_id", table, str(tmp_path / "ckpt"),
        min_quality=0.0, langs=("en",), n_shards=2,
        batch_gate_fn=near_dup_gate,
    )
    q.awaitTermination(120)
    assert {r.doc_id for r in table.read().select("doc_id").collect()} == {1}

    b2.coalesce(1).write.mode("append").parquet(str(in_dir / "b1"))
    for f in (in_dir / "b1").glob("*.parquet"):
        f.rename(in_dir / "part-1.parquet")
    q = stream_corpus_pipeline_txn(
        spark.readStream.schema(seed.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(in_dir)),
        "text", "doc_id", table, str(tmp_path / "ckpt"),
        min_quality=0.0, langs=("en",), n_shards=2,
        batch_gate_fn=near_dup_gate,
    )
    q.awaitTermination(120)
    landed = {r.doc_id for r in table.read().select("doc_id").collect()}
    assert landed == {1, 3}, landed  # near-dup 2 gated, fresh 3 landed


def test_windowed_histogram_psi_matches_batch(spark, landing):
    from heparchy_spark.streaming.analytics import (
        psi_from_histogram,
        windowed_value_histogram,
    )

    edges = [20.0, 40.0, 60.0, 80.0]
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(
        windowed_value_histogram(stream, edges), "t_hist", "complete"
    )
    got_hist = {
        (r["window_start"], r["bin"]): r["n"]
        for r in spark.sql("select * from t_hist").collect()
    }
    batch_hist = windowed_value_histogram(load(spark, SF_DIR, "events"), edges)
    want_hist = {
        (r["window_start"], r["bin"]): r["n"] for r in batch_hist.collect()
    }
    assert got_hist == want_hist and got_hist

    # drift verdict: identical stateless PSI pass over sink vs batch twin
    ref = spark.createDataFrame(
        [(b, 1.0 / (len(edges) + 1)) for b in range(len(edges) + 1)],
        "bin int, ref_share double",
    )
    sink = spark.sql("select * from t_hist")
    got_psi = {
        r["window_start"]: r["psi"]
        for r in psi_from_histogram(sink, ref, len(edges) + 1).collect()
    }
    want_psi = {
        r["window_start"]: r["psi"]
        for r in psi_from_histogram(batch_hist, ref, len(edges) + 1).collect()
    }
    assert got_psi == want_psi and all(p >= 0 for p in got_psi.values())


def test_psi_from_histogram_counts_collapsed_bins(spark):
    """A bin that collapses to zero in one window — the strongest drift
    signal — must still contribute its smoothed term.  Independent
    plain-Python mirror (the stream-vs-batch twin test can't catch this:
    both sides share the helper)."""
    import datetime
    import math

    from heparchy_spark.streaming.analytics import psi_from_histogram

    w1 = datetime.datetime(2024, 1, 1, 0)
    w2 = datetime.datetime(2024, 1, 1, 1)
    # window 1: uniform across 4 bins; window 2: bin 3 collapsed to 0
    hist_rows = [(w1, b, 25) for b in range(4)] + [
        (w2, 0, 40), (w2, 1, 40), (w2, 2, 20)
    ]
    hist = spark.createDataFrame(
        hist_rows, "window_start timestamp, bin int, n long"
    )
    ref = spark.createDataFrame(
        [(b, 0.25) for b in range(4)], "bin int, ref_share double"
    )
    got = {
        r["window_start"]: r["psi"]
        for r in psi_from_histogram(hist, ref, 4).collect()
    }

    def mirror(counts):
        t = sum(counts)
        s = 0.0
        for n, q in zip(counts, [0.25] * 4):
            p = (n + 1.0) / (t + 4.0)
            s += round(
                (p - q) * (round(math.log(p), 8) - round(math.log(q), 8)),
                8,
            )
        return round(s, 6)

    assert got[w1] == mirror([25, 25, 25, 25])
    assert got[w2] == mirror([40, 40, 20, 0])
    # the collapsed bin's term dominates; without it PSI is badly low
    assert got[w2] > 0.2


def test_jsd_from_histogram_mirror_and_bounds(spark):
    """The streaming JSD verdict matches an independent plain-Python
    mirror (incl. a collapsed bin) and respects the ln 2 bound; an
    on-reference window scores ~0."""
    import datetime
    import math

    from heparchy_spark.streaming.analytics import jsd_from_histogram

    w1 = datetime.datetime(2024, 1, 1, 0)
    w2 = datetime.datetime(2024, 1, 1, 1)
    hist_rows = [(w1, b, 25) for b in range(4)] + [
        (w2, 0, 40), (w2, 1, 40), (w2, 2, 20)  # bin 3 collapsed
    ]
    hist = spark.createDataFrame(
        hist_rows, "window_start timestamp, bin int, n long"
    )
    ref = spark.createDataFrame(
        [(b, 0.25) for b in range(4)], "bin int, ref_share double"
    )
    got = {
        r["window_start"]: r["jsd"]
        for r in jsd_from_histogram(hist, ref, 4).collect()
    }

    def mirror(counts):
        t = sum(counts)
        s = 0.0
        for n, q in zip(counts, [0.25] * 4):
            p = (n + 1.0) / (t + 4.0)
            m = (p + q) / 2.0
            s += round(
                0.5 * p * (round(math.log(p), 8) - round(math.log(m), 8))
                + 0.5 * q * (round(math.log(q), 8) - round(math.log(m), 8)),
                8,
            )
        return round(s, 6) + 0.0

    assert got[w1] == mirror([25, 25, 25, 25])
    assert got[w2] == mirror([40, 40, 20, 0])
    assert 0.0 <= got[w1] < 1e-4          # on-reference window
    assert 0.0 < got[w2] <= math.log(2.0)  # drifted, bounded


def test_drift_monitors_handle_zero_ref_share(spark):
    """A reference bin with ref_share = 0 (new value appears only in
    production) must INCREASE the divergence, not null the term away:
    JSD takes the exact x*ln(x) -> 0 limit for the q-term; PSI clamps
    the reference to 1e-6 so the term is large but finite."""
    import datetime
    import math

    from heparchy_spark.streaming.analytics import (
        jsd_from_histogram,
        psi_from_histogram,
    )

    w = datetime.datetime(2024, 1, 1, 0)
    # all mass in bin 3, which the reference says NEVER occurs
    hist = spark.createDataFrame(
        [(w, 0, 30), (w, 1, 30), (w, 2, 0), (w, 3, 40)],
        "window_start timestamp, bin int, n long",
    )
    ref = spark.createDataFrame(
        [(0, 0.5), (1, 0.5), (2, 0.0), (3, 0.0)],
        "bin int, ref_share double",
    )
    jsd = jsd_from_histogram(hist, ref, 4).collect()[0]["jsd"]

    def jsd_mirror(counts, refs):
        t = sum(counts)
        s = 0.0
        for n, q in zip(counts, refs):
            p = (n + 1.0) / (t + 4.0)
            m = (p + q) / 2.0
            qt = (
                0.5 * q * (round(math.log(q), 8) - round(math.log(m), 8))
                if q > 0.0
                else 0.0
            )
            s += round(
                0.5 * p * (round(math.log(p), 8) - round(math.log(m), 8))
                + qt,
                8,
            )
        return round(s, 6) + 0.0

    assert jsd == jsd_mirror([30, 30, 0, 40], [0.5, 0.5, 0.0, 0.0])
    # 40% of mass where the reference has none -> substantial drift
    assert 0.1 < jsd <= math.log(2.0)

    psi = psi_from_histogram(hist, ref, 4).collect()[0]["psi"]
    assert psi is not None and psi > 1.0  # finite but loud


def test_wasserstein_from_histogram_mirror(spark):
    """The streaming W1 verdict matches a plain-Python cumulative
    mirror and reports the drift magnitude in value units: an
    on-reference window scores 0; mass shifted one bin over scores
    share * bin_width."""
    import datetime

    from heparchy_spark.streaming.analytics import wasserstein_from_histogram

    w1w = datetime.datetime(2024, 1, 1, 0)
    w2w = datetime.datetime(2024, 1, 1, 1)
    hist_rows = [(w1w, b, 25) for b in range(4)] + [
        (w2w, 0, 0), (w2w, 1, 50), (w2w, 2, 25), (w2w, 3, 25)
    ]
    hist = spark.createDataFrame(
        hist_rows, "window_start timestamp, bin int, n long"
    )
    ref = spark.createDataFrame(
        [(b, 0.25) for b in range(4)], "bin int, ref_share double"
    )
    got = {
        r["window_start"]: r["w1"]
        for r in wasserstein_from_histogram(hist, ref, 4, 10.0).collect()
    }
    assert got[w1w] == 0.0
    # window 2: bin-0 mass (0.25) moved to bin 1 -> cum diffs
    # [0.25, 0, 0, 0] -> W1 = 0.25 * 10.0
    def mirror(counts, width):
        t = sum(counts)
        cp = cq = 0.0
        acc = 0.0
        for n, q in zip(counts, [0.25] * 4):
            cp += n / t
            cq += q
            acc += round(abs(cp - cq), 8)
        return round(acc * width, 6) + 0.0

    assert got[w2w] == mirror([0, 50, 25, 25], 10.0) == 2.5


def test_streaming_frequent_items_matches_mirror(spark, landing):
    """Per-group Misra-Gries state across micro-batches: the final
    update row per (group, item) must equal a plain-Python MG replay
    over the same (ts, event_id)-ordered stream, the state stays
    bounded at k counters per group, and the deterministic guarantees
    hold: count_lb <= true <= count_lb + max_err, and every item with
    true frequency > n/(k+1) is present."""
    from heparchy_spark.streaming import (
        read_event_stream,
        streaming_frequent_items,
    )

    k = 8
    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(
        streaming_frequent_items(stream, "event_type", "user_id", k=k),
        "t_mg",
        "update",
    )
    got: dict[tuple, tuple] = {}
    for r in spark.sql("select * from t_mg").collect():
        # update-mode rows arrive in batch order; dict keeps the last
        got[(r["group"], r["item"])] = (r["count_lb"], r["max_err"])

    ev = load(spark, SF_DIR, "events")
    half = ev.count() // 2
    rows = [
        (str(r["event_type"]), str(r["user_id"]), r["ts"], r["event_id"])
        for r in ev.select("event_type", "user_id", "ts", "event_id").collect()
    ]
    # replay the two arrival files in order, each sorted like update()
    batches = [
        sorted((r for r in rows if r[3] < half), key=lambda r: (r[2], r[3])),
        sorted((r for r in rows if r[3] >= half), key=lambda r: (r[2], r[3])),
    ]
    tables: dict[str, dict] = {}
    offsets: dict[str, int] = {}
    for batch in batches:
        for g, it, _ts, _eid in batch:
            t = tables.setdefault(g, {})
            if it in t:
                t[it] += 1
            elif len(t) < k:
                t[it] = 1
            else:
                offsets[g] = offsets.get(g, 0) + 1
                tables[g] = {i: c - 1 for i, c in t.items() if c > 1}
    # the LAST update-mode emission per group is its final state
    want = {
        (g, it): (tables[g][it], offsets.get(g, 0))
        for g in tables
        for it in tables[g]
    }
    for gk, gv in want.items():
        assert got.get(gk) == gv, gk
    # bounded state
    for g in tables:
        assert len(tables[g]) <= k

    # guarantees vs exact truth
    true_counts: dict[tuple, int] = {}
    n_per_group: dict[str, int] = {}
    for g, it, _ts, _eid in rows:
        true_counts[(g, it)] = true_counts.get((g, it), 0) + 1
        n_per_group[g] = n_per_group.get(g, 0) + 1
    for (g, it), (lb, err) in want.items():
        t = true_counts[(g, it)]
        assert lb <= t <= lb + err, (g, it)
    for (g, it), t in true_counts.items():
        if t > n_per_group[g] / (k + 1):
            assert (g, it) in want, (g, it, t)


def test_streaming_rate_limit_matches_batch(spark, landing):
    """Per-user token-bucket admission across micro-batches (append
    mode: one verdict row per event) must equal the batch twin's fold
    over the full history — exact integer micro-token accounting means
    equality is bitwise, not approximate."""
    from heparchy_spark.streaming import (
        rate_limit_batch,
        read_event_stream,
        streaming_rate_limit,
    )

    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(
        streaming_rate_limit(stream, capacity=3, rate=1), "t_rate", "append"
    )
    got = {
        r["event_id"]: (r["user_id"], r["ts"], r["admitted"])
        for r in spark.sql("select * from t_rate").collect()
    }
    ev = load(spark, SF_DIR, "events")
    want = {
        r["event_id"]: (r["user_id"], r["ts"], r["admitted"])
        for r in rate_limit_batch(ev, capacity=3, rate=1).collect()
    }
    assert got == want
    # every event got exactly one verdict (denials are exercised by the
    # hand case below — sf0.001 traffic is too sparse to throttle at 1/s)
    assert len(got) == ev.count()


def test_rate_limit_bucket_semantics(spark):
    """Hand case: a same-timestamp burst of capacity+2 admits exactly
    capacity events (event_id order), a 1-second gap refills exactly
    one token at rate=1, and a 10-minute gap caps at capacity."""
    import datetime as dt

    from heparchy_spark.streaming import rate_limit_batch

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(i, 7, t0) for i in range(5)]                 # burst of 5, cap 3
    rows.append((5, 7, t0 + dt.timedelta(seconds=1)))     # +1 token
    rows.append((6, 7, t0 + dt.timedelta(seconds=1)))     # bucket dry again
    rows.append((7, 7, t0 + dt.timedelta(minutes=10)))    # refill caps at 3
    rows.append((8, 7, t0 + dt.timedelta(minutes=10)))
    rows.append((9, 7, t0 + dt.timedelta(minutes=10)))
    rows.append((10, 7, t0 + dt.timedelta(minutes=10)))   # 4th: denied
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {
        r.event_id: r.admitted
        for r in rate_limit_batch(df, capacity=3, rate=1).collect()
    }
    assert [got[i] for i in range(11)] == [
        True, True, True, False, False,   # burst: first 3 admitted
        True, False,                      # one refilled token
        True, True, True, False,          # capped refill: 3 tokens
    ]


def test_streaming_ivf_ingest_matches_batch(spark, tmp_path):
    """Incremental IVF serving twin: micro-batched new embeddings,
    assigned against broadcast centroids and screened vs the static
    seen corpus, must union to exactly the batch operator's output —
    bit-for-bit (same grid-rounded kernels, per-vector independence) —
    and land exactly once (snapshot batch-id tokens survive a
    checkpointed re-run)."""
    from heparchy_spark.operators.similarity import (
        incremental_ivf_assign,
        train_centroids,
    )
    from heparchy_spark.sources.snapshot import SnapshotTable
    from heparchy_spark.streaming import streaming_ivf_ingest

    emb = load(spark, SF_DIR, "embeddings")
    seen = emb.where(F.col("vec_id") < 250)
    new = emb.where(F.col("vec_id") >= 250)
    cents = train_centroids(
        seen, "embedding", n_centroids=8, order_col="vec_id"
    )
    flat = tmp_path / "flat"
    flat.mkdir()
    parts = [
        new.where(F.col("vec_id") < 375),
        new.where(F.col("vec_id") >= 375),
    ]
    for i, part in enumerate(parts):
        sub = tmp_path / f"b{i}"
        part.coalesce(1).write.parquet(str(sub))
        for j, f in enumerate(sorted(sub.glob("*.parquet"))):
            f.rename(flat / f"part-{i}{j}.parquet")

    def run_once(tbl):
        stream = (
            spark.readStream.schema(new.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(flat))
        )
        q = streaming_ivf_ingest(
            stream, seen, "embedding", "vec_id", cents, tbl,
            str(tmp_path / "ckpt"), threshold=0.9,
        )
        q.awaitTermination(180)

    table = SnapshotTable(spark, tmp_path / "verdicts")
    run_once(table)

    got = {tuple(r) for r in table.read().collect()}
    want_rows = incremental_ivf_assign(
        new, seen, "embedding", "vec_id", cents, threshold=0.9
    ).collect()
    want = {tuple(r) for r in want_rows}
    assert got == want
    assert len(want) == new.count()  # one verdict per new vector
    # at least one micro-batch per landing file, each an atomic append
    vers = table.versions()
    assert len(vers) >= 2
    assert {v["operation"] for v in vers} == {"append"}

    # checkpointed re-run: engine replays nothing, table unchanged
    n_before = len(vers)
    run_once(table)
    assert len(table.versions()) == n_before
    assert {tuple(r) for r in table.read().collect()} == want


def test_streaming_group_sample_matches_batch(spark, landing):
    """Bounded-state uniform sample per event_type: the bottom-k-by-hash
    reservoir across micro-batches must equal the batch twin exactly
    (associative min-merge, content-hash keys), and the final emission's
    n_seen must equal the true group size."""
    from heparchy_spark.streaming import (
        group_sample_batch,
        streaming_group_sample,
    )

    stream = read_event_stream(spark, landing, max_files_per_trigger=1)
    _run_to_memory(
        streaming_group_sample(stream, k=7), "t_sample", "update"
    )
    rows = spark.sql("select * from t_sample").collect()
    # the emission with the group's max n_seen is its final sample
    final_n = {}
    for r in rows:
        final_n[r["event_type"]] = max(
            final_n.get(r["event_type"], 0), r["n_seen"]
        )
    got = {
        (r["event_type"], r["event_id"], r["n_seen"])
        for r in rows
        if r["n_seen"] == final_n[r["event_type"]]
    }
    ev = load(spark, SF_DIR, "events")
    want = {
        (r["event_type"], r["event_id"], r["n_seen"])
        for r in group_sample_batch(ev, k=7).collect()
    }
    assert got == want
    # n_seen is the exact group size; every group sampled at exactly k
    # (sf0.001 groups all exceed k=7)
    sizes = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert final_n == sizes
    per_group: dict = {}
    for t, _e, _n in got:
        per_group[t] = per_group.get(t, 0) + 1
    assert all(v == 7 for v in per_group.values())


def test_streaming_url_dedup_ingest_exactly_once(spark, tmp_path):
    """Canonical-URL first-crawl-wins dedup at ingest: URL variants that
    normalize to the same canonical page are suppressed across
    micro-batches, commits are exactly-once (a checkpointed re-run
    lands nothing), and the committed union equals the batch
    min-id-wins keep set (id-ordered arrival)."""
    from heparchy_spark.operators.web import normalize_url
    from heparchy_spark.sources.snapshot import SnapshotTable
    from heparchy_spark.streaming import streaming_url_dedup_ingest

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    # variant matrix: (doc_id % 40) defines the canonical page; casing,
    # default port, utm params and fragments differ per crawl
    crawls = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://WWW.Ex"))
            .otherwise(F.lit("https://www.ex")),
            (F.col("doc_id") % 40).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(".COM:443/page"))
            .otherwise(F.lit(".com/page")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=a"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit("#top"))
            .otherwise(F.lit("")),
        ).alias("url"),
        "text",
    )
    # two id-ordered arrival files -> two micro-batches
    n_mid = 250
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, part in enumerate(
        [crawls.where(F.col("doc_id") < n_mid),
         crawls.where(F.col("doc_id") >= n_mid)]
    ):
        sub = tmp_path / f"b{i}"
        part.coalesce(1).write.parquet(str(sub))
        for j, f in enumerate(sorted(sub.glob("*.parquet"))):
            f.rename(flat / f"part-{i}{j}.parquet")

    def run_once(tbl):
        stream = (
            spark.readStream.schema(crawls.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(flat))
        )
        q = streaming_url_dedup_ingest(
            stream, "url", "doc_id", tbl, str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)

    table = SnapshotTable(spark, tmp_path / "url_tbl")
    run_once(table)

    got = {r["doc_id"] for r in table.read().select("doc_id").collect()}
    # batch twin: min doc_id per canonical URL over the whole crawl set
    want = {
        r["keep"]
        for r in crawls.withColumn("__u", normalize_url("url"))
        .groupBy("__u")
        .agg(F.min("doc_id").alias("keep"))
        .collect()
    }
    assert got == want
    # the variant matrix actually collapsed: 40 canonical pages
    assert len(got) == 40
    # landed rows keep the original columns (plus the canonical key)
    assert set(table.read().columns) >= {"doc_id", "url", "text", "__url_norm"}
    # every micro-batch banked its token atomically
    vers = table.versions()
    assert {v["operation"] for v in vers} == {"append"}
    assert table.latest_batch_id() == len(vers) - 1

    # checkpointed re-run: engine replays nothing, table unchanged
    n_before = len(vers)
    run_once(table)
    assert len(table.versions()) == n_before
    assert {
        r["doc_id"] for r in table.read().select("doc_id").collect()
    } == want


def test_streaming_domain_cap_ingest_exactly_once(spark, tmp_path):
    """Per-domain cap at ingest: at most `cap` docs per registrable
    domain land, first-arrival-wins across micro-batches, exactly-once
    (checkpointed re-run commits nothing), and with id-ordered arrival
    the landed set equals the batch first-k-by-id-per-domain twin."""
    from pyspark.sql import Window as W

    from heparchy_spark.operators.web import url_domain
    from heparchy_spark.sources.snapshot import SnapshotTable
    from heparchy_spark.streaming import streaming_domain_cap_ingest

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    # 5 distinct registrable domains (hostN.com), ~100 docs each at
    # sf0.001 — subdomains of one domain would collapse to a single cap
    crawls = docs.select(
        "doc_id",
        F.concat(
            F.lit("www.host"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".com"),
        ).alias("host"),
        "text",
    )
    n_mid = 250
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, part in enumerate(
        [crawls.where(F.col("doc_id") < n_mid),
         crawls.where(F.col("doc_id") >= n_mid)]
    ):
        sub = tmp_path / f"b{i}"
        part.coalesce(1).write.parquet(str(sub))
        for j, f in enumerate(sorted(sub.glob("*.parquet"))):
            f.rename(flat / f"part-{i}{j}.parquet")

    def run_once(tbl):
        stream = (
            spark.readStream.schema(crawls.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(flat))
        )
        q = streaming_domain_cap_ingest(
            stream, "host", "doc_id", tbl, str(tmp_path / "ckpt"), cap=7
        )
        q.awaitTermination(180)

    table = SnapshotTable(spark, tmp_path / "cap_tbl")
    run_once(table)

    got = {r["doc_id"] for r in table.read().select("doc_id").collect()}
    twin = (
        crawls.withColumn(
            "__d",
            url_domain(F.concat(F.lit("https://"), F.col("host"))),
        )
        .withColumn(
            "__rn", F.row_number().over(W.partitionBy("__d").orderBy("doc_id"))
        )
        .where(F.col("__rn") <= 7)
    )
    want = {r["doc_id"] for r in twin.select("doc_id").collect()}
    assert got == want and len(want) == 35  # 5 domains x cap 7
    # every landed doc is among each domain's 7 lowest ids (arrival order)
    per_dom = {}
    for d in sorted(got):
        per_dom.setdefault(d % 5, []).append(d)
    assert all(len(v) == 7 for v in per_dom.values())
    # the cap held ACROSS batches: batch 0 alone had >= 7 per domain, so
    # nothing from batch 1 (doc_id >= 250) may land
    assert max(got) < 250
    vers = table.versions()
    assert {v["operation"] for v in vers} == {"append"}
    assert table.latest_batch_id() == len(vers) - 1

    # checkpointed re-run: engine replays nothing, table unchanged
    n_before = len(vers)
    run_once(table)
    assert len(table.versions()) == n_before
    assert {r["doc_id"] for r in table.read().select("doc_id").collect()} == want
