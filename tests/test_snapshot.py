"""Snapshot-manifest table layer: atomic commits, snapshot isolation,
time travel, rollback, incremental reads, vacuum, conflict detection."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from heparchy_spark.sources.snapshot import SnapshotConflict, SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, tmp_path / "tbl")


def _batch(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_append_commits_accumulate(spark, table):
    assert table.latest_version() == 0
    v1 = table.commit(_batch(spark, 0, 10))
    v2 = table.commit(_batch(spark, 10, 25))
    assert (v1, v2) == (1, 2)
    assert table.read().count() == 25
    assert sorted(r["id"] for r in table.read().collect()) == list(range(25))
    hist = table.versions()
    assert [h["version"] for h in hist] == [1, 2]
    assert [h["rows"] for h in hist] == [10, 25]


def test_time_travel_and_isolation(spark, table):
    table.commit(_batch(spark, 0, 10))
    pinned = table.read(version=1)  # snapshot-isolated handle
    table.commit(_batch(spark, 0, 3).select("id", (F.col("id") + 99).alias("v")),
                 mode="overwrite")
    # latest sees the overwrite, the pinned version still the original
    assert table.read().count() == 3
    assert table.read(version=1).count() == 10
    assert pinned.count() == 10  # files untouched until vacuum
    assert table.versions()[-1]["operation"] == "overwrite"


def test_rollback_restores_as_new_version(spark, table):
    table.commit(_batch(spark, 0, 10))
    table.commit(_batch(spark, 0, 1), mode="overwrite")
    v3 = table.rollback(1)
    assert v3 == 3
    assert table.read().count() == 10
    # history is append-only: the overwrite version is still readable
    assert table.read(version=2).count() == 1


def test_read_incremental_is_exactly_the_new_rows(spark, table):
    table.commit(_batch(spark, 0, 10))
    table.commit(_batch(spark, 10, 18))
    inc = table.read_incremental(1, 2)
    assert sorted(r["id"] for r in inc.collect()) == list(range(10, 18))
    # overwrite breaks append-only lineage -> explicit error, not wrong data
    table.commit(_batch(spark, 0, 2), mode="overwrite")
    with pytest.raises(ValueError, match="append-only"):
        table.read_incremental(1, 3)


def test_append_schema_mismatch_rejected(spark, table):
    table.commit(_batch(spark, 0, 5))
    bad = spark.range(5).select(F.col("id").cast("int").alias("id"),
                                F.lit("x").alias("v"))
    with pytest.raises(ValueError, match="schema mismatch"):
        table.commit(bad)
    # overwrite may change the schema
    v = table.commit(bad, mode="overwrite")
    assert dict(table.read(version=v).dtypes)["v"] == "string"


def test_concurrent_commit_conflict(spark, table):
    table.commit(_batch(spark, 0, 5))
    # simulate a racing committer that won: next manifest already exists
    table._manifest_path(2).write_text("{}")
    with pytest.raises(SnapshotConflict):
        table.commit(_batch(spark, 5, 10))
    # loser retries after re-reading latest: but latest pointer still 1,
    # so clean up the racer's manifest and retry succeeds
    table._manifest_path(2).unlink()
    assert table.commit(_batch(spark, 5, 10)) == 2


def test_vacuum_expires_and_deletes_unreferenced(spark, table):
    table.commit(_batch(spark, 0, 10))
    table.commit(_batch(spark, 0, 2), mode="overwrite")
    table.commit(_batch(spark, 2, 4))
    n_data = len(list((table.root / "data").glob("*.parquet")))
    stats = table.vacuum(keep_last=2)
    assert stats["manifests_removed"] == 1
    # v1's files (10-row batch) are unreferenced by v2/v3 -> deleted
    assert stats["files_removed"] > 0
    assert len(list((table.root / "data").glob("*.parquet"))) == (
        n_data - stats["files_removed"]
    )
    # retained versions read fine; expired version errors clearly
    assert table.read(version=3).count() == 4
    with pytest.raises(ValueError, match="expired|does not exist"):
        table.read(version=1)


def test_reader_never_sees_staged_files(spark, table):
    """Files are invisible until the manifest lists them: a crashed
    writer's staged-but-uncommitted files never surface in reads."""
    table.commit(_batch(spark, 0, 5))
    # simulate a crash: data file present in data/ but in no manifest
    orphan_src = _batch(spark, 100, 105)
    orphan_src.write.parquet(str(table.root / "_staging" / "crashed"))
    for f in (table.root / "_staging" / "crashed").glob("*.parquet"):
        f.rename(table.root / "data" / f"crashed-{f.name}")
    assert table.read().count() == 5  # manifest-scoped, not listing-scoped
    # vacuum clears the orphan
    table.commit(_batch(spark, 5, 6))
    stats = table.vacuum(keep_last=1)
    assert stats["files_removed"] >= 1
    assert table.read().count() == 6


def test_snapshot_sink_exactly_once(spark, tmp_path):
    """Streaming sink into the snapshot table: one atomic commit per
    micro-batch; restarting from the same checkpoint and replaying a
    batch both leave the table unchanged (exactly-once)."""
    from heparchy_spark.queries.tables import load
    from heparchy_spark.sources.snapshot import snapshot_sink
    from heparchy_spark.streaming import read_event_stream

    # two arrival files -> two micro-batches
    ev = load(spark, "/root/testdata/sf0.001", "events")
    half = ev.count() // 2
    flat = tmp_path / "landing"
    flat.mkdir()
    for i, pred in enumerate([F.col("event_id") < half,
                              F.col("event_id") >= half]):
        sub = tmp_path / f"b{i}"
        ev.where(pred).coalesce(1).write.parquet(str(sub))
        for j, f in enumerate(sorted(sub.glob("*.parquet"))):
            f.rename(flat / f"part-{i}{j}.parquet")

    table = SnapshotTable(spark, tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, str(flat), max_files_per_trigger=1)
    q = snapshot_sink(stream, table, ckpt)
    q.awaitTermination(120)

    total = ev.count()
    assert table.read().count() == total
    versions = table.versions()
    assert len(versions) >= 2  # one commit per micro-batch
    assert table.latest_batch_id() == len(versions) - 1

    # restart from the same checkpoint: no new data, no new commits
    q2 = snapshot_sink(
        read_event_stream(spark, str(flat), max_files_per_trigger=1),
        table,
        ckpt,
    )
    q2.awaitTermination(120)
    assert table.read().count() == total
    assert len(table.versions()) == len(versions)

    # a foreachBatch replay after failure re-delivers the SAME batch_id:
    # the guard must refuse it, and accept a genuinely new batch id
    from heparchy_spark.sources.snapshot import commit_batch_once

    before = table.latest_version()
    last_bid = table.latest_batch_id()
    replay = table.read()
    assert commit_batch_once(table, replay, last_bid) is False
    assert table.latest_version() == before
    assert table.read().count() == total
    assert commit_batch_once(table, replay.limit(0), last_bid + 1) is True
    assert table.read().count() == total  # empty batch, rows unchanged
    assert table.latest_batch_id() == last_bid + 1


def test_read_where_prunes_files_by_manifest_stats(spark, table):
    """Three commits with disjoint id ranges -> an id probe must plan
    only the matching commit's files (manifest min/max skipping), and
    the result must equal the unpruned filter."""
    table.commit(_batch(spark, 0, 100).coalesce(1))
    table.commit(_batch(spark, 100, 200).coalesce(1))
    table.commit(_batch(spark, 200, 300).coalesce(1))

    probe = table.read_where("id", 150)
    assert [r["id"] for r in probe.collect()] == [150]
    # planning proof: only the middle commit's file survives pruning
    assert len(probe.inputFiles()) == 1
    full = table.read().where(F.col("id") == 150)
    assert probe.collect() == full.collect()

    rng = table.read_where("id", 90, 110)
    assert len(rng.inputFiles()) == 2  # spans two commits
    assert sorted(r["id"] for r in rng.collect()) == list(range(90, 111))

    # stats-free manifests (pre-stats history) are conservatively kept
    m = table._load_manifest(table.latest_version())
    m.pop("file_stats")
    table._manifest_path(table.latest_version()).write_text(__import__("json").dumps(m))
    unpruned = table.read_where("id", 150)
    assert len(unpruned.inputFiles()) == 3
    assert [r["id"] for r in unpruned.collect()] == [150]


def test_optimize_compacts_with_time_travel(spark, table):
    for lo in range(0, 300, 100):
        table.commit(_batch(spark, lo, lo + 100))
    files_before = len(table._load_manifest(3)["files"])
    v = table.optimize(num_files=1)
    assert v == 4
    m = table._load_manifest(4)
    assert m["operation"] == "optimize"
    assert len(m["files"]) == 1 < files_before
    assert m["rows"] == 300
    assert table.read().count() == 300
    # pre-optimize version still reads (time travel until vacuum)
    assert table.read(version=3).count() == 300

    # zorder variant keeps rows and re-tightens stats for pruning
    v2 = table.optimize(zorder_by=["id", "v"], num_files=4)
    assert table.read(version=v2).count() == 300
    probe = table.read_where("id", 5)
    assert len(probe.inputFiles()) <= 2
    assert [r["id"] for r in probe.collect()] == [5]


def test_materialized_aggregate_incremental_refresh(spark, tmp_path):
    """IVM: after each append, an incremental refresh must equal the
    full recompute; overwrites break lineage and force (correct) full
    recompute; a fresh view refresh is a no-op."""
    from heparchy_spark.sources.matview import MaterializedAggregate

    base = SnapshotTable(spark, tmp_path / "base")
    view = SnapshotTable(spark, tmp_path / "view")
    mv = MaterializedAggregate(
        base,
        view,
        ["grp"],
        {
            "n": ("count", None),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
    )

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 3).alias("grp"), F.col("id").alias("v")
        )

    def expected():
        return sorted(
            tuple(r)
            for r in base.read()
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("total"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )
            .select("grp", "n", "total", "lo", "hi")
            .collect()
        )

    def got():
        return sorted(
            tuple(r)
            for r in mv.read().select("grp", "n", "total", "lo", "hi").collect()
        )

    base.commit(batch(0, 50))
    assert mv.refresh()["mode"] == "full"  # first build
    assert got() == expected()

    base.commit(batch(50, 80))
    base.commit(batch(80, 100))  # two appends -> one delta spanning both
    assert mv.refresh()["mode"] == "incremental"
    assert got() == expected()

    assert mv.refresh()["mode"] == "noop"

    # overwrite breaks append-only lineage -> full recompute, still right
    base.commit(batch(0, 10), mode="overwrite")
    assert mv.refresh()["mode"] == "full"
    assert got() == expected()

    # and incremental resumes on the new lineage
    base.commit(batch(10, 30))
    assert mv.refresh()["mode"] == "incremental"
    assert got() == expected()

    with pytest.raises(ValueError, match="kind"):
        MaterializedAggregate(base, view, ["grp"], {"x": ("avg", "v")})


def test_concurrent_committers_with_retry_lose_nothing(spark, table):
    """Two real threads race append commits with the documented
    retry-on-conflict protocol: versions serialize, every batch lands
    exactly once, and at least the table ends fully consistent."""
    import threading

    from heparchy_spark.sources.snapshot import SnapshotConflict

    errors: list[Exception] = []

    def committer(lo: int, hi: int) -> None:
        df = _batch(spark, lo, hi)
        for _ in range(25):  # retry loop per the SnapshotConflict contract
            try:
                table.commit(df)
                return
            except SnapshotConflict:
                continue
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
                return
        errors.append(RuntimeError("retries exhausted"))

    ranges = [(0, 40), (40, 90), (90, 150), (150, 220)]
    threads = [threading.Thread(target=committer, args=r) for r in ranges]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    assert table.latest_version() == len(ranges)  # serialized, none lost
    assert sorted(r["id"] for r in table.read().collect()) == list(range(220))
    # history row counts are monotone (each commit appended)
    rows = [v["rows"] for v in table.versions()]
    assert rows == sorted(rows) and rows[-1] == 220


def test_expectations_gate_commits_atomically(spark, table):
    """Violating batches are rejected BEFORE visibility: the table
    version, row count, and data dir are untouched; clean batches with
    the same rules commit."""
    from heparchy_spark.sources.expectations import (
        ExpectationFailed,
        accepted_values,
        check_expectations,
        in_range,
        not_null,
        unique_key,
    )

    rules = [
        not_null("id", "v"),
        in_range("v", 0, 100),
        unique_key("id"),
    ]
    good = _batch(spark, 0, 40)  # v = 2*id in [0, 78]
    assert table.commit(good, expectations=rules) == 1

    bad = good.unionByName(_batch(spark, 30, 35))  # duplicate ids
    n_data = len(list((table.root / "data").glob("*.parquet")))
    with pytest.raises(ExpectationFailed, match="unique_key"):
        table.commit(bad, expectations=rules)
    # nothing changed, nothing staged left behind, nothing visible
    assert table.latest_version() == 1
    assert table.read().count() == 40
    assert len(list((table.root / "data").glob("*.parquet"))) == n_data
    assert not (table.root / "_staging").exists()

    out_of_range = spark.range(200, 203).select(
        F.col("id"), (F.col("id") * 2).alias("v")  # v up to 404 > 100
    )
    with pytest.raises(ExpectationFailed, match="in_range"):
        table.commit(out_of_range, expectations=rules)

    # the report itself: exact violation counts, one pass
    report = check_expectations(
        bad.unionByName(
            spark.createDataFrame([(None, 5.0)], "id long, v double")
            .select("id", F.col("v").cast("long").alias("v"))
        ),
        [*rules, accepted_values("v", list(range(0, 80, 2)))],
    )
    assert report["__rows"] == 46
    assert report["not_null(id,v)"] == 1
    assert report["unique_key(id)"] == 6  # 5 dup rows + 1 null-key row
    assert report["in_range(v,0,100)"] == 0


def test_additive_schema_evolution_on_append(spark, table):
    table.commit(_batch(spark, 0, 5))
    wider = _batch(spark, 5, 8).withColumn("w", F.lit("x"))
    # without the flag: rejected
    with pytest.raises(ValueError, match="allow_add_columns"):
        table.commit(wider)
    v2 = table.commit(wider, expectations=None, allow_add_columns=True)
    got = table.read(version=v2)
    assert set(got.columns) == {"id", "v", "w"}
    rows = {r["id"]: r["w"] for r in got.collect()}
    assert rows[6] == "x" and rows[0] is None  # old files read as NULL
    # the evolved schema is now the pinned contract: plain append of the
    # wider shape works, the NARROWER old shape no longer does
    table.commit(_batch(spark, 8, 9).withColumn("w", F.lit("y")))
    with pytest.raises(ValueError, match="schema mismatch"):
        table.commit(_batch(spark, 9, 10))
    # dropping or retyping is never additive, flag or not
    with pytest.raises(ValueError, match="schema mismatch"):
        table.commit(
            _batch(spark, 9, 10).withColumn("w", F.lit(1)),
            allow_add_columns=True,
        )


def test_read_asof_wall_clock(spark, table):
    import json as _json

    table.commit(_batch(spark, 0, 5))
    table.commit(_batch(spark, 5, 10))
    # pin distinct commit times so the cutpoints are unambiguous
    for v, at in [(1, "2024-01-01T00:00:00+00:00"),
                  (2, "2024-06-01T00:00:00+00:00")]:
        p = table._manifest_path(v)
        m = _json.loads(p.read_text())
        m["committed_at"] = at
        p.write_text(_json.dumps(m))

    assert table.read_asof("2024-03-01T00:00:00+00:00").count() == 5
    assert table.read_asof("2024-07-01").count() == 10  # naive -> UTC
    with pytest.raises(ValueError, match="no snapshot"):
        table.read_asof("2023-01-01T00:00:00+00:00")


def test_optimize_hilbert_curve(spark, table):
    for lo in range(0, 200, 50):
        table.commit(_batch(spark, lo, lo + 50))
    v = table.optimize(zorder_by=["id", "v"], num_files=4, curve="hilbert")
    assert table.read(version=v).count() == 200
    probe = table.read_where("id", 7)
    assert [r["id"] for r in probe.collect()] == [7]
    assert len(probe.inputFiles()) <= 2
    with pytest.raises(ValueError, match="curve"):
        table.optimize(zorder_by=["id", "v"], curve="peano")


def test_rollback_stamps_fresh_commit_time(spark, table):
    """read_asof monotonicity: a rollback's committed_at is its own
    commit instant, never the restored version's."""
    import json as _json

    table.commit(_batch(spark, 0, 5))
    table.commit(_batch(spark, 0, 1), mode="overwrite")
    table.rollback(1)
    times = [
        _json.loads(table._manifest_path(v).read_text())["committed_at"]
        for v in (1, 2, 3)
    ]
    assert times[2] >= times[1] >= times[0]
    assert times[2] != times[0]  # not inherited from v1


def test_snapshot_sink_expectations_fail_then_retry_same_batch(spark, tmp_path):
    """A violating micro-batch fails the stream BEFORE commit or
    checkpoint; restarting with permissive rules redelivers the SAME
    batch and lands it exactly once."""
    from heparchy_spark.sources.expectations import in_range
    from heparchy_spark.sources.snapshot import snapshot_sink

    src = tmp_path / "src"
    src.mkdir()
    _batch(spark, 0, 10).coalesce(1).write.parquet(str(tmp_path / "b"))
    for f in (tmp_path / "b").glob("*.parquet"):
        f.rename(src / "part-000.parquet")

    table = SnapshotTable(spark, tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def run(rules):
        stream = (
            spark.readStream.schema("id long, v long")
            .parquet(str(src))
        )
        q = snapshot_sink(stream, table, ckpt, expectations=rules)
        q.awaitTermination(120)

    with pytest.raises(Exception, match="in_range"):
        run([in_range("v", 0, 5)])  # v goes to 18 -> violation
    assert table.latest_version() == 0  # nothing landed
    assert not (table.root / "_staging").exists()

    run([in_range("v", 0, 100)])  # restart, permissive rules
    assert table.read().count() == 10
    assert table.latest_batch_id() == 0  # the SAME batch id, once


def test_snapshot_merge_upserts_atomically(spark, tmp_path):
    """MERGE INTO on the snapshot table: matched keys take the update
    side (including value->NULL), unmatched base rows survive, new keys
    insert; the pre-merge version still time-travels; updates missing
    table columns are rejected; delete_missing drops absent base keys."""
    import pyspark.sql.functions as F

    from heparchy_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, tmp_path / "t")
    t.commit(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, v double",
        )
    )
    updates = spark.createDataFrame(
        [(2, "b2", None), (4, "d", 40.0)], "k long, name string, v double"
    )
    v = t.merge(updates, keys=["k"])
    got = {
        r.k: (r.name, r.v)
        for r in t.read().orderBy("k").collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b2", None),   # genuine value->NULL update preserved
        3: ("c", 30.0),
        4: ("d", 40.0),
    }
    # pre-merge version still readable (time travel)
    pre = {r.k for r in t.read(version=v - 1).collect()}
    assert pre == {1, 2, 3}
    assert [m["operation"] for m in t.versions()][-1] == "merge"
    # schema guard
    import pytest

    with pytest.raises(ValueError, match="missing table columns"):
        t.merge(spark.createDataFrame([(9,)], "k long"), keys=["k"])
    # delete_missing drops base keys absent from the update side
    t.merge(
        spark.createDataFrame([(2, "b3", 2.0)], "k long, name string, v double"),
        keys=["k"],
        delete_missing=True,
    )
    assert {r.k for r in t.read().collect()} == {2}


def test_snapshot_diff_change_feed(spark, tmp_path):
    """Version diff: insert/delete/update classification across a MERGE
    commit, unchanged keys silent, null-safe value comparison."""
    from heparchy_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, tmp_path / "t")
    v1 = t.commit(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
        )
    )
    v2 = t.merge(
        spark.createDataFrame(
            [(2, 21.0), (3, None), (4, 40.0)], "k long, v double"
        ),
        keys=["k"],
        delete_missing=True,
    )
    got = {
        r.k: (r.change, r.old_v, r.new_v)
        for r in t.diff(v1, v2, keys=["k"]).collect()
    }
    # key 3: value None -> None is UNCHANGED under null-safe equality,
    # but delete_missing=False would have kept it; here the update side
    # carries it, so it is not deleted and not emitted.
    assert got == {
        1: ("delete", 10.0, None),
        2: ("update", 20.0, 21.0),
        4: ("insert", None, 40.0),
    }
    # reverse direction flips the classification
    rev = {r.k: r.change for r in t.diff(v2, v1, keys=["k"]).collect()}
    assert rev == {1: "insert", 2: "update", 4: "delete"}


def test_snapshot_schema_diff(spark, tmp_path):
    """Schema drift audit: additive evolution reports added columns,
    an overwrite retype reports retyped, and identical versions are
    empty — all from manifests, no file IO."""
    from heparchy_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, tmp_path / "t")
    v1 = t.commit(spark.createDataFrame([(1, "a")], "k long, name string"))
    v2 = t.commit(
        spark.createDataFrame(
            [(2, "b", 1.5)], "k long, name string, score double"
        ),
        allow_add_columns=True,
    )
    d = t.schema_diff(v1, v2)
    assert d == {"added": {"score": "double"}, "removed": {}, "retyped": {}}
    v3 = t.commit(
        spark.createDataFrame([(3, "c", 2)], "k long, name string, score int"),
        mode="overwrite",
    )
    d = t.schema_diff(v2, v3)
    assert d["retyped"] == {"score": ("double", "int")}
    assert t.schema_diff(v3, v3) == {
        "added": {}, "removed": {}, "retyped": {},
    }


def test_merge_rejects_extra_update_columns(spark, tmp_path):
    """Updates carrying columns the table lacks are a caller bug (e.g. a
    typo meant to hit a real column) — silently select()-ing them away
    would mask it, so merge refuses."""
    import pytest as _pytest

    from heparchy_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([(1, "a")], "k long, name string"))
    with _pytest.raises(ValueError, match="carry columns not in the table"):
        t.merge(
            spark.createDataFrame(
                [(1, "b", 9.0)], "k long, name string, typo double"
            ),
            keys=["k"],
        )
