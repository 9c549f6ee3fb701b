"""Snapshot-manifest table layer — atomic multi-file commits over plain
Parquet (the Delta/Iceberg core idea, minimal form).

``sources/maintenance.py`` documents the gap this closes: plain Parquet
has no atomic multi-file commit, so writers that produce several files
(every distributed writer) expose readers to torn states, and directory
listing is both slow and non-transactional at scale.  Table formats fix
this with a manifest: the table IS the manifest, data files are
immutable, and a commit is one atomic metadata operation.  Reference
scope analog: the reference's HDF5 store gets atomicity from the single
``.h5`` file (``/root/reference/heparchy/write/hdf.py:567-569``, file
handle open→close); a multi-file Parquet store needs this layer to offer
the same "a reader never sees half a write" contract.

Layout::

    <table>/data/<commit-uuid>-<part>.parquet   immutable data files
    <table>/_snapshots/v00000042.json           manifest: file list + schema
    <table>/_snapshots/_latest                  current-version pointer

Commit protocol (optimistic concurrency):

1. stage data files with a fresh commit uuid (never visible to readers —
   only manifest-listed files are),
2. create manifest ``v{N+1}`` with ``open(..., "x")`` — exclusive
   create; a concurrent committer that won the race makes this fail and
   the loser raises ``SnapshotConflict`` (retry = re-read latest,
   re-commit; staged files are re-linkable),
3. flip ``_latest`` via write-temp + ``os.replace`` (atomic on POSIX).

Readers resolve a version (pinned or latest) and read EXACTLY the
manifest's files — no directory listing, so scan planning is O(manifest)
not O(list bucket), and a pinned ``read(version=...)`` is snapshot
isolation: later commits never change which files it sees (files stay on
disk until ``vacuum``).

Scale: the manifest is a driver-side metadata object (KBs per thousand
files — same shape as Iceberg's metadata layer); data movement stays a
Spark job.  ``read_incremental`` turns the file-level append log into
incremental consumption: only files added between two versions are
scanned — the "process new data since yesterday" pattern without any
record-level change tracking.
"""

from __future__ import annotations

import json
import os
import shutil
import typing as ty
import uuid
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = [
    "SnapshotTable",
    "SnapshotConflict",
    "snapshot_sink",
    "commit_batch_once",
]


class SnapshotConflict(RuntimeError):
    """Another committer created the next version first; re-read and retry."""


def _footer_minmax(md) -> dict:
    """Per-file column min/max from the parquet footer (already in hand at
    commit time — no extra IO), JSON-safe types only (int/float/str).
    These power manifest-level file skipping: Iceberg keeps the same
    stats in its manifests so planning prunes files BEFORE any footer is
    opened — at 100 TB that is the difference between reading thousands
    of footers and reading one metadata object.

    String-stats truncation is safe to prune on: parquet writers that
    truncate long binary stats round the min DOWN and the max UP
    (parquet-mr's BinaryTruncator increments the last byte), so footer
    bounds stay conservative — truncation can only widen a file's
    apparent range and keep it, never wrongly drop it."""
    out: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(rgm.num_columns):
            c = rgm.column(ci)
            s = c.statistics
            if s is None or not s.has_min_max:
                continue
            lo, hi = s.min, s.max
            if not isinstance(lo, (int, float, str)) or isinstance(lo, bool):
                continue
            name = c.path_in_schema
            if name in out:
                out[name] = [min(out[name][0], lo), max(out[name][1], hi)]
            else:
                out[name] = [lo, hi]
    return out


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str | Path) -> None:
        self.spark = spark
        self.root = Path(root)
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        (self.root / "_snapshots").mkdir(exist_ok=True)

    # -- metadata -----------------------------------------------------------

    def _manifest_path(self, version: int) -> Path:
        return self.root / "_snapshots" / f"v{version:08d}.json"

    def latest_version(self) -> int:
        """Current version, 0 if never committed."""
        ptr = self.root / "_snapshots" / "_latest"
        if not ptr.exists():
            return 0
        return int(ptr.read_text().strip())

    def _load_manifest(self, version: int) -> dict:
        p = self._manifest_path(version)
        if not p.exists():
            raise ValueError(
                f"snapshot v{version} does not exist (expired by vacuum, "
                f"or never committed); latest is v{self.latest_version()}"
            )
        return json.loads(p.read_text())

    def versions(self) -> list[dict]:
        """All retained manifests, oldest first: version / operation /
        file and row counts — the table history."""
        out = []
        for p in sorted((self.root / "_snapshots").glob("v*.json")):
            m = json.loads(p.read_text())
            out.append(
                {
                    "version": m["version"],
                    "operation": m["operation"],
                    "n_files": len(m["files"]),
                    "n_added": m["n_added"],
                    "rows": m["rows"],
                }
            )
        return out

    # -- write path ---------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        batch_id: int | None = None,
        operation: str | None = None,
        app_meta: dict | None = None,
        expectations: ty.Sequence | None = None,
        allow_add_columns: bool = False,
    ) -> int:
        """Atomically commit ``df``'s rows as the next table version.

        ``append`` keeps the previous version's files and requires the
        schema to match the table's exactly (names + types — silent
        column drift is the classic multi-writer corruption);
        ``overwrite`` replaces the file list and may change schema.
        Returns the new version number.

        ``batch_id`` tags the manifest with a streaming micro-batch id —
        the idempotence token ``snapshot_sink`` uses for exactly-once
        delivery (a replayed batch is recognized and skipped).
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"commit: mode must be append|overwrite, not {mode!r}")
        base = self.latest_version()
        prev_files: list[str] = []
        prev_stats: dict[str, dict] = {}
        rows_prev = 0
        if base > 0:
            prev = self._load_manifest(base)
            if mode == "append":
                # order-insensitive: reads resolve columns by name against
                # the pinned schema, so field ORDER is not part of the
                # contract — names and types are
                def _fieldset(sj: str):
                    return sorted(
                        (f["name"], json.dumps(f["type"], sort_keys=True))
                        for f in json.loads(sj)["fields"]
                    )

                prev_fields = _fieldset(prev["schema"])
                new_fields = _fieldset(df.schema.json())
                if prev_fields != new_fields:
                    # additive evolution: a strict SUPERSET (same types on
                    # common columns) is safe schema-on-read — old files
                    # simply lack the new columns and read as NULL under
                    # the pinned (evolved) schema. Dropping or retyping a
                    # column is never an append.
                    is_additive = set(prev_fields) < set(new_fields)
                    if not (allow_add_columns and is_additive):
                        raise ValueError(
                            "append schema mismatch: committed schema "
                            f"{prev['schema']} != incoming {df.schema.json()};"
                            " pass allow_add_columns=True for additive "
                            "evolution, or mode='overwrite' to change the "
                            "table schema"
                        )
                prev_files = prev["files"]
                prev_stats = prev.get("file_stats", {})
                rows_prev = prev["rows"]

        # 1. stage data files under a commit uuid (invisible until listed)
        commit_id = uuid.uuid4().hex[:12]
        staging = self.root / "_staging" / commit_id
        df.write.parquet(str(staging))

        # 1b. quality gate on the STAGED files — what was actually
        # written, not the plan that produced it; a failing batch is
        # deleted before it can ever become visible
        if expectations:
            from heparchy_spark.sources.expectations import (
                ExpectationFailed,
                check_expectations,
            )

            staged = self.spark.read.schema(df.schema).parquet(str(staging))
            report = check_expectations(staged, expectations)
            if any(v > 0 for k, v in report.items() if k != "__rows"):
                shutil.rmtree(staging, ignore_errors=True)
                try:
                    staging.parent.rmdir()
                except OSError:
                    pass
                raise ExpectationFailed(report)

        new_files: list[str] = []
        new_stats: dict[str, dict] = {}
        rows_new = 0
        for f in sorted(staging.glob("*.parquet")):
            import pyarrow.parquet as pq

            md = pq.read_metadata(f)
            rows_new += md.num_rows
            dest = self.root / "data" / f"{commit_id}-{f.name}"
            f.rename(dest)
            rel = f"data/{dest.name}"
            new_files.append(rel)
            new_stats[rel] = _footer_minmax(md)
        shutil.rmtree(staging, ignore_errors=True)
        try:
            staging.parent.rmdir()  # remove _staging/ when empty
        except OSError:
            pass

        # 2. exclusive-create the next manifest (optimistic concurrency)
        version = base + 1
        import datetime as _dt

        manifest = {
            "version": version,
            "committed_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "operation": operation or mode,
            "files": (prev_files if mode == "append" else []) + new_files,
            "n_added": len(new_files),
            "rows": (rows_prev if mode == "append" else 0) + rows_new,
            "schema": df.schema.json(),
            "file_stats": {**prev_stats, **new_stats},
        }
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        if app_meta:
            # application-owned JSON blob (e.g. a materialized view's
            # base-table version) — rides the same atomic commit
            manifest["app_meta"] = app_meta
        try:
            with open(self._manifest_path(version), "x") as fh:
                json.dump(manifest, fh)
        except FileExistsError:
            raise SnapshotConflict(
                f"snapshot v{version} already committed by a concurrent "
                "writer; re-read latest_version() and retry"
            ) from None

        # 3. atomic pointer flip
        tmp = self.root / "_snapshots" / f"._latest.{commit_id}"
        tmp.write_text(str(version))
        os.replace(tmp, self.root / "_snapshots" / "_latest")
        return version

    def merge(
        self,
        updates: DataFrame,
        keys: list[str],
        delete_missing: bool = False,
        app_meta: dict | None = None,
    ) -> int:
        """Transactional MERGE INTO: apply the upsert semantics of
        ``operators/upsert.merge_snapshot`` (update-side wins on matched
        keys including genuine value->NULL updates, base rows survive
        otherwise, ``delete_missing`` drops base keys absent from the
        update side) and commit the merged table as a new OVERWRITE
        version — Delta/Iceberg MERGE with this layer's atomicity:
        concurrent committers conflict on the exclusive version file
        (``SnapshotConflict``), never corrupt, and the pre-merge version
        time-travels until vacuum.

        ``updates`` must carry the table's full schema (MERGE never
        changes the shape of the table — schema evolution is
        ``commit(allow_add_columns=...)``'s job).

        Scale note: this is copy-on-write at TABLE granularity — one
        full-outer key shuffle plus a rewrite of every file.  At large
        tables, restrict the rewrite by partitioning the merge on a key
        range and committing per-partition (the OPTIMIZE trade-off);
        the commit protocol is unchanged either way.
        """
        from heparchy_spark.operators.upsert import merge_snapshot

        if self.latest_version() == 0:
            raise ValueError("snapshot table has no commits yet")
        base = self.read()
        missing = set(base.columns) - set(updates.columns)
        if missing:
            raise ValueError(
                f"merge: updates are missing table columns {sorted(missing)}"
                " — MERGE never changes the table shape"
            )
        extra = set(updates.columns) - set(base.columns)
        if extra:
            # Silently select()-ing these away would mask caller bugs
            # (e.g. a typoed column that was meant to update a real one).
            raise ValueError(
                f"merge: updates carry columns not in the table {sorted(extra)}"
                " — drop them explicitly, or evolve the schema via"
                " commit(allow_add_columns=...)"
            )
        merged = merge_snapshot(
            base,
            updates.select(*base.columns),
            keys,
            compare_cols=sorted(set(base.columns) - set(keys)),
            delete_missing=delete_missing,
        )
        return self.commit(
            merged.select(*base.columns),
            mode="overwrite",
            operation="merge",
            app_meta=app_meta,
        )

    def diff(
        self,
        from_version: int,
        to_version: int,
        keys: list[str],
    ) -> DataFrame:
        """Key-level change feed between two versions (Delta's
        ``table_changes`` shape): one row per key whose content changed,
        with ``change`` in {insert, delete, update} and both sides'
        columns (``old_*`` / ``new_*``).  Reads exactly two manifests —
        no history scan; the comparison is one full-outer key join, and
        a null-safe equality over the non-key columns decides
        ``update`` vs unchanged (unchanged keys are not emitted).

        For APPEND-only history prefer ``read_incremental`` (file-level,
        no join at all); ``diff`` is the general form that also covers
        overwrite commits — OPTIMIZE, MERGE, rollback — where file
        lineage says nothing about row identity.
        """
        old = self.read(version=from_version)
        new = self.read(version=to_version)
        if set(old.columns) != set(new.columns):
            raise ValueError(
                "diff: versions have different schemas — compare columns "
                f"{sorted(set(old.columns) ^ set(new.columns))} are not shared"
            )
        vals = sorted(set(old.columns) - set(keys))
        o = old.select(
            *keys, *[F.col(c).alias(f"old_{c}") for c in vals],
            F.lit(True).alias("__in_old"),
        )
        n = new.select(
            *keys, *[F.col(c).alias(f"new_{c}") for c in vals],
            F.lit(True).alias("__in_new"),
        )
        j = o.join(n, keys, "full_outer")
        changed = F.lit(False)
        for c in vals:
            changed = changed | ~F.col(f"old_{c}").eqNullSafe(
                F.col(f"new_{c}")
            )
        change = (
            F.when(F.col("__in_old").isNull(), F.lit("insert"))
            .when(F.col("__in_new").isNull(), F.lit("delete"))
            .when(changed, F.lit("update"))
        )
        return (
            j.withColumn("change", change)
            .where(F.col("change").isNotNull())
            .select(
                *keys,
                "change",
                *[f"old_{c}" for c in vals],
                *[f"new_{c}" for c in vals],
            )
        )

    def schema_diff(self, from_version: int, to_version: int) -> dict:
        """Schema drift between two versions from their manifests alone
        (no file IO): ``{"added": {col: type}, "removed": {col: type},
        "retyped": {col: (old, new)}}``.  The audit companion to
        ``commit(allow_add_columns=...)`` — additive evolution shows up
        under ``added``; anything under ``removed``/``retyped`` means an
        overwrite commit changed the table shape.
        """
        def fields(version: int) -> dict:
            sch = StructType.fromJson(
                json.loads(self._load_manifest(version)["schema"])
            )
            return {f.name: f.dataType.simpleString() for f in sch.fields}

        old, new = fields(from_version), fields(to_version)
        return {
            "added": {c: t for c, t in new.items() if c not in old},
            "removed": {c: t for c, t in old.items() if c not in new},
            "retyped": {
                c: (old[c], new[c])
                for c in old.keys() & new.keys()
                if old[c] != new[c]
            },
        }

    def rollback(self, version: int) -> int:
        """Restore ``version``'s content as a NEW commit (Iceberg-style:
        history is append-only; rollback never rewrites it)."""
        import datetime as _dt

        m = self._load_manifest(version)
        base = self.latest_version()
        new_version = base + 1
        manifest = {
            **m,
            "version": new_version,
            # fresh stamp: inheriting the source's committed_at would let
            # read_asof resolve a LATER version at an EARLIER instant
            "committed_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "operation": f"rollback(v{version})",
            "n_added": 0,
        }
        try:
            with open(self._manifest_path(new_version), "x") as fh:
                json.dump(manifest, fh)
        except FileExistsError:
            raise SnapshotConflict(
                f"snapshot v{new_version} already committed by a concurrent "
                "writer; re-read latest_version() and retry"
            ) from None
        tmp = self.root / "_snapshots" / f"._latest.rb{new_version}"
        tmp.write_text(str(new_version))
        os.replace(tmp, self.root / "_snapshots" / "_latest")
        return new_version

    # -- read path ----------------------------------------------------------

    def _read_files(self, manifest: dict) -> DataFrame:
        schema = StructType.fromJson(json.loads(manifest["schema"]))
        files = [str(self.root / f) for f in manifest["files"]]
        if not files:
            return self.spark.createDataFrame([], schema)
        # explicit file list + pinned schema: no directory listing, no
        # schema inference — the manifest is the source of truth
        return self.spark.read.schema(schema).parquet(*files)

    def read(self, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: latest).  A pinned version is
        a consistent snapshot no concurrent commit can disturb.

        Because the DataFrame is an explicit file list (not a directory),
        this pinning extends to stream-static joins: a ``read()`` used as
        the static side stays on its manifest for the streaming query's
        whole lifetime — no mid-query dimension drift, unlike a
        directory-based static side that can pick up newly landed files
        between micro-batches.  For per-batch dimension refresh, resolve
        ``read()`` inside ``foreachBatch`` instead (see
        ``stream_corpus_pipeline_txn`` for the pattern)."""
        v = self.latest_version() if version is None else version
        if v == 0:
            raise ValueError("snapshot table has no commits yet")
        return self._read_files(self._load_manifest(v))

    def read_incremental(self, from_version: int, to_version: int) -> DataFrame:
        """Rows in files ADDED after ``from_version`` up to ``to_version``
        — incremental consumption of an append-only table without
        record-level CDC.  Raises if either version was an overwrite /
        rollback boundary crossing (file-set diff would not equal the
        row-level delta there)."""
        lo = self._load_manifest(from_version)
        hi = self._load_manifest(to_version)
        lo_set = set(lo["files"])
        if not lo_set.issubset(set(hi["files"])):
            raise ValueError(
                "read_incremental: file set is not append-only between "
                f"v{from_version} and v{to_version} (overwrite or rollback "
                "in between); read the full snapshot instead"
            )
        added = [f for f in hi["files"] if f not in lo_set]
        return self._read_files({**hi, "files": added})

    def read_asof(self, ts: str) -> DataFrame:
        """Time travel by wall clock: the table as of ISO-8601 instant
        ``ts`` (latest version whose commit time is <= ts).  Commit
        times are the committer's clock — version-based travel
        (``read(version=...)``) is the precise form; this is the
        convenience for "what did the dashboard see yesterday"."""
        import datetime as _dt

        want = _dt.datetime.fromisoformat(ts)
        if want.tzinfo is None:
            want = want.replace(tzinfo=_dt.timezone.utc)
        best = 0
        for p in sorted((self.root / "_snapshots").glob("v*.json")):
            m = json.loads(p.read_text())
            at = m.get("committed_at")
            if at is None:
                continue
            if _dt.datetime.fromisoformat(at) <= want:
                best = max(best, m["version"])
        if best == 0:
            raise ValueError(
                f"no snapshot committed at or before {ts} "
                "(or all retained manifests predate committed_at support)"
            )
        return self.read(version=best)

    def read_where(
        self,
        col: str,
        lo,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Range/point read with MANIFEST-level file skipping: files whose
        committed [min, max] cannot contain ``[lo, hi]`` (``hi`` defaults
        to ``lo`` — an equality probe) are dropped at planning, before
        Spark opens a single footer.  The residual predicate is still
        applied to the surviving files, so correctness never depends on
        the stats — a file with missing stats is conservatively kept.

        Effective when commits are value-clustered (per-batch ranges,
        `optimize(zorder_by=...)`); useless-but-harmless on random
        layouts, like every min/max index.
        """
        if hi is None:
            hi = lo
        v = self.latest_version() if version is None else version
        if v == 0:
            raise ValueError("snapshot table has no commits yet")
        m = self._load_manifest(v)
        stats = m.get("file_stats", {})

        def may_contain(f: str) -> bool:
            mm = stats.get(f, {}).get(col)
            if mm is None:
                return True  # no stats -> cannot prune safely
            fmin, fmax = mm
            return not (hi < fmin or lo > fmax)

        kept = [f for f in m["files"] if may_contain(f)]
        from pyspark.sql import functions as F

        df = self._read_files({**m, "files": kept})
        return df.where(F.col(col).between(lo, hi))

    def optimize(
        self,
        zorder_by: list[str] | None = None,
        num_files: int | None = None,
        curve: str = "zorder",
    ) -> int:
        """Rewrite the current version compacted (and optionally
        space-filling-curve clustered) as a NEW version — OPTIMIZE
        [ZORDER BY] with time travel intact: the pre-optimize version
        still reads until vacuum.  ``curve="hilbert"`` swaps Morton for
        the locality-tighter Hilbert key (liquid-clustering's choice).
        Row count is verified against the previous manifest; a mismatch
        rolls the pointer back and raises."""
        if curve not in ("zorder", "hilbert"):
            raise ValueError(f"optimize: curve must be zorder|hilbert, not {curve!r}")
        base = self.latest_version()
        if base == 0:
            raise ValueError("snapshot table has no commits yet")
        rows_before = self._load_manifest(base)["rows"]
        df = self.read()
        if zorder_by:
            from heparchy_spark.operators.layout import (
                cluster_by_hilbert,
                cluster_by_zorder,
            )

            cluster = (
                cluster_by_hilbert if curve == "hilbert" else cluster_by_zorder
            )
            out = cluster(df, zorder_by, num_files=num_files)
        else:
            out = df.coalesce(num_files or 1)
        v = self.commit(out, mode="overwrite", operation="optimize")
        if self._load_manifest(v)["rows"] != rows_before:
            self.rollback(base)
            raise RuntimeError(
                "optimize changed the row count — pointer rolled back to "
                f"v{base}; optimized v{v} left for inspection"
            )
        return v

    def app_meta(self, version: int | None = None) -> dict:
        """The application metadata blob committed with ``version``
        (default latest); empty dict if none."""
        v = self.latest_version() if version is None else version
        if v == 0:
            return {}
        return self._load_manifest(v).get("app_meta", {})

    def latest_batch_id(self) -> int | None:
        """Highest streaming micro-batch id any retained manifest carries
        (None if the table has never been a streaming sink).  One stream
        per table: the id namespace is the sink query's, so two different
        streams writing one table would alias each other's tokens —
        use one table per stream (documented contract, like the
        checkpoint dir itself)."""
        best: int | None = None
        for p in (self.root / "_snapshots").glob("v*.json"):
            b = json.loads(p.read_text()).get("batch_id")
            if b is not None and (best is None or b > best):
                best = b
        return best

    # -- maintenance --------------------------------------------------------

    def vacuum(self, keep_last: int = 2) -> dict:
        """Expire all but the last ``keep_last`` snapshots and delete data
        files no retained snapshot references.  Time travel to expired
        versions then fails with a clear error (their manifests are
        removed).  Returns ``{"manifests_removed", "files_removed"}``."""
        if keep_last < 1:
            raise ValueError("vacuum: keep_last must be >= 1")
        manifests = sorted((self.root / "_snapshots").glob("v*.json"))
        expired, retained = manifests[:-keep_last], manifests[-keep_last:]
        keep_files = set()
        for p in retained:
            keep_files |= set(json.loads(p.read_text())["files"])
        files_removed = 0
        for f in (self.root / "data").glob("*.parquet"):
            if f"data/{f.name}" not in keep_files:
                f.unlink()
                files_removed += 1
        for p in expired:
            p.unlink()
        return {"manifests_removed": len(expired), "files_removed": files_removed}


def commit_batch_once(
    table: SnapshotTable,
    batch_df: DataFrame,
    batch_id: int,
    expectations: ty.Sequence | None = None,
) -> bool:
    """The sink's idempotence guard: commit unless ``batch_id`` is already
    represented in the manifest history (a foreachBatch replay).  Returns
    whether a commit happened."""
    last = table.latest_batch_id()
    if last is not None and batch_id <= last:
        return False
    table.commit(
        batch_df, mode="append", batch_id=batch_id, expectations=expectations
    )
    return True


def snapshot_sink(
    stream_df: DataFrame,
    table: SnapshotTable,
    checkpoint: str,
    trigger_available_now: bool = True,
    expectations: ty.Sequence | None = None,
):
    """Exactly-once streaming sink: each micro-batch becomes one atomic
    snapshot commit, keyed by the engine's batch id.

    Structured Streaming's file/parquet sink is at-least-once on
    non-transactional stores (a task retry after a partial write leaves
    orphan files a plain directory read picks up).  Here the composition
    closes the gap from both sides: staged files are INVISIBLE until the
    manifest commit (the snapshot layer's core property), and a replayed
    micro-batch — foreachBatch reruns after failure/restart with the SAME
    batch_id — is recognized via the manifest's ``batch_id`` token and
    skipped, so its rows commit exactly once.  This is the same
    idempotent-commit protocol Delta's streaming sink uses (txn version
    per (appId, batchId)).

    One stream per table (see ``latest_batch_id``).  Returns the started
    ``StreamingQuery``.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # an ExpectationFailed here fails the streaming query; the batch
        # is neither committed nor checkpointed, so a restart (with
        # fixed data/rules) redelivers it under the SAME batch id —
        # quality gating composes with exactly-once instead of silently
        # dropping or double-landing the batch
        commit_batch_once(table, batch_df, batch_id, expectations)

    writer = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
