"""Read-side facade: heparchy reader ergonomics over the Parquet store.

Mirrors the reference API (``/root/reference/heparchy/read/hdf.py``):
``HepReader`` ≈ ``HdfReader`` (:504-540), ``HepProcessReader`` ≈
``HdfProcessReader`` (:364-501), ``HepEventReader`` ≈ ``HdfEventReader``
(:175-361), ``MapReader`` ≈ ``MapReader`` (:80-147). Key parity behaviors:

- ``reader[name]`` opens a process and eagerly caches its metadata row
  (``read/hdf.py:437`` — P6),
- ``len(proc)`` is metadata-only, no scan (``:444-445`` — P5),
- ``proc[n]`` is a partition-pruned point lookup: the filter
  ``chunk_id == n // evts_per_chunk`` reaches the Parquet scan as partition
  pruning, the Spark analog of the reference's O(1) key arithmetic
  (``:454-466`` — P3),
- column properties are lazy-per-column (``:262-316``): each access selects
  exactly one column group, so Parquet column pruning does what the
  reference's per-dataset reads do,
- iteration order is unspecified, like the reference's native B-tree order
  (``:419-428``); ``proc.event_ids()`` gives numeric order explicitly,
- mutation via any mapping raises ``ReadOnlyError`` (``:49-53,140-144``).

Each facade object also exposes the idiomatic Spark surface (``.df``,
``.particles``, ``.events``, ``.edges``) — DataFrames with the pruning
filters applied — because at 100 TB the NumPy materialization path is for
single events, not scans.
"""

from __future__ import annotations

import json
import typing as ty
import warnings
from collections.abc import Mapping
from pathlib import Path

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.errors import ReadOnlyError
from heparchy_spark.sources import store as store_mod

__all__ = ["MapReader", "HepEventReader", "HepProcessReader", "HepReader"]

PMU_DTYPE = np.dtype([("x", "<f8"), ("y", "<f8"), ("z", "<f8"), ("e", "<f8")])
COLOR_DTYPE = np.dtype([("color", "<i4"), ("anticolor", "<i4")])
EDGE_DTYPE = np.dtype([("src", "<i4"), ("dst", "<i4")])


class MapReader(Mapping):
    """Read-only mapping (``read/hdf.py:80-147``): lookups/iteration work,
    any mutation raises ``ReadOnlyError``."""

    def __init__(
        self,
        keys: ty.Callable[[], ty.Sequence[str]],
        getter: ty.Callable[[str], ty.Any],
    ) -> None:
        self._keys = keys
        self._getter = getter

    def __repr__(self) -> str:
        return f"MapReader(keys={tuple(self._keys())})"

    def __len__(self) -> int:
        return len(self._keys())

    def __getitem__(self, name: str) -> ty.Any:
        if name not in self._keys():
            raise KeyError(name)
        return self._getter(name)

    def __iter__(self) -> ty.Iterator[str]:
        return iter(self._keys())

    def __setitem__(self, name: str, data: ty.Any) -> ty.NoReturn:
        raise ReadOnlyError("Value assignment not allowed in read mode.")

    def __delitem__(self, name: str) -> ty.NoReturn:
        raise ReadOnlyError("Value deletion not allowed in read mode.")


class HepEventReader:
    """Cursor over one event (``read/hdf.py:175-361``). Like the reference,
    the process reader reuses a single instance while iterating
    (``:432,447-452``); hold one across iterations via ``copy()``."""

    def __init__(self, proc: "HepProcessReader") -> None:
        self._proc = proc
        self._event_id: int = -1
        self._chunk_id: int = -1
        self._evt_meta: dict | None = None
        self._cache: dict[str, np.ndarray] = {}

    def _bind(self, event_id: int, evt_meta: dict | None = None) -> None:
        self._event_id = int(event_id)
        self._chunk_id = store_mod.chunk_of(self._event_id, self._proc.evts_per_chunk)
        self._evt_meta = evt_meta
        self._cache = {}

    # -- identity / metadata ----------------------------------------------
    @property
    def name(self) -> str:
        return f"evt-{self._event_id}"

    @property
    def count(self) -> int:
        """Particle count from event metadata, no particle scan
        (``read/hdf.py:255-260`` — P5)."""
        return int(self._meta()["num_pcls"])

    def _meta(self) -> dict:
        if self._evt_meta is None:
            rows = (
                self._proc.events.where(F.col("event_id") == self._event_id)
                .limit(1)
                .collect()
            )
            if not rows:
                raise KeyError(f"event {self._event_id} not found")
            self._evt_meta = rows[0].asDict()
        return self._evt_meta

    # -- pruned single-event DataFrame ------------------------------------
    @property
    def df(self) -> DataFrame:
        """This event's particles as a DataFrame — partition-pruned on
        (process, chunk_id), row-group-pruned on event_id (P3)."""
        return self._proc.particles.where(
            (F.col("chunk_id") == self._chunk_id)
            & (F.col("event_id") == self._event_id)
        )

    def _fetch(self, cols: list[str]) -> dict[str, np.ndarray]:
        missing = [c for c in cols if c not in self._cache]
        if missing:
            pdf = (
                self.df.select("pcl_idx", *missing)
                .sort("pcl_idx")
                .toPandas()
            )
            for c in missing:
                self._cache[c] = pdf[c].to_numpy()
        return {c: self._cache[c] for c in cols}

    # -- column properties, lazy per access (read/hdf.py:262-316) ---------
    @property
    def pmu(self) -> np.ndarray:
        d = self._fetch(["px", "py", "pz", "e"])
        out = np.empty(len(d["px"]), dtype=PMU_DTYPE)
        for ours, ref in (("px", "x"), ("py", "y"), ("pz", "z"), ("e", "e")):
            out[ref] = d[ours].astype("float64")
        return out

    @property
    def pdg(self) -> np.ndarray:
        return self._fetch(["pdg"])["pdg"].astype("int32")

    @property
    def status(self) -> np.ndarray:
        return self._fetch(["status"])["status"].astype("int16")

    @property
    def helicity(self) -> np.ndarray:
        return self._fetch(["helicity"])["helicity"].astype("int16")

    @property
    def color(self) -> np.ndarray:
        d = self._fetch(["color", "anticolor"])
        out = np.empty(len(d["color"]), dtype=COLOR_DTYPE)
        out["color"] = d["color"].astype("int32")
        out["anticolor"] = d["anticolor"].astype("int32")
        return out

    def _edges_df(self) -> DataFrame:
        return self._proc.edges.where(
            (F.col("chunk_id") == self._chunk_id)
            & (F.col("event_id") == self._event_id)
        )

    @property
    def edges(self) -> np.ndarray:
        pdf = (
            self._edges_df()
            .select("edge_idx", "src", "dst")
            .sort("edge_idx")
            .toPandas()
        )
        out = np.empty(len(pdf), dtype=EDGE_DTYPE)
        out["src"] = pdf["src"].to_numpy().astype("int32")
        out["dst"] = pdf["dst"].to_numpy().astype("int32")
        return out

    @property
    def edge_weights(self) -> np.ndarray:
        pdf = (
            self._edges_df()
            .select("edge_idx", "weight")
            .sort("edge_idx")
            .toPandas()
        )
        return pdf["weight"].to_numpy().astype("float64")

    # -- masks / custom / meta mappings ------------------------------------
    @property
    def masks(self) -> MapReader:
        keys = tuple(self._meta().get("mask_keys") or ())
        return MapReader(
            lambda: keys,
            lambda k: self._fetch([f"mask_{k}"])[f"mask_{k}"].astype("bool"),
        )

    def mask(self, name: str) -> np.ndarray:
        """Deprecated accessor kept for parity (``read/hdf.py:329-332``)."""
        warnings.warn("mask(name) is deprecated; use masks[name]", DeprecationWarning)
        return self.masks[name]

    @property
    def final(self) -> np.ndarray:
        """Deprecated ``final`` mask shortcut (``read/hdf.py:318-321``)."""
        warnings.warn("final is deprecated; use masks['final']", DeprecationWarning)
        return self.masks["final"]

    @property
    def custom(self) -> MapReader:
        keys = tuple(self._meta().get("custom_keys") or ())

        def get(k: str) -> np.ndarray:
            arr = self._fetch([f"custom_{k}"])[f"custom_{k}"]
            if len(arr) and isinstance(arr[0], (list, np.ndarray)):
                return np.stack([np.asarray(x) for x in arr])
            return arr

        return MapReader(lambda: keys, get)

    def get_custom(self, name: str) -> np.ndarray:
        warnings.warn(
            "get_custom(name) is deprecated; use custom[name]", DeprecationWarning
        )
        return self.custom[name]

    @property
    def custom_meta(self) -> MapReader:
        meta = self._meta().get("custom_meta") or {}
        return MapReader(lambda: tuple(meta), lambda k: json.loads(meta[k]))

    def get_custom_meta(self, name: str) -> ty.Any:
        warnings.warn(
            "get_custom_meta(name) is deprecated; use custom_meta[name]",
            DeprecationWarning,
        )
        return self.custom_meta[name]

    @property
    def available(self) -> list[str]:
        """All dataset names in this event (``read/hdf.py:323-327``)."""
        meta = self._meta()
        out = ["pmu", "pdg", "status", "helicity", "color"]
        if meta.get("num_edges"):
            out += ["edges", "edge_weights"]
        out += [f"masks/{k}" for k in meta.get("mask_keys") or ()]
        out += [f"custom/{k}" for k in meta.get("custom_keys") or ()]
        return out

    def copy(self) -> "HepEventReader":
        """Detach a copy of the shared cursor (``read/hdf.py:356-361``)."""
        new = HepEventReader(self._proc)
        new._bind(self._event_id, self._evt_meta)
        new._cache = dict(self._cache)
        return new


class HepProcessReader:
    """Process handle (``read/hdf.py:364-501``): metadata cached eagerly on
    open; events via point lookup, iteration, or the Spark DataFrames."""

    def __init__(self, file_obj: "HepReader", key: str) -> None:
        self._file = file_obj
        self.key = key
        rows = (
            store_mod.read_table(file_obj.spark, file_obj.path, "processes")
            .where(F.col("process") == key)
            .collect()
        )
        if not rows:
            raise KeyError(f"process {key!r} not found")
        self._meta = rows[0].asDict()  # eager cache, read/hdf.py:437 (P6)
        self.evts_per_chunk = int(
            self._meta.get("evts_per_chunk") or self._file.evts_per_chunk
        )
        self._evt = HepEventReader(self)  # shared cursor, read/hdf.py:432

    # -- Spark-native surface ----------------------------------------------
    @property
    def particles(self) -> DataFrame:
        return (
            store_mod.read_table(self._file.spark, self._file.path, "particles")
            .where(F.col("process") == self.key)
        )

    df = particles

    @property
    def events(self) -> DataFrame:
        return (
            store_mod.read_table(self._file.spark, self._file.path, "events")
            .where(F.col("process") == self.key)
        )

    @property
    def edges(self) -> DataFrame:
        from heparchy_spark.schemas import EDGES_SCHEMA

        if not Path(store_mod.table_path(self._file.path, "edges")).exists():
            # a store whose events carry no DAG — empty, schema-stable
            return self._file.spark.createDataFrame([], schema=EDGES_SCHEMA)
        return (
            store_mod.read_table(self._file.spark, self._file.path, "edges")
            .where(F.col("process") == self.key)
        )

    # -- typed metadata getters (read/hdf.py:473-501) ----------------------
    @property
    def process_string(self) -> str:
        return self._meta["process_string"]

    @property
    def string(self) -> str:
        warnings.warn(
            "string is deprecated; use process_string", DeprecationWarning
        )
        return self.process_string

    @property
    def decay(self) -> dict[str, np.ndarray]:
        """Deprecated in/out PDG dict (``read/hdf.py:482-485``): reads
        ``in_pcls``/``out_pcls`` from process custom metadata."""
        warnings.warn(
            "decay is deprecated; use custom_meta['in_pcls'/'out_pcls']",
            DeprecationWarning,
        )
        return {
            k: np.asarray(self.custom_meta[k], dtype="int32")
            for k in ("in_pcls", "out_pcls")
        }

    def read_event(self, evt_num: int) -> HepEventReader:
        """Deprecated point-lookup alias (``read/hdf.py:468-471``)."""
        warnings.warn("read_event is deprecated; use proc[n]", DeprecationWarning)
        return self[evt_num]

    @property
    def signal_pdgs(self) -> np.ndarray:
        return np.asarray(self._meta["signal_pdgs"], dtype="int32")

    @property
    def com_energy(self) -> tuple[float, str]:
        """(energy, unit) tuple — reference shape (``read/hdf.py:491-496``)."""
        return (self._meta["com_e"], self._meta["e_unit"])

    @property
    def custom_meta(self) -> MapReader:
        meta = self._meta.get("custom_meta") or {}
        return MapReader(lambda: tuple(meta), lambda k: json.loads(meta[k]))

    @property
    def meta(self) -> dict:
        return dict(self._meta)

    # -- cardinality / access paths ---------------------------------------
    def __len__(self) -> int:
        """Event count from process metadata, no scan (``read/hdf.py:444-445``)."""
        return int(self._meta["num_evts"])

    def __getitem__(self, evt_num: int) -> HepEventReader:
        """Point lookup (``read/hdf.py:454-466``): rebinds the shared cursor;
        the chunk_id filter prunes to one partition directory (P3)."""
        if evt_num < 0:
            evt_num += len(self)
        if not 0 <= evt_num < len(self):
            raise IndexError(f"event {evt_num} out of range [0, {len(self)})")
        self._evt._bind(evt_num)
        return self._evt

    # 1e7 longs ~ 80 MB driver-side — generous for the facade's
    # interactive use, loud long before a corpus-scale collect.
    _EVENT_IDS_CAP = 10_000_000

    def event_ids(self, max_ids: int | None = None) -> list[int]:
        """Numeric event-id order — the sanctioned explicit-order path
        (``read/hdf.py:426-428``).

        BOUNDED: refuses to collect more than ``max_ids`` (default
        ``_EVENT_IDS_CAP``) ids — ``len(self)`` is metadata-only, so the
        guard costs nothing, and a silent driver-side collect of a
        corpus-scale store is exactly the 100 TB failure mode.  For the
        unbounded path use :meth:`event_ids_df` and keep the ids
        distributed."""
        cap = self._EVENT_IDS_CAP if max_ids is None else max_ids
        n = len(self)
        if n > cap:
            raise ValueError(
                f"event_ids(): {n} events exceeds the driver-side cap of"
                f" {cap}; use event_ids_df() for the distributed form, or"
                " pass an explicit max_ids if you really mean to collect"
            )
        return [
            r["event_id"]
            for r in self.events.select("event_id").sort("event_id").collect()
        ]

    def event_ids_df(self) -> DataFrame:
        """Distributed (event_id)-ordered frame — the scale path behind
        :meth:`event_ids`; no driver materialization."""
        return self.events.select("event_id").sort("event_id")

    def __iter__(self) -> ty.Iterator[HepEventReader]:
        """Sequential scan; order unspecified (``read/hdf.py:419-428,447-452``).
        The single shared cursor is rebound per event — ``copy()`` to hold one."""
        it = self.events.select(
            "event_id", "num_pcls", "num_edges", "mask_keys", "custom_keys", "custom_meta"
        ).toLocalIterator()
        for row in it:
            self._evt._bind(row["event_id"], row.asDict())
            yield self._evt


class HepReader:
    """Store handle (``read/hdf.py:504-540``): context manager, process
    lookup by name, iteration over process names."""

    def __init__(self, spark: SparkSession, path: str | Path) -> None:
        self.spark = spark
        self.path = Path(path)
        if not store_mod.is_store(self.path):
            raise FileNotFoundError(f"{self.path} is not a heparchy store")
        marker = store_mod.read_marker(self.path)
        self.evts_per_chunk = int(marker.get("evts_per_chunk", 1000))

    def __enter__(self) -> "HepReader":
        return self

    def __exit__(self, exc_type, exc_value, exc_tb) -> None:
        return None

    def __getitem__(self, key: str) -> HepProcessReader:
        return HepProcessReader(self, key)

    def keys(self) -> list[str]:
        return [
            r["process"]
            for r in store_mod.read_table(self.spark, self.path, "processes")
            .select("process")
            .collect()
        ]

    def __iter__(self) -> ty.Iterator[str]:
        return iter(self.keys())
