"""``spark.read.format("hepmc")`` — a native connector for HepMC3 ASCII
built on the PySpark 4 Python DataSource API.

Where ``ingest_hepmc`` (``hepmc.py``) is a mapInPandas pipeline the
caller assembles, this registers the same public-format parser as a
first-class source: planning returns one ``InputPartition`` PER FILE
(file-parallel scan, exactly the split unit the format allows — events
cannot straddle files, and the ASCII framing has no intra-file split
points), and executors stream-parse their file without materializing it.
Registration is per-session and pickles the reader class to executors —
pure-Python, no JVM extension point needed; this is the PySpark-4-native
way to add a format.

Column pruning/pushdown do NOT reach Python data sources (the API hands
the full schema to ``read``); for column-pruned analytical access,
ingest once to the Parquet-backed hep-store and let Catalyst prune
there.  This source is the INGEST edge, not the serving layer.

Event ids are globalized exactly like ``ingest_hepmc``: per-file base
``file_ord * 2^32 + in-file id`` so multi-file loads never collide; the
raw id stays in ``file_event_id``.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.types as T
from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from heparchy_spark.sources.hepmc import parse_hepmc_ascii

__all__ = ["HepMCDataSource", "register_hepmc_source", "HEPMC_SOURCE_SCHEMA"]

HEPMC_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("file_event_id", T.LongType(), False),
        T.StructField("file_ord", T.IntegerType(), False),
        T.StructField("pcl_id", T.IntegerType(), False),
        T.StructField("px", T.DoubleType(), True),
        T.StructField("py", T.DoubleType(), True),
        T.StructField("pz", T.DoubleType(), True),
        T.StructField("e", T.DoubleType(), True),
        T.StructField("mass", T.DoubleType(), True),
        T.StructField("pdg", T.IntegerType(), True),
        T.StructField("status", T.ShortType(), True),
        T.StructField("src", T.IntegerType(), True),
        T.StructField("dst", T.IntegerType(), True),
        T.StructField("mask_final", T.BooleanType(), True),
        T.StructField("e_unit", T.StringType(), True),
    ]
)

_FIELDS = [f.name for f in HEPMC_SOURCE_SCHEMA.fields]


def _expand(path: str) -> list[str]:
    """Driver-side planning listing: directory → ``*.hepmc*`` members,
    glob pattern → matches, plain path → itself.  Sorted for a stable
    ``file_ord`` assignment (ids must not depend on listing order)."""
    p = Path(path)
    if p.is_dir():
        files = sorted(p.glob("*.hepmc*"))
    elif any(ch in path for ch in "*?["):
        files = sorted(p.parent.glob(p.name))
    else:
        files = [p]
    return [str(f) for f in files]


def _parse_one(path: str, ford: int):
    """Stream one file's particles as schema-ordered tuples (executor
    side, shared by the batch and stream readers)."""
    with open(path, encoding="utf-8") as fh:
        for row in parse_hepmc_ascii(fh):
            gid = ford * (1 << 32) + row["event_id"]
            yield (
                gid,
                row["event_id"],
                ford,
                row["pcl_id"],
                row["px"],
                row["py"],
                row["pz"],
                row["e"],
                row["mass"],
                row["pdg"],
                row["status"],
                row["src"],
                row["dst"],
                row["mask_final"],
                row["e_unit"],
            )


class _HepMCReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError(
                "hepmc source requires a path: spark.read.format('hepmc')"
                ".load('/path/to/file-or-dir')"
            )
        self._files = _expand(path)
        if not self._files:
            raise ValueError(f"hepmc source: no files match {path!r}")

    def partitions(self) -> list[InputPartition]:
        # one partition per file — the format's natural split unit
        return [
            InputPartition((f, i)) for i, f in enumerate(self._files)
        ]

    def read(self, partition: InputPartition):
        yield from _parse_one(*partition.value)


class _HepMCStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("hepmc")`` — micro-batches of newly
    arrived HepMC files (the generator-drop ingest pattern; pairs with
    ``snapshot_sink`` for an exactly-once file→table pipeline).

    Offsets carry the set of files already assigned, so each file is
    read exactly once even across restarts (the engine replays
    ``partitions(start, end)`` deterministically from checkpointed
    offsets).  ``file_ord`` is the file's rank in the end offset's
    sorted listing, globally disambiguated by the same 2^32 base as the
    batch reader.  Contract: drop files with monotonically sorting
    names (``part-00001`` style, the standard drop-dir convention) — a
    late file whose name sorts BEFORE already-assigned ones would shift
    ranks and alias event-id namespaces.  The file list in the offset
    grows with the
    directory — fine for drop-dir scale (thousands); a production
    variant would compact acknowledged files into a watermark on
    ``commit``, exactly like the built-in file source's log.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("hepmc stream source requires a path")
        self._path = path

    def initialOffset(self) -> dict:
        return {"assigned": []}

    def latestOffset(self) -> dict:
        return {"assigned": _expand(self._path)}

    def partitions(self, start: dict, end: dict):
        seen = set(start["assigned"])
        ordered = end["assigned"]  # sorted by _expand: stable ranks
        new = [
            (f, i) for i, f in enumerate(ordered) if f not in seen
        ]
        # offsets must advance even when empty; the engine handles an
        # empty partition list as a no-data batch
        return [InputPartition(fi) for fi in new]

    def read(self, partition: InputPartition):
        yield from _parse_one(*partition.value)

    def commit(self, end: dict) -> None:
        pass  # nothing to acknowledge: files are immutable drops


class HepMCDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hepmc"

    def schema(self) -> T.StructType:
        return HEPMC_SOURCE_SCHEMA

    def reader(self, schema: T.StructType) -> _HepMCReader:
        return _HepMCReader(self.options)

    def streamReader(self, schema: T.StructType) -> _HepMCStreamReader:
        return _HepMCStreamReader(self.options)


def register_hepmc_source(spark: SparkSession) -> None:
    """Per-session registration; after this, ``spark.read.format('hepmc')``
    resolves. Idempotent (re-registering replaces the same class)."""
    spark.dataSource.register(HepMCDataSource)
