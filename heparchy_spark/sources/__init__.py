"""Sources/sinks: the Parquet hep-store, reader/writer facades, the HDF5
bridge, the native HepMC connector, and the snapshot-manifest table layer
(SURVEY.md §2.1 / §2.14)."""

from heparchy_spark.sources.matview import MaterializedAggregate
from heparchy_spark.sources.reader import (
    HepEventReader,
    HepProcessReader,
    HepReader,
    MapReader,
)
from heparchy_spark.sources.snapshot import (
    SnapshotConflict,
    SnapshotTable,
    snapshot_sink,
)
from heparchy_spark.sources.writer import (
    Compression,
    HepEventWriter,
    HepProcessWriter,
    HepWriter,
    MapWriter,
)

__all__ = [
    "HepReader",
    "HepProcessReader",
    "HepEventReader",
    "MapReader",
    "HepWriter",
    "HepProcessWriter",
    "HepEventWriter",
    "MapWriter",
    "Compression",
    "SnapshotTable",
    "SnapshotConflict",
    "snapshot_sink",
    "MaterializedAggregate",
]
