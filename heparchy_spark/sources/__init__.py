"""Sources/sinks: the Parquet hep-store, reader/writer facades, and the
HDF5 bridge (SURVEY.md §2.1)."""

from heparchy_spark.sources.reader import (
    HepEventReader,
    HepProcessReader,
    HepReader,
    MapReader,
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
]
