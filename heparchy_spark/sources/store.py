"""Parquet store layout for the heparchy-spark data model.

A "hep store" is a directory holding four Parquet tables (SURVEY.md §1.6)::

    <root>/particles/   partitioned by (process, chunk_id)
    <root>/events/      partitioned by (process, chunk_id)
    <root>/edges/       partitioned by (process, chunk_id)
    <root>/processes/   tiny, unpartitioned (one row per process)
    <root>/_heparchy_store.json   layout marker + format version

The partition scheme reproduces the reference's physical grouping — process
groups (``/root/reference/heparchy/write/hdf.py:448``) and 1000-event chunk
groups (``write/hdf.py:439-445``, ``utils.py:7-14``) — as Hive partition
pruning, so a point lookup touches exactly one chunk directory (SURVEY.md P2/P3)
and counts are served from the ``events``/``processes`` metadata tables
without scanning particles (P5, mirroring ``read/hdf.py:444-445,255-260``).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession  # noqa: F401

__all__ = [
    "LAYOUT_NAME",
    "FORMAT_VERSION",
    "PARTITION_COLS",
    "TABLE_NAMES",
    "table_path",
    "marker_path",
    "write_marker",
    "read_marker",
    "is_store",
    "read_table",
    "save_table_schema",
    "schema_sidecar_path",
    "chunk_of",
    "nested_events",
]

LAYOUT_NAME = "heparchy"  # mirrors the file attr at write/hdf.py:571
FORMAT_VERSION = 1
PARTITION_COLS = ["process", "chunk_id"]
TABLE_NAMES = ("particles", "events", "edges", "processes")


def table_path(root: str | Path, name: str) -> str:
    return str(Path(root) / name)


def marker_path(root: str | Path) -> Path:
    return Path(root) / "_heparchy_store.json"


def write_marker(root: str | Path, evts_per_chunk: int) -> None:
    """Stamp layout + version, the analog of the reference's file attrs
    (``write/hdf.py:571-575``)."""
    marker_path(root).write_text(
        json.dumps(
            {
                "layout": LAYOUT_NAME,
                "version": FORMAT_VERSION,
                "evts_per_chunk": evts_per_chunk,
            }
        )
    )


def read_marker(root: str | Path) -> dict:
    return json.loads(marker_path(root).read_text())


def is_store(root: str | Path) -> bool:
    return marker_path(root).exists()


def schema_sidecar_path(root: str | Path, name: str) -> Path:
    return Path(root) / name / "_heparchy_schema.json"


def save_table_schema(root: str | Path, name: str, schema) -> None:
    """Persist (merge) the table's full Spark schema beside the data.

    The registry the reference keeps in attrs (``write/hdf.py:263-265``)
    becomes an explicit schema file: readers skip Parquet footer
    ``mergeSchema`` entirely (O(files) metadata reads at scale) and empty
    tables — e.g. a store whose events all have zero particles — stay
    readable. Merge is union-by-name, first type wins.
    """
    import pyspark.sql.types as T

    p = schema_sidecar_path(root, name)
    if p.exists():
        old = T.StructType.fromJson(json.loads(p.read_text()))
        have = {f.name for f in old.fields}
        merged = T.StructType(
            list(old.fields)
            + [f for f in schema.fields if f.name not in have]
        )
    else:
        merged = schema
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(merged.jsonValue()))


def read_table(spark: SparkSession, root: str | Path, name: str) -> DataFrame:
    """Scan one store table; Catalyst owns pruning/pushdown from here.

    With a schema sidecar (facade-written stores), the scan gets an explicit
    schema — no footer merging, and zero-file tables read as empty. Bridge-
    written stores without a sidecar fall back to ``mergeSchema`` because
    dynamic mask/custom columns may differ across chunks.
    """
    import pyspark.sql.types as T

    sidecar = schema_sidecar_path(root, name)
    if sidecar.exists():
        schema = T.StructType.fromJson(json.loads(sidecar.read_text()))
        return spark.read.schema(schema).parquet(table_path(root, name))
    return spark.read.option("mergeSchema", "true").parquet(table_path(root, name))


def chunk_of(event_id: int, evts_per_chunk: int) -> int:
    """Chunk assignment — ``chunk_idx = evt_num // evts_per_chunk``
    (``read/hdf.py:455``)."""
    return event_id // evts_per_chunk


def nested_events(particles: DataFrame) -> DataFrame:
    """Optional compact export (SURVEY.md §1.6): one row per event with the
    particle list as array<struct> — ``collect_list`` over the long format.
    The nested form is for export/interchange only; the long format remains
    the query layout (pruning/pushdown don't reach inside arrays).
    """
    import pyspark.sql.functions as F

    payload = [
        c
        for c in particles.columns
        if c not in ("process", "event_id", "chunk_id", "pcl_idx")
    ]
    return (
        particles.groupBy("process", "event_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pcl_idx", *payload))
            ).alias("particles"),
            F.count(F.lit(1)).alias("num_pcls"),
        )
    )
