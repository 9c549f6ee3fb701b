"""Streaming ingest — the ``event_iter`` analog.

The reference wraps a generator and commits one event per context exit
(``write/hdf.py:493-516,257-266``). The Spark-native equivalent is a file
(or Kafka) stream feeding an incremental append into the same partitioned
layout the batch writer uses; exactly-once comes from checkpointing + the
sink's idempotent file commit instead of per-event HDF5 group commits.
"""

from __future__ import annotations

import typing as ty

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

__all__ = ["EVENT_STREAM_SCHEMA", "read_event_stream", "stream_to_store"]

# The driver's events-table shape (TESTDATA.md) — the stream vehicle.
EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType = EVENT_STREAM_SCHEMA,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded reader over a landing directory. File streams require an
    explicit schema (no inference race); ``maxFilesPerTrigger`` bounds
    per-micro-batch work at scale."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def stream_to_store(
    stream_df: DataFrame,
    dest: str,
    checkpoint: str,
    partition_by: ty.Sequence[str] = (),
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Append the stream into a partitioned Parquet sink — the persistent-
    ingest half of ``event_iter``. Checkpoint + file-sink manifest give
    exactly-once; partition columns mirror the batch store layout."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
