"""Streaming ingest — the ``event_iter`` analog.

The reference wraps a generator and commits one event per context exit
(``write/hdf.py:493-516,257-266``). The Spark-native equivalent is a file
(or Kafka) stream feeding an incremental append into the same partitioned
layout the batch writer uses; exactly-once comes from checkpointing + the
sink's idempotent file commit instead of per-event HDF5 group commits.
"""

from __future__ import annotations

import typing as ty

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

__all__ = [
    "dedup_append_batch",
    "EVENT_STREAM_SCHEMA",
    "read_event_stream",
    "stream_to_store",
    "stream_dedup_ingest",
]

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


def dedup_append_batch(
    batch: DataFrame,
    content_col: str,
    id_col: str,
    dest: str,
    sidecar: str,
    partition_by: list[str] | None = None,
) -> None:
    """One micro-batch of dedup-at-ingest: in-batch first-id-wins dedup,
    anti-join vs the hash sidecar, append data + surviving hashes.
    Shared by ``stream_dedup_ingest`` and ``stream_corpus_pipeline``."""
    spark = batch.sparkSession
    hashed = batch.withColumn("__ch", F.sha2(F.col(content_col), 256))
    w = Window.partitionBy("__ch").orderBy(id_col)
    first = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    try:
        seen = spark.read.parquet(sidecar).select("__ch")
        first = first.join(seen, "__ch", "left_anti")
    except AnalysisException:
        pass  # first batch: no sidecar yet
    fresh = first.persist()
    try:
        data = fresh.drop("__ch").write.mode("append")
        if partition_by:
            data = data.partitionBy(*partition_by)
        data.parquet(dest)
        fresh.select("__ch").write.mode("append").parquet(sidecar)
    finally:
        fresh.unpersist()


def stream_dedup_ingest(
    stream_df: DataFrame,
    content_col: str,
    id_col: str,
    dest: str,
    checkpoint: str,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Dedup-at-ingest: append only never-before-seen content to the store.

    The streaming twin of ``operators.dedup.incremental_exact_dedup``: each
    micro-batch is (1) deduplicated within itself (first id wins per
    content hash), (2) anti-joined against the compact hash sidecar of
    everything already ingested, and (3) appended — data rows to ``dest``,
    surviving hashes to the ``<dest>_hashes`` sidecar.

    Scale shape: the sidecar holds one 64-hex-char hash per corpus row —
    ~1/1000th the bytes of a text corpus — and is the only state re-read
    per batch; hash keys are uniform so the anti-join shuffle is skew-free.
    At very large corpora, bucket the sidecar by hash so the join
    co-locates without shuffling the sidecar each batch.

    Consistency: ``foreachBatch`` is at-least-once — a batch retried after
    writing data but before its hashes commit could append duplicates.
    The batch operator is the backstop (re-runnable compaction); a
    transactional table format would close the gap, but plain Parquet has
    no multi-table commit.
    """
    sidecar = dest.rstrip("/") + "_hashes"

    def process(batch: DataFrame, batch_id: int) -> None:
        dedup_append_batch(batch, content_col, id_col, dest, sidecar)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
