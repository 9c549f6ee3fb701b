"""End-to-end streaming training-corpus assembly.

One structured-streaming job composing the pipeline stages that are safe
without event-time state: stateless quality/language gates (pure column
algebra — no state at all), exact dedup-at-ingest against the compact
content-hash sidecar, deterministic content-derived shard assignment,
partitioned append.  The batch twin is `queries/dataset.py
dataset_training_corpus` (filter → dedup → split → pack as one plan);
the streaming form trades the global view (no cross-corpus near-dup or
quota mixing per batch — those run as periodic batch compactions over
the landed shards) for continuous arrival-to-shard latency.

Scale shape per micro-batch: the only non-broadcast state re-read is the
hash sidecar (~1/1000th of corpus bytes, uniform keys); gates run
scan-side before anything shuffles; shard assignment is a pure
projection (content hash mod n), so output files land without a global
shuffle and shard membership is growth-stable and reproducible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from heparchy_spark.operators.text import lang_id, quality_score
from heparchy_spark.streaming.ingest import dedup_append_batch

__all__ = ["corpus_gates", "stream_corpus_pipeline"]


def corpus_gates(
    df: DataFrame,
    text_col: str,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    n_shards: int = 8,
) -> DataFrame:
    """Stateless pipeline gates + shard assignment (batch/stream agnostic):
    quality score, language gate, content-derived shard id."""
    gated = df.where(
        (quality_score(text_col) >= F.lit(min_quality))
        & lang_id(text_col).isin(*langs)
    )
    return gated.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.sha2(F.col(text_col), 256)), F.lit(n_shards)),
    )


def stream_corpus_pipeline(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    dest: str,
    checkpoint: str,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    n_shards: int = 8,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Documents stream -> quality/lang gates -> dedup-at-ingest ->
    shard-partitioned append.  Output lands under ``dest/shard=K/``;
    content hashes accumulate in the ``<dest>_hashes`` sidecar."""
    gated = corpus_gates(
        stream_df, text_col, min_quality=min_quality, langs=langs,
        n_shards=n_shards,
    )
    sidecar = dest.rstrip("/") + "_hashes"

    def process(batch: DataFrame, batch_id: int) -> None:
        dedup_append_batch(
            batch, text_col, id_col, dest, sidecar, partition_by=["shard"]
        )

    writer = (
        gated.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
