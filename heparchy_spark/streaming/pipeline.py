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

__all__ = [
    "corpus_gates",
    "stream_corpus_pipeline",
    "stream_corpus_pipeline_txn",
    "streaming_url_dedup_ingest",
]


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


def stream_corpus_pipeline_txn(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    table,
    checkpoint: str,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    n_shards: int = 8,
    trigger_available_now: bool = True,
    batch_gate_fn=None,
) -> StreamingQuery:
    """The transactional corpus pipeline: gates -> exact cross-corpus
    dedup -> EXACTLY-ONCE snapshot commit per micro-batch.

    ``batch_gate_fn`` (optional, ``DataFrame -> DataFrame``) runs INSIDE
    each micro-batch, where aggregates and joins are plain batch ops --
    the hook for model-based gating (e.g. scoring the batch with the
    trained ``operators/classifier.py`` quality filter and keeping
    ``keep`` rows), which cannot run on the unbounded stream frame (a
    streaming groupBy would be a stateful aggregate, not a gate).  The
    stateless heuristic gates stay on the stream side where they prune
    before the batch even forms.  A batch whose rows all gate away still
    banks its batch-id token, exactly like a fully-deduped batch.

    Differences from ``stream_corpus_pipeline`` (plain append + hash
    sidecar, at-least-once on the landing dir):

    * ``table`` is a ``SnapshotTable`` — each batch is one atomic
      manifest commit keyed by the micro-batch id, so task retries and
      foreachBatch replays cannot double-land documents
      (``commit_batch_once``);
    * the dedup reference is the table ITSELF: the batch anti-joins the
      corpus' ``__h`` content-hash COLUMN (Parquet column pruning reads
      just that column — same scan bytes as the sidecar, none of its
      consistency burden: hashes and rows are one atomic commit by
      construction);
    * a batch whose rows all dedup away still commits an empty version,
      banking the batch-id token — replay safety does not depend on the
      batch having survivors.

    Scale: gates are scan-side projections; the anti-join shuffles the
    (uniform) hash key; the per-batch corpus re-read is the hash column
    only. At very large corpora swap the dedup reference for a bucketed
    hash projection maintained by OPTIMIZE — the commit protocol is
    unchanged.
    """
    from heparchy_spark.sources.snapshot import commit_batch_once

    gated = corpus_gates(
        stream_df, text_col, min_quality=min_quality, langs=langs,
        n_shards=n_shards,
    ).withColumn("__h", F.sha2(F.col(text_col), 256))

    def process(batch: DataFrame, batch_id: int) -> None:
        last = table.latest_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed batch: already committed
        b = batch.dropDuplicates(["__h"])  # within-batch exact dedup
        if batch_gate_fn is not None:
            b = batch_gate_fn(b)
        if table.latest_version() > 0:
            seen = table.read().select("__h")
            b = b.join(seen, "__h", "left_anti")  # cross-corpus dedup
        # joins reorder columns; keep the table's file layout stable
        commit_batch_once(table, b.select(*batch.columns), batch_id)

    writer = (
        gated.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_url_dedup_ingest(
    stream_df: DataFrame,
    url_col: str,
    id_col: str,
    table,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of ``web_url_dedup_canonical``'s keep-decision: the
    CHEAPEST ingest gate of a web pipeline — canonicalize the URL
    (``operators.web.normalize_url``: case-fold, default-port strip,
    fragment drop, utm_* removal) and land only the FIRST crawl per
    canonical URL, exactly once (one atomic snapshot commit per
    micro-batch, replays recognized by batch id and skipped — same
    commit protocol as the content-hash txn pipeline, but keying on the
    canonical URL so a re-crawled page is dropped WITHOUT reading its
    body: this gate runs before content hashing, quality scoring or any
    text processing).

    "First" = arrival order across micro-batches (crawl order), min
    ``id_col`` within a batch (deterministic under replay).  With
    id-ordered arrival the union of committed batches equals the batch
    operator's min-id-wins keep set — the twin-equality pytest contract.

    Scale shape per micro-batch: canonicalization is a scan-side
    regexp projection (whole-stage codegen, no UDF); the within-batch
    first-crawl pick is one window over the batch (bounded); the
    cross-corpus check anti-joins the table's ``__url_norm`` COLUMN
    (Parquet column pruning — canonical URLs are ~1/1000th of page
    bytes, and the key is a hash-uniform string so the shuffle is
    skew-free).  At very large corpora swap the reference for a
    bucketed url_norm projection maintained by OPTIMIZE — the commit
    protocol is unchanged.
    """
    from pyspark.sql import Window

    from heparchy_spark.operators.web import normalize_url
    from heparchy_spark.sources.snapshot import commit_batch_once

    tagged = stream_df.withColumn("__url_norm", normalize_url(url_col))

    def process(batch: DataFrame, batch_id: int) -> None:
        last = table.latest_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed batch: already committed
        # within-batch first-crawl-wins (min id per canonical URL)
        w = Window.partitionBy("__url_norm").orderBy(id_col)
        b = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if table.latest_version() > 0:
            seen = table.read().select("__url_norm")
            b = b.join(seen, "__url_norm", "left_anti")
        # joins reorder columns; keep the table's file layout stable
        commit_batch_once(table, b.select(*batch.columns), batch_id)

    writer = (
        tagged.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_domain_cap_ingest(
    stream_df: DataFrame,
    host_col: str,
    id_col: str,
    table,
    checkpoint: str,
    cap: int = 20,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Per-registered-domain document cap at ingest: land at most ``cap``
    documents per PSL registrable domain (``operators.web.url_domain``),
    first-arrival-wins, exactly once.

    Policy note (vs the batch ``web_domain_cap_sample``): the batch cap
    ranks quality-passers first then content-hash order — a GLOBAL view
    a micro-batch cannot have.  The ingest-time policy is arrival-order
    (min ``id_col`` within a batch, batch order across batches): it
    bounds a boilerplate mega-domain's footprint the moment it floods
    in, and the quality-ranked re-cap runs as the periodic batch
    compaction over the landed shards — the same split every global
    stage of the corpus pipeline uses.

    Scale shape per micro-batch: domain extraction is a scan-side
    projection (PSL InSet probe, no join); the in-batch pick is one
    window partitioned by domain; the only state re-read is the landed
    table's ``__domain`` COLUMN (column-pruned) folded to per-domain
    counts — at very large corpora that fold is a counts sidecar
    maintained at commit time, same contract as the hash/band sidecars.
    A domain's remaining budget (cap - landed) joins back on the
    (uniform-by-hash) domain key.
    """
    from pyspark.sql import Window

    from heparchy_spark.operators.web import url_domain
    from heparchy_spark.sources.snapshot import commit_batch_once

    tagged = stream_df.withColumn(
        "__domain",
        url_domain(F.concat(F.lit("https://"), F.col(host_col))),
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        last = table.latest_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed batch: already committed
        w = Window.partitionBy("__domain").orderBy(id_col)
        ranked = batch.withColumn("__rn", F.row_number().over(w))
        if table.latest_version() > 0:
            landed = (
                table.read()
                .groupBy("__domain")
                .agg(F.count(F.lit(1)).alias("__landed"))
            )
            ranked = ranked.join(landed, "__domain", "left").withColumn(
                "__landed", F.coalesce("__landed", F.lit(0))
            )
        else:
            ranked = ranked.withColumn("__landed", F.lit(0))
        b = ranked.where(
            F.col("__rn") + F.col("__landed") <= F.lit(cap)
        ).drop("__rn", "__landed")
        # joins reorder columns; keep the table's file layout stable
        commit_batch_once(table, b.select(*batch.columns), batch_id)

    writer = (
        tagged.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_ivf_ingest(
    new_stream: DataFrame,
    seen_df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids,
    table,
    checkpoint: str,
    threshold: float = 0.95,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of ``operators.similarity.incremental_ivf_assign``:
    new embeddings stream in, each micro-batch is assigned against the
    BROADCAST centroid codebook and screened for near-duplicates of the
    already-ingested ``seen_df`` corpus, and the per-vector verdict rows
    (id, cluster, dist2, n_cell_seen, best_seen_id, best_cosine,
    is_near_dup) land EXACTLY ONCE as one atomic snapshot commit per
    micro-batch (``commit_batch_once`` — replays are recognized by
    batch id and skipped).

    Twin contract: with a static ``seen_df``, the union of all committed
    micro-batch outputs equals the batch operator run once over the full
    new set — bit-for-bit, because assignment/dist2/cosine reuse the
    same grid-rounded kernels and each new vector's verdict depends only
    on (vector, centroids, seen corpus), never on other new vectors.

    Scale shape: the centroid matmul is a pure map over the batch (k x
    dim doubles in the task closure); the near-dup screen is the
    cluster-bounded equi-join of the batch operator — candidates ~
    |batch| x cell occupancy.  The seen side's (id, cluster) assignment
    is recomputed per micro-batch HERE (self-contained API); a
    production deployment persists it as a cluster-bucketed sidecar
    written at ingest and refreshes the codebook on the cadence
    documented in SCALE.md (centroids drift slowly; re-assignment of
    the seen side is only needed when the codebook version changes).
    """
    from heparchy_spark.operators.similarity import incremental_ivf_assign
    from heparchy_spark.sources.snapshot import commit_batch_once

    def process(batch: DataFrame, batch_id: int) -> None:
        last = table.latest_batch_id()
        if last is not None and batch_id <= last:
            return  # replayed batch: already committed
        verdicts = incremental_ivf_assign(
            batch, seen_df, vec_col, id_col, centroids, threshold=threshold
        )
        # a batch with no rows still banks its batch-id token
        commit_batch_once(table, verdicts, batch_id)

    writer = (
        new_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
