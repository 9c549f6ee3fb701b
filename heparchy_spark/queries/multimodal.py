"""Multimodal-column queries over the ``documents`` table.

No driver table carries real media, so the corpus builds deterministic
binary payloads from document text — a format magic prefix (chosen by
doc_id) + the UTF-8 bytes — identically in Spark and DuckDB, then runs the
multimodal operators on them. Format sniffing + byte length are
hash-checked against a portable-SQL oracle; every mapInPandas path
(entropy, decode, frame fan-out, embedding) hash-checks against
plain-Python expected-value fixtures (tools/build_expected.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from heparchy_spark.operators.multimodal import (
    byte_stats,
    decode_media,
    payload_embedding,
    sample_frames,
    sniff_format,
)
from heparchy_spark.queries import expected_fixture_sql, register
from heparchy_spark.queries.tables import load

_MAGICS = ["89504E47", "FFD8FFE0", "52494646", "1A45DFA3"]  # png jpeg riff mkv
_KINDS = ["image", "image", "audio", "video"]


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic media table (media_id, kind, payload)."""
    docs = load(spark, sf_dir, "documents")
    magic = F.element_at(
        F.array(*[F.lit(m) for m in _MAGICS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.unhex(magic), F.encode("text", "utf-8")).alias("payload"),
    )


_MAGIC_SQL_CASE = (
    "CASE doc_id % 4 "
    + " ".join(
        f"WHEN {i} THEN from_hex('{m}')" for i, m in enumerate(_MAGICS)
    )
    + " END"
)


@register(
    "multimodal_sniff_profile",
    f"""
    SELECT doc_id AS media_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                           WHEN 2 THEN 'riff' WHEN 3 THEN 'matroska' END
             AS format,
           octet_length({_MAGIC_SQL_CASE} || encode(text)) AS n_bytes
    FROM documents
    """,
    doc="Binary payload profiling JVM-side: magic-byte format sniffing + "
    "byte length, no Python, payload column pruned to 4 bytes for the sniff.",
)
def multimodal_sniff_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_df(spark, sf_dir)
    return media.select(
        "media_id",
        sniff_format("payload").alias("format"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


@register(
    "multimodal_crc32",
    expected_fixture_sql("multimodal_crc32"),
    doc="JVM-side CRC32 content checksum per payload (exact-dup primitive "
    "for binary columns); oracle = stdlib zlib.crc32, precomputed.",
)
def multimodal_crc32(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_df(spark, sf_dir)
    return media.select("media_id", F.crc32("payload").alias("crc32"))


@register(
    "multimodal_byte_stats",
    expected_fixture_sql("multimodal_byte_stats"),
    doc="Arrow-batched mapInPandas byte statistics: length, Shannon "
    "entropy, CRC32 per payload; oracle = plain-Python/NumPy mirror, "
    "precomputed.",
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_stats(_media_df(spark, sf_dir))


@register(
    "multimodal_decode_meta",
    expected_fixture_sql("multimodal_decode_meta"),
    doc="Decoded media properties via real mapInPandas plumbing: stdlib "
    "PNG/WAV decode where the container allows, labeled deterministic "
    "fake elsewhere (corpus payloads all take the fake path); oracle = "
    "plain-Python mirror of the fake decoder, precomputed.",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(_media_df(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    expected_fixture_sql("multimodal_frame_sample"),
    doc="Video frame sampling fan-out: one row per sampled frame via "
    "mapInPandas (stub frame extraction, real 1->N batch shape); oracle = "
    "plain-Python mirror of the fan-out, precomputed.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_df(spark, sf_dir).where(F.col("kind") == "video")
    return sample_frames(media, every_n=60).select(
        "media_id", "frame_idx", F.length("frame_payload").alias("frame_bytes")
    )


@register(
    "multimodal_payload_embedding",
    expected_fixture_sql("multimodal_payload_embedding"),
    doc="Byte-histogram content embedding (real, not stubbed) — feeds the "
    "similarity operators; oracle = plain-Python/NumPy mirror, precomputed.",
)
def multimodal_payload_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = payload_embedding(_media_df(spark, sf_dir), dim=16)
    return emb.select(
        "media_id", F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x), 6).alias("embedding_sum")
    )
