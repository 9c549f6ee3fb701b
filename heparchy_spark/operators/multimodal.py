"""Multimodal columns: opaque ``binary`` payloads + typed metadata
(SURVEY.md §2.12 / BASELINE north star).

Design: media travels as an opaque ``BinaryType`` column beside a typed
metadata struct; every byte-level operator (format sniffing, size, entropy,
histograms, chunked fingerprints) is REAL and runs either JVM-side (column
algebra) or as Arrow-batched ``mapInPandas``. The pixel/sample *decode*
step needs codec libraries that are not in this environment, so it is
STUBBED: ``decode_media`` uses a clearly-marked deterministic fake decoder
(seeded from the payload bytes) behind the real Spark plumbing — schema,
batching, partitioning, and UDF signatures are production-shaped, and a
real decoder drops in by replacing ``_fake_decode`` only.

At 100 TB: payloads dominate bytes; operators that don't need payload bytes
must never read them (column pruning does this for free since the payload
is its own Parquet column), and mapInPandas batch sizes are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep Arrow buffers in
executor memory.
"""

from __future__ import annotations

import typing as ty
import zlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_META_SCHEMA",
    "sniff_format",
    "byte_stats",
    "decode_media",
    "sample_frames",
    "payload_embedding",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

_MAGIC = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("664C6143", "flac"),
    ("1A45DFA3", "matroska"),
    ("00000018", "mp4"),
    ("00000020", "mp4"),
]


def sniff_format(payload: Column | str) -> Column:
    """Container format from magic bytes — pure column algebra (JVM-side),
    reads only the first 4 payload bytes per row."""
    p = F.col(payload) if isinstance(payload, str) else payload
    head = F.upper(F.hex(F.substring(p, 1, 4)))
    expr: Column = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        expr = F.when(head.startswith(magic.upper()), F.lit(name)).otherwise(expr)
    return expr


_BYTE_STATS_FIELDS = [
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("entropy", T.DoubleType(), False),
    T.StructField("crc32", T.LongType(), False),
]


def byte_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL payload statistics via Arrow-batched ``mapInPandas``:
    byte length, Shannon entropy of the byte histogram, CRC32."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False), *_BYTE_STATS_FIELDS]
    )

    def stats(batches: ty.Iterator[pd.DataFrame]) -> ty.Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_bytes, entropy, crc = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(buf, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256) if arr.size else np.zeros(1)
                p = counts[counts > 0] / max(arr.size, 1)
                ids.append(mid)
                n_bytes.append(len(buf))
                entropy.append(float(-(p * np.log2(p)).sum()) if arr.size else 0.0)
                crc.append(zlib.crc32(buf))
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": n_bytes, "entropy": entropy, "crc32": crc}
            )

    return df.select(id_col, payload_col).mapInPandas(stats, schema=out_schema)


# ---------------------------------------------------------------------------
# STUBBED DECODE — deterministic fake.
# A real deployment replaces _fake_decode with PIL/ffmpeg/soundfile calls;
# everything around it (schemas, batching, partitioning) is final.
# ---------------------------------------------------------------------------
def _fake_decode(payload: bytes, kind: str) -> dict:
    """DETERMINISTIC FAKE decoder: derives plausible media properties from
    a seeded hash of the payload — NOT a real codec."""
    h = zlib.crc32(payload) if payload else 0
    rng = np.random.default_rng(h)
    if kind == "audio":
        return {
            "width": None,
            "height": None,
            "channels": int(1 + h % 2),
            "sample_rate": int([8000, 16000, 44100][h % 3]),
            "n_frames": int(1000 + h % 9000),
            "mean_amplitude": float(rng.uniform(0.01, 0.5)),
        }
    w, hh = int(16 + h % 1024), int(16 + (h >> 10) % 1024)
    return {
        "width": w,
        "height": hh,
        "channels": 3,
        "sample_rate": None,
        "n_frames": 1 if kind == "image" else int(24 * (1 + h % 300)),
        "mean_amplitude": float(rng.uniform(0.0, 1.0)),
    }


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("mean_amplitude", T.DoubleType(), True),
    ]
)


def decode_media(
    df: DataFrame, payload_col: str = "payload", kind_col: str = "kind"
) -> DataFrame:
    """Decode payloads to per-media properties. Plumbing is real
    (mapInPandas, Arrow batches, schema); the decoder is the deterministic
    fake above — see module docstring."""

    def decode(batches: ty.Iterator[pd.DataFrame]) -> ty.Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf[kind_col], pdf[payload_col]
            ):
                d = _fake_decode(bytes(payload or b""), kind)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "sample_rate": d["sample_rate"],
                        "n_frames": d["n_frames"],
                        "mean_amplitude": d["mean_amplitude"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", kind_col, payload_col).mapInPandas(
        decode, schema=DECODED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 24, payload_col: str = "payload"
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame.
    Frame *extraction* is stubbed (slices of the raw payload stand in for
    decoded frames); the fan-out shape — one input row → many output rows
    through mapInPandas — is the real thing."""

    def frames(batches: ty.Iterator[pd.DataFrame]) -> ty.Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                buf = bytes(payload or b"")
                n_frames = _fake_decode(buf, "video")["n_frames"]
                step = max(len(buf) // max(n_frames, 1), 1)
                for fi in range(0, n_frames, every_n):
                    off = (fi * step) % max(len(buf), 1)
                    ids.append(mid)
                    idxs.append(fi)
                    payloads.append(buf[off : off + step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.select("media_id", payload_col).mapInPandas(frames, schema=FRAMES_SCHEMA)


def payload_embedding(
    df: DataFrame, dim: int = 16, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL byte-level feature vector (not a stub): L2-normalized histogram
    of byte values folded into ``dim`` buckets — a cheap content signature
    usable by the similarity operators downstream."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )

    def embed(batches: ty.Iterator[pd.DataFrame]) -> ty.Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                norm = np.linalg.norm(hist)
                vecs.append((hist / norm if norm else hist).astype("float32").tolist())
                ids.append(mid)
            yield pd.DataFrame({id_col: ids, "embedding": vecs})

    return df.select(id_col, payload_col).mapInPandas(embed, schema=out_schema)
