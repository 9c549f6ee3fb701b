"""Multimodal operator tests: real byte-level ops checked against Python
ground truth; stubbed decode checked for plumbing shape + determinism."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from heparchy_spark.operators.multimodal import (
    byte_stats,
    decode_media,
    payload_embedding,
    sample_frames,
    sniff_format,
)

PAYLOADS = [
    (0, "image", b"\x89PNG\r\n\x1a\nrest-of-png"),
    (1, "image", b"\xff\xd8\xff\xe0JFIFdata"),
    (2, "audio", b"RIFF....WAVEfmt data-bytes-here"),
    (3, "video", b"\x1a\x45\xdf\xa3matroska-payload" * 40),
    (4, "image", b"plainbytes-no-magic"),
    (5, "audio", b""),
]


@pytest.fixture(scope="module")
def media(spark):
    from heparchy_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [(i, k, p, None) for i, k, p in PAYLOADS]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_sniff_format(media):
    got = {
        r["media_id"]: r["fmt"]
        for r in media.select("media_id", sniff_format("payload").alias("fmt")).collect()
    }
    assert got == {
        0: "png", 1: "jpeg", 2: "riff", 3: "matroska", 4: "unknown", 5: "unknown"
    }


def test_byte_stats_exact(media):
    got = {r["media_id"]: r for r in byte_stats(media).collect()}
    for mid, _, payload in PAYLOADS:
        assert got[mid]["n_bytes"] == len(payload)
        assert got[mid]["crc32"] == zlib.crc32(payload)
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size:
            c = np.bincount(arr, minlength=256)
            p = c[c > 0] / arr.size
            assert got[mid]["entropy"] == pytest.approx(-(p * np.log2(p)).sum())
        else:
            assert got[mid]["entropy"] == 0.0


def test_decode_media_deterministic_and_shaped(media):
    a = {r["media_id"]: r.asDict() for r in decode_media(media).collect()}
    b = {r["media_id"]: r.asDict() for r in decode_media(media).collect()}
    assert a == b  # deterministic fake
    assert a[2]["sample_rate"] in (8000, 16000, 44100)  # audio fields
    assert a[0]["width"] is not None and a[0]["channels"] == 3  # image fields


def test_sample_frames_fanout(media):
    video = media.where("kind = 'video'")
    frames = sample_frames(video, every_n=24).collect()
    assert len(frames) > 1  # 1 -> N fan-out
    assert all(r["media_id"] == 3 for r in frames)
    idxs = [r["frame_idx"] for r in frames]
    assert idxs == sorted(idxs) and idxs[0] == 0


def test_payload_embedding_normalized(media):
    rows = payload_embedding(media, dim=16).collect()
    by_id = {r["media_id"]: np.array(r["embedding"]) for r in rows}
    for mid, _, payload in PAYLOADS:
        v = by_id[mid]
        assert len(v) == 16
        if payload:
            assert np.linalg.norm(v) == pytest.approx(1.0, rel=1e-5)
