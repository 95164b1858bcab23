"""Multimodal resize + audio feature extraction (brief §multimodal:
decode / feature-extract / RESIZE / frame-sample — the Spark plumbing
is real; codec calls are deterministic stubs; the WAV header parse is
real byte math)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.multimodal import (
    extract_audio_features,
    parse_wav_header,
    resize_images,
)


def _wav(sample_rate=16000, n_channels=1, n_samples=8000, bits=16):
    """A canonical little PCM WAV, built by hand — no codec library."""
    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_wav_header_real_math():
    sr, ch, dur = parse_wav_header(_wav(16000, 1, 8000))
    assert (sr, ch) == (16000, 1)
    assert abs(dur - 0.5) < 1e-9  # 8000 samples at 16 kHz
    sr, ch, dur = parse_wav_header(_wav(44100, 2, 44100))
    assert (sr, ch, round(dur, 6)) == (44100, 2, 1.0)
    assert parse_wav_header(b"not a wav") is None
    assert parse_wav_header(b"RIFF\x00\x00\x00\x00JUNK") is None


def test_extract_audio_features(spark):
    rows = [
        (1, _wav(16000, 1, 16000)),
        (2, _wav(8000, 2, 4000)),
        (3, b"ID3garbage-mp3-ish"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert got[1]["format"] == "riff"
    assert got[1]["sample_rate"] == 16000 and got[1]["duration_s"] == 1.0
    assert got[2]["n_channels"] == 2 and got[2]["duration_s"] == 0.5
    # non-WAV still yields deterministic features, header fields zeroed
    assert got[3]["format"] == "mp3" and got[3]["sample_rate"] == 0
    assert len(got[3]["features"]) == 16
    assert all(-1.0 <= x <= 1.0 for x in got[3]["features"])
    assert got[4]["decode_ok"] is False and got[4]["features"] == []
    # determinism: same bytes -> same vector
    again = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert again[3]["features"] == got[3]["features"]


def test_resize_images_stub_plumbing(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\nfakepixels"), (2, None)],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in resize_images(df, 32, 16).collect()}
    assert out[1]["resize_ok"] and len(out[1]["payload"]) == 32 * 16
    assert out[1]["width"] == 32 and out[1]["height"] == 16
    assert out[2]["resize_ok"] is False and out[2]["payload"] == b""
    # deterministic and size-keyed
    again = {r["doc_id"]: r for r in resize_images(df, 32, 16).collect()}
    assert again[1]["payload"] == out[1]["payload"]
    other = {r["doc_id"]: r for r in resize_images(df, 16, 16).collect()}
    assert other[1]["payload"] != out[1]["payload"][: 16 * 16]
    with pytest.raises(ValueError, match="positive"):
        resize_images(df, 0, 16)


def test_audio_features_feed_ann_operators(spark):
    """The fixed-length vectors slot straight into the embedding
    near-dup path — the composition the features exist for."""
    from flink_table_store_spark.datapipe.dedup import (
        embedding_near_dup_pairs,
    )

    wav = _wav(16000, 1, 1000)
    df = spark.createDataFrame(
        [(1, wav), (2, wav), (3, _wav(22050, 1, 999))],
        "doc_id bigint, payload binary",
    )
    feats = extract_audio_features(df).select(
        "doc_id", F.col("features").alias("embedding")
    )
    pairs = embedding_near_dup_pairs(
        feats, id_col="doc_id", vec_col="embedding", threshold=0.999
    )
    got = {
        tuple(sorted((r[0], r[1])))
        for r in pairs.select(pairs.columns[0], pairs.columns[1]).collect()
    }
    assert (1, 2) in got  # identical bytes -> identical vectors
