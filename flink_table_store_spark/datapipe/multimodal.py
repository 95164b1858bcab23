"""Multimodal columns: opaque binary payloads + typed metadata.

Mirrors the reference's blob/object surface (paimon-api BlobType,
paimon-core table/object/, blob format paimon-format blob/): media
lives as a ``binary`` column (or a descriptor struct pointing at an
external object), metadata as typed columns. Processing runs as
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema,
batch iteration, partitioning) is real and tested; the actual codec
calls are STUBBED (image/audio libraries are not available in this
container) behind ``_decode_image_stub``, which is a deterministic
fake so tests are reproducible. Swap the stub for PIL/ffmpeg in a
real deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# descriptor struct for externally-stored blobs (path_to_descriptor /
# descriptor_to_string functions, docs/content/spark/sql-functions.md:56-79)
DESCRIPTOR_SCHEMA = "struct<uri:string,offset:bigint,length:bigint,media_type:string>"

IMAGE_META_SCHEMA = (
    "doc_id bigint, media_type string, format string, n_bytes int, sha256 string, "
    "width int, height int, channels int, decode_ok boolean"
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),  # wav/avi/webp container
    (b"\x00\x00\x00", "mp4"),  # ftyp boxes start with size prefix
    (b"ID3", "mp3"),
    (b"OggS", "ogg"),
]


def sniff_format(payload: bytes) -> str:
    """Container detection from magic bytes — real (not stubbed)."""
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def path_to_descriptor(uri_col, media_type: str = "application/octet-stream"):
    """Build a blob descriptor struct from a URI column (F5 parity)."""
    return F.struct(
        F.col(uri_col).alias("uri") if isinstance(uri_col, str) else uri_col.alias("uri"),
        F.lit(0).cast("bigint").alias("offset"),
        F.lit(-1).cast("bigint").alias("length"),
        F.lit(media_type).alias("media_type"),
    )


def descriptor_to_string(desc_col) -> "F.Column":
    d = F.col(desc_col) if isinstance(desc_col, str) else desc_col
    return F.concat_ws(
        "#", d.getField("uri"), d.getField("offset").cast("string"), d.getField("length").cast("string")
    )


try:  # real codec when available; nothing else changes
    from PIL import Image as _PILImage  # noqa: N813
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, bool]:
    """Deterministic fake decoder. REAL DECODE NOT IMPLEMENTED in this
    container (no PIL/opencv): derives (width, height, channels) from a
    hash of the bytes so the pipeline is testable end-to-end."""
    if not payload:
        return 0, 0, 0, False
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 if h[2] % 4 == 0 else 3
    return width, height, channels, True


def decode_image(payload: bytes) -> tuple[int, int, int, bool]:
    """(width, height, channels, ok). Uses PIL when importable (the
    production path — guarded optional import); falls back to the
    deterministic stub otherwise. sha256/format/n_bytes metadata is
    real either way."""
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return im.width, im.height, len(im.getbands()), True
        except Exception:
            return 0, 0, 0, False
    return _decode_image_stub(payload)


def extract_image_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", media_type_col: str | None = None
) -> DataFrame:
    """Decode/feature-extract pass over a binary column via mapInPandas.

    Arrow batches stream through Python once; output is a typed metadata
    table. Narrow transform — no shuffle, scales with input splits."""
    mt = media_type_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = [decode_image(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf[mt] if mt else "image/fake",
                    "format": [sniff_format(p or b"") for p in payloads],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha256": [hashlib.sha256(p or b"").hexdigest() for p in payloads],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "decode_ok": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str = "doc_id", n_frames_col: str = "n_frames", every: int = 30) -> DataFrame:
    """Video frame-sampling plan: explode frame indices [0, n) step
    ``every`` — the Spark-side shape of frame extraction (the ffmpeg
    call itself is the stubbed step)."""
    idx = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
    ).alias("frame_idx")
    return df.select(F.col(id_col), F.col(n_frames_col), idx)


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, resize_ok boolean"
)


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: REAL PIXEL RESAMPLING NOT IMPLEMENTED
    in this container (no PIL). Emits a reproducible pseudo-bitmap
    (sha256-keyed stream cipher over the target size) so the pipeline
    — schema, batching, byte budgets — is testable end-to-end."""
    seed = hashlib.sha256(payload + f"{w}x{h}".encode()).digest()
    out = bytearray()
    block = seed
    need = w * h  # 1 byte/px fake grayscale
    while len(out) < need:
        block = hashlib.sha256(block).digest()
        out.extend(block)
    return bytes(out[:need])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize pass over a binary image column (the thumbnail/vision-
    encoder-input step). Uses PIL when importable — the production
    path, emitting PNG-encoded output whose PIXEL count is bounded at
    w·h (encoded bytes vary with content/channels: ~1-4 bytes/px) —
    else the deterministic stub (exactly w·h bytes, fake grayscale).
    Either way the output size is bounded by the TARGET dimensions,
    never the input's — the property that matters when 100 TB of
    originals become model inputs. Arrow-batched narrow transform,
    no shuffle."""
    if width <= 0 or height <= 0:
        raise ValueError(f"target size must be positive, got {width}x{height}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, oks = [], []
            for p in pdf[payload_col]:
                p = p if p is not None else b""
                if not p:
                    outs.append(b"")
                    oks.append(False)
                    continue
                if _PILImage is not None:
                    import io

                    try:
                        with _PILImage.open(io.BytesIO(p)) as im:
                            buf = io.BytesIO()
                            im.resize((width, height)).save(buf, format="PNG")
                            outs.append(buf.getvalue())
                            oks.append(True)
                            continue
                    except Exception:
                        outs.append(b"")
                        oks.append(False)
                        continue
                outs.append(_resize_stub(p, width, height))
                oks.append(True)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": outs,
                    "width": width,
                    "height": height,
                    "resize_ok": oks,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id bigint, format string, n_bytes int, sample_rate int, "
    "n_channels int, duration_s double, features array<float>, "
    "decode_ok boolean"
)


def parse_wav_header(payload: bytes) -> tuple[int, int, float] | None:
    """REAL (not stubbed) RIFF/WAVE header parse — pure byte math, no
    codec library: returns (sample_rate, n_channels, duration_s) or
    None if the payload is not a canonical PCM WAV."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and size >= 16:
            body = payload[pos + 8 : pos + 8 + 16]
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            byte_rate = int.from_bytes(body[8:12], "little")
            fmt = (sample_rate, n_channels, byte_rate)
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size % 2)
    if fmt is None or data_len is None or fmt[2] == 0:
        return None
    return fmt[0], fmt[1], data_len / fmt[2]


def _audio_features_stub(payload: bytes, n: int = 16) -> list[float]:
    """Deterministic fake MFCC-ish vector: REAL DSP NOT IMPLEMENTED in
    this container (no librosa/scipy); a sha256-keyed unit-scale vector
    keeps downstream ANN/dedup over audio features testable."""
    h = hashlib.sha256(payload).digest()
    while len(h) < 2 * n:
        h += hashlib.sha256(h).digest()
    return [
        round((int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0) * 2 - 1, 6)
        for i in range(n)
    ]


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_features: int = 16,
) -> DataFrame:
    """Audio feature-extract pass: the RIFF/WAV header fields
    (sample rate, channels, duration) are parsed FOR REAL from the
    bytes; the spectral feature vector is the deterministic stub.
    Arrow-batched narrow transform; output rows carry a fixed-length
    ``array<float>`` ready for the ANN/near-dup operators."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": pdf[id_col],
                "format": [],
                "n_bytes": [],
                "sample_rate": [],
                "n_channels": [],
                "duration_s": [],
                "features": [],
                "decode_ok": [],
            }
            for p in pdf[payload_col]:
                p = p if p is not None else b""
                rows["format"].append(sniff_format(p))
                rows["n_bytes"].append(len(p))
                hdr = parse_wav_header(p)
                if hdr:
                    rows["sample_rate"].append(hdr[0])
                    rows["n_channels"].append(hdr[1])
                    rows["duration_s"].append(round(hdr[2], 6))
                else:
                    rows["sample_rate"].append(0)
                    rows["n_channels"].append(0)
                    rows["duration_s"].append(0.0)
                rows["features"].append(
                    _audio_features_stub(p, n_features) if p else []
                )
                rows["decode_ok"].append(bool(p))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=AUDIO_META_SCHEMA)
