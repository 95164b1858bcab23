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
