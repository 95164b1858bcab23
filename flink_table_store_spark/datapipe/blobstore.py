"""External blob storage for large binary columns (multimodal payloads).

The reference stores BlobType columns outside the columnar files — a
dedicated blob format plus descriptor references (paimon-format blob/,
paimon-api BlobType, BlobDescriptor; object tables for raw dirs). The
Spark-first equivalent here: a binary column is EXTERNALIZED to
content-addressed blob objects (`blob/<aa>/<sha256>.blob`) and replaced
by a descriptor struct ``(uri, offset, length, media_type)``; readers
``fetch_blobs`` lazily, so parquet holds only slim descriptors and the
scan never drags payload bytes through pages, page cache, or shuffle.

Why content addressing: writes are idempotent (re-running a failed job
rewrites the same names — no torn state), identical payloads dedupe for
free, and GC is a set difference (``clean_blobs``: listing ⟕ referenced
descriptors — the same distributed anti-join shape as
remove_orphan_files) with no reference counting.

All passes are Arrow-batched ``mapInPandas`` — narrow, no shuffle,
scales with input splits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.multimodal import DESCRIPTOR_SCHEMA

BLOB_DIR = "blob"


def _blob_rel(sha: str) -> str:
    return f"{BLOB_DIR}/{sha[:2]}/{sha}.blob"


def externalize_blobs(
    df: DataFrame,
    root: str,
    payload_col: str = "payload",
    desc_col: str = "blob",
    media_type: str = "application/octet-stream",
) -> DataFrame:
    """Write each payload as a content-addressed object under
    ``root/blob/`` (executor-side, idempotent) and replace the binary
    column with a descriptor struct. NULL payloads stay NULL."""
    out_fields = [
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    ]
    out_schema = ", ".join(out_fields + [f"`{desc_col}` {DESCRIPTOR_SCHEMA}"])
    other_cols = [f.name for f in df.schema.fields if f.name != payload_col]

    def _write(batches):
        import hashlib

        import pandas as _pd

        for pdf in batches:
            descs = []
            for p in pdf[payload_col]:
                if p is None:
                    descs.append(None)
                    continue
                p = bytes(p)
                sha = hashlib.sha256(p).hexdigest()
                rel = _blob_rel(sha)
                path = os.path.join(root, rel)
                if not os.path.exists(path):
                    import uuid as _uuid

                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    # UNIQUE tmp per writer: two tasks externalizing the
                    # same content concurrently must not share one tmp
                    # path (the first rename steals it and the second's
                    # os.replace dies with ENOENT — observed flake).
                    # With distinct tmps the renames converge on
                    # identical bytes; os.replace stays atomic.
                    tmp = f"{path}.{_uuid.uuid4().hex}.tmp"
                    with open(tmp, "wb") as fh:
                        fh.write(p)
                    os.replace(tmp, path)
                descs.append(
                    {
                        "uri": rel,
                        "offset": 0,
                        "length": len(p),
                        "media_type": media_type,
                    }
                )
            out = pdf[other_cols].copy()
            out[desc_col] = descs
            yield _pd.DataFrame(out)

    return df.mapInPandas(_write, out_schema)


def fetch_blobs(
    df: DataFrame,
    root: str,
    desc_col: str = "blob",
    out_col: str = "payload",
) -> DataFrame:
    """Attach payload bytes by reading each descriptor's object (ranged
    read honoring offset/length). NULL descriptors yield NULL."""
    out_fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(out_fields + [f"`{out_col}` binary"])
    cols = [f.name for f in df.schema.fields]

    def _read(batches):
        import pandas as _pd

        for pdf in batches:
            payloads = []
            for d in pdf[desc_col]:
                if d is None:
                    payloads.append(None)
                    continue
                with open(os.path.join(root, d["uri"]), "rb") as fh:
                    fh.seek(d["offset"] or 0)
                    n = d["length"]
                    payloads.append(fh.read(n) if n is not None and n >= 0 else fh.read())
            out = pdf[cols].copy()
            out[out_col] = payloads
            yield _pd.DataFrame(out)

    return df.mapInPandas(_read, out_schema)


def clean_blobs(
    spark: SparkSession,
    root: str,
    referenced: DataFrame,
    desc_col: str = "blob",
    dry_run: bool = False,
) -> list[str]:
    """Delete blob objects referenced by no descriptor in ``referenced``
    — a distributed listing ⟕ reference anti-join; only orphan names
    reach the driver (clean_blobs(spark, root, table_df) after expire)."""
    blob_root = os.path.join(root, BLOB_DIR)
    if not os.path.isdir(blob_root):
        return []
    import re as _re

    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(blob_root)
        .select(
            F.regexp_replace(
                F.col("path"), "^file:" + _re.escape(root.rstrip("/")) + "/?", ""
            ).alias("uri")
        )
    )
    refs = referenced.select(F.col(desc_col)["uri"].alias("uri")).where(
        F.col("uri").isNotNull()
    )
    orphans = [r["uri"] for r in listing.join(refs, "uri", "left_anti").collect()]
    if not dry_run:
        for rel in orphans:
            try:
                os.unlink(os.path.join(root, rel))
            except FileNotFoundError:
                pass
    return orphans
