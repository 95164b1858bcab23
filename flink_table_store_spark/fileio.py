"""Filesystem primitives: atomic JSON commit via link-based CAS.

Mirrors the reference commit protocol (atomic rename of
``snapshot-N``; paimon-core FileStoreCommitImpl.java:109-126): a
snapshot file must be created exactly-once. On POSIX, ``os.rename``
silently overwrites, so compare-and-swap is done with ``os.link``
(fails with EEXIST if the target exists) followed by unlink of the
temp file. On object stores this maps to conditional PUT
(If-None-Match) — the driver-side protocol is identical.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any


def read_json(path: str) -> Any:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def write_json(path: str, obj: Any) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def write_json_atomic_new(path: str, obj: Any) -> bool:
    """Create ``path`` with ``obj`` iff it does not exist. Returns success.

    The CAS primitive behind snapshot commits.
    """
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=1, default=str)
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def new_file_name(prefix: str, ext: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex}{ext}"
