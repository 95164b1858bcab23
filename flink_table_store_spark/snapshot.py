"""Snapshots, tags, branches: the version layer.

Mirrors paimon-api Snapshot.java:53-159 (fields) and :454-469
(CommitKind), paimon-core SnapshotManager / TagManager. A snapshot is
a JSON file ``snapshot/snapshot-<id>`` pointing at a base manifest
list (all files as of the previous compaction/commit lineage) and a
delta manifest list (files added/deleted by this commit). Tags are
named pointers ``tag/tag-<name>`` holding a full snapshot copy so they
survive snapshot expiry (reference TagManager semantics).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any

from flink_table_store_spark.fileio import read_json, write_json, write_json_atomic_new

COMMIT_APPEND = "APPEND"
COMMIT_COMPACT = "COMPACT"
COMMIT_OVERWRITE = "OVERWRITE"


@dataclass
class Snapshot:
    id: int
    schema_id: int
    base_manifest_list: str | None
    delta_manifest_list: str | None
    commit_kind: str = COMMIT_APPEND
    commit_identifier: str = ""  # (queryId, batchId) for idempotent streaming sinks
    commit_user: str = ""  # Snapshot.java commitUser; commit.user-prefix
    time_millis: int = 0
    total_record_count: int = 0
    delta_record_count: int = 0
    watermark: int | None = None  # persisted input watermark (Snapshot.java:157-159)
    next_sequence: int = 0  # sequence-number high-water mark (MergeTreeWriter.java:111)
    # deletion-vector sidecar parquet files under index/ (P10; reference
    # keeps them in an index manifest — DeletionVector.java:44)
    dv_files: list[str] = field(default_factory=list)
    next_row_id: int = 0  # row-tracking high-water mark (SpecialFields._ROW_ID)
    # persisted changelog parquet files under changelog/ written by
    # full-compaction producers (Snapshot.java changelogManifestList;
    # FullChangelogMergeTreeCompactRewriter)
    changelog_files: list[str] = field(default_factory=list)
    # distinct DV'd positions in live files, recorded at commit (the
    # reference stores per-file deleteRowCount, DataFileMeta.java:97-166;
    # None = unknown — derive by reading the DV files)
    dv_row_count: int | None = None
    # {dv file name: sorted bucket ids its rows touch} — lets a bucket
    # task open ONLY its own DV sidecars instead of filtering all of
    # them (the reference scopes DV index files per DataSplit,
    # DataSplit.java:61-80). A file absent from the map has unknown
    # coverage and must be consulted by every bucket.
    dv_buckets: dict[str, list[int]] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "version": 3,
            "id": self.id,
            "schemaId": self.schema_id,
            "baseManifestList": self.base_manifest_list,
            "deltaManifestList": self.delta_manifest_list,
            "commitKind": self.commit_kind,
            "commitIdentifier": self.commit_identifier,
            "commitUser": self.commit_user,
            "timeMillis": self.time_millis,
            "totalRecordCount": self.total_record_count,
            "deltaRecordCount": self.delta_record_count,
            "watermark": self.watermark,
            "nextSequence": self.next_sequence,
            "deletionVectors": self.dv_files,
            "nextRowId": self.next_row_id,
            "changelogFiles": self.changelog_files,
            "deletionVectorsRowCount": self.dv_row_count,
            "deletionVectorBuckets": self.dv_buckets,
        }

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "Snapshot":
        return Snapshot(
            id=d["id"],
            schema_id=d["schemaId"],
            base_manifest_list=d.get("baseManifestList"),
            delta_manifest_list=d.get("deltaManifestList"),
            commit_kind=d.get("commitKind", COMMIT_APPEND),
            commit_identifier=d.get("commitIdentifier", ""),
            commit_user=d.get("commitUser", ""),
            time_millis=d.get("timeMillis", 0),
            total_record_count=d.get("totalRecordCount", 0),
            delta_record_count=d.get("deltaRecordCount", 0),
            watermark=d.get("watermark"),
            next_sequence=d.get("nextSequence", 0),
            dv_files=d.get("deletionVectors", []),
            next_row_id=d.get("nextRowId", 0),
            changelog_files=d.get("changelogFiles", []),
            dv_row_count=d.get("deletionVectorsRowCount"),
            dv_buckets=d.get("deletionVectorBuckets", {}),
        )


class SnapshotManager:
    def __init__(self, table_path: str, branch: str | None = None):
        """``branch`` scopes the version layer to ``branch/branch-<name>/``
        (reference BranchManager: a branch has its own snapshot/tag dirs
        but shares the main table's manifest and data files)."""
        self.table_path = table_path
        self.branch = branch
        root = (
            table_path
            if branch is None
            else os.path.join(table_path, "branch", f"branch-{branch}")
        )
        self.dir = os.path.join(root, "snapshot")
        self.tag_dir = os.path.join(root, "tag")
        self._root = root

    def _path(self, snapshot_id: int) -> str:
        return os.path.join(self.dir, f"snapshot-{snapshot_id}")

    def snapshot_ids(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            int(n.split("-", 1)[1])
            for n in os.listdir(self.dir)
            if n.startswith("snapshot-") and n.split("-", 1)[1].isdigit()
        )

    def latest_id(self) -> int | None:
        ids = self.snapshot_ids()
        return ids[-1] if ids else None

    def latest(self) -> Snapshot | None:
        i = self.latest_id()
        return None if i is None else self.load(i)

    def earliest_id(self) -> int | None:
        ids = self.snapshot_ids()
        return ids[0] if ids else None

    def load(self, snapshot_id: int) -> Snapshot:
        return Snapshot.from_dict(read_json(self._path(snapshot_id)))

    def exists(self, snapshot_id: int) -> bool:
        return os.path.exists(self._path(snapshot_id))

    def try_commit(self, snapshot: Snapshot) -> bool:
        """CAS-create snapshot-<id>; False if another writer won the race."""
        os.makedirs(self.dir, exist_ok=True)
        return write_json_atomic_new(self._path(snapshot.id), snapshot.to_dict())

    def delete(self, snapshot_id: int) -> None:
        p = self._path(snapshot_id)
        if os.path.exists(p):
            os.unlink(p)

    # --- time travel resolution (TimeTravelUtil semantics) ---

    def for_timestamp(self, ts_millis: int) -> Snapshot | None:
        """Latest snapshot with time_millis <= ts_millis."""
        best = None
        for i in self.snapshot_ids():
            s = self.load(i)
            if s.time_millis <= ts_millis:
                best = s
        return best

    def for_watermark(self, watermark: int) -> Snapshot | None:
        """Latest snapshot with watermark <= given (StaticFromWatermarkStartingScanner)."""
        best = None
        for i in self.snapshot_ids():
            s = self.load(i)
            if s.watermark is not None and s.watermark <= watermark:
                best = s
        return best

    # --- tags (TagManager) ---

    def create_tag(
        self,
        name: str,
        snapshot_id: int | None = None,
        time_retained_ms: int | None = None,
    ) -> None:
        """Tag a snapshot. ``time_retained_ms`` stores the reference's
        Tag.java tagCreateTime/tagTimeRetained fields (millis here —
        the store's own JSON dialect): such tags expire automatically
        once their lifetime passes (TagTimeExpire)."""
        os.makedirs(self.tag_dir, exist_ok=True)
        sid = snapshot_id if snapshot_id is not None else self.latest_id()
        if sid is None:
            raise RuntimeError("no snapshot to tag")
        snap = self.load(sid)
        doc = snap.to_dict()
        if time_retained_ms is not None:
            doc["tagCreateTime"] = now_millis()
            doc["tagTimeRetained"] = int(time_retained_ms)
        if not write_json_atomic_new(os.path.join(self.tag_dir, f"tag-{name}"), doc):
            raise RuntimeError(f"tag {name} already exists")

    def delete_tag(self, name: str) -> None:
        p = os.path.join(self.tag_dir, f"tag-{name}")
        if os.path.exists(p):
            os.unlink(p)

    def tags(self) -> dict[str, Snapshot]:
        if not os.path.isdir(self.tag_dir):
            return {}
        out = {}
        for n in sorted(os.listdir(self.tag_dir)):
            if n.startswith("tag-"):
                out[n[4:]] = Snapshot.from_dict(read_json(os.path.join(self.tag_dir, n)))
        return out

    def tag(self, name: str) -> Snapshot:
        return Snapshot.from_dict(read_json(os.path.join(self.tag_dir, f"tag-{name}")))

    def rename_tag(self, old: str, new: str) -> None:
        """RenameTagProcedure: atomic create-new-then-drop-old."""
        snap = self.tag(old)
        if not write_json_atomic_new(os.path.join(self.tag_dir, f"tag-{new}"), snap.to_dict()):
            raise RuntimeError(f"tag {new} already exists")
        self.delete_tag(old)

    def replace_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """ReplaceTagProcedure: repoint an existing (or new) tag."""
        self.delete_tag(name)
        self.create_tag(name, snapshot_id)

    def expire_tags(self, older_than_millis: int) -> list[str]:
        """ExpireTagsProcedure: drop tags whose snapshot predates the
        threshold."""
        expired = [
            n for n, s in self.tags().items() if s.time_millis < older_than_millis
        ]
        for n in expired:
            self.delete_tag(n)
        return expired

    def expire_tags_by_time(self, now_ms: int | None = None) -> list[str]:
        """TagTimeExpire: drop tags whose own ``tagTimeRetained``
        lifetime (set at creation) has passed. Tags without a retention
        never expire here."""
        if not os.path.isdir(self.tag_dir):
            return []
        now = now_millis() if now_ms is None else now_ms
        expired = []
        for n in sorted(os.listdir(self.tag_dir)):
            if not n.startswith("tag-"):
                continue
            doc = read_json(os.path.join(self.tag_dir, n))
            created, retained = doc.get("tagCreateTime"), doc.get("tagTimeRetained")
            if created is not None and retained is not None and created + retained < now:
                os.unlink(os.path.join(self.tag_dir, n))
                expired.append(n[4:])
        return expired

    # --- decoupled changelog lifecycle (ChangelogManager / Changelog.java:
    # an EXPIRED snapshot whose changelog must outlive it is preserved as
    # a `changelog/changelog-<id>` metadata entry; ExpireChangelogImpl
    # cleans these by their own, longer retention) ---

    def changelog_meta_dir(self) -> str:
        return os.path.join(self._root, "changelog")

    def write_changelog_entry(self, snap: Snapshot) -> None:
        os.makedirs(self.changelog_meta_dir(), exist_ok=True)
        write_json(
            os.path.join(self.changelog_meta_dir(), f"changelog-{snap.id}"),
            snap.to_dict(),
        )

    def changelog_entry_ids(self) -> list[int]:
        d = self.changelog_meta_dir()
        if not os.path.isdir(d):
            return []
        import re as _re

        out = []
        for n in os.listdir(d):
            m = _re.fullmatch(r"changelog-(\d+)", n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def load_changelog_entry(self, snapshot_id: int) -> Snapshot:
        return Snapshot.from_dict(
            read_json(os.path.join(self.changelog_meta_dir(), f"changelog-{snapshot_id}"))
        )

    def delete_changelog_entry(self, snapshot_id: int) -> None:
        try:
            os.unlink(os.path.join(self.changelog_meta_dir(), f"changelog-{snapshot_id}"))
        except FileNotFoundError:
            pass

    # --- consumers (ConsumerManager.java:44-70): resumable cursors ---

    def consumer_dir(self) -> str:
        return os.path.join(self._root, "consumer")

    def write_consumer(self, consumer_id: str, next_snapshot: int) -> None:
        os.makedirs(self.consumer_dir(), exist_ok=True)
        write_json(
            os.path.join(self.consumer_dir(), f"consumer-{consumer_id}"),
            {"nextSnapshot": next_snapshot},
        )

    def read_consumer(self, consumer_id: str) -> int | None:
        p = os.path.join(self.consumer_dir(), f"consumer-{consumer_id}")
        if not os.path.exists(p):
            return None
        return read_json(p)["nextSnapshot"]

    def consumers(self) -> dict[str, int]:
        d = self.consumer_dir()
        if not os.path.isdir(d):
            return {}
        return {
            n[len("consumer-"):]: read_json(os.path.join(d, n))["nextSnapshot"]
            for n in sorted(os.listdir(d))
            if n.startswith("consumer-")
        }

    def clear_consumers(
        self, including: str | None = None, excluding: str | None = None
    ) -> list[str]:
        """Delete consumers, optionally filtered by regex patterns
        (ClearConsumersProcedure: includingPattern defaults to
        match-all, excludingPattern to match-none)."""
        import re as _re

        inc = _re.compile(including) if including else None
        exc = _re.compile(excluding) if excluding else None
        d = self.consumer_dir()
        cleared = []
        if os.path.isdir(d):
            for n in sorted(os.listdir(d)):
                if not n.startswith("consumer-"):
                    continue
                cid = n[len("consumer-"):]
                if inc is not None and not inc.fullmatch(cid):
                    continue
                if exc is not None and exc.fullmatch(cid):
                    continue
                os.unlink(os.path.join(d, n))
                cleared.append(cid)
        return cleared

    def expire_consumers(self, older_than_ms: int) -> list[str]:
        """Delete consumer files idle (mtime) longer than the given
        interval (ConsumerManager.expire: consumers whose file
        modification time predates the cutoff stop pinning snapshots —
        CoreOptions consumer.expiration-time)."""
        d = self.consumer_dir()
        if not os.path.isdir(d):
            return []
        cutoff = now_millis() - older_than_ms
        expired = []
        for n in sorted(os.listdir(d)):
            if not n.startswith("consumer-"):
                continue
            p = os.path.join(d, n)
            if os.path.getmtime(p) * 1000 < cutoff:
                os.unlink(p)
                expired.append(n[len("consumer-"):])
        return expired


def now_millis() -> int:
    return int(time.time() * 1000)
