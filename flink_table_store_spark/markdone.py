"""Partition mark-done: notify downstream that a partition is ready.

Reference semantics (docs/content/maintenance/manage-partitions.md
"Partition Mark Done"; paimon-core partition/actions/*.java;
paimon-flink sink/listener/PartitionMarkDoneTrigger.java):

- ``partition.mark-done-action`` (CoreOptions.java:1497-1523, default
  ``success-file``) is a comma-separated list of actions run when a
  partition is marked done:

  * ``success-file`` — write a ``_SUCCESS`` JSON file into the
    partition directory (SuccessFileMarkDoneAction.java:35-52;
    file format SuccessFile.java: ``creationTime`` preserved across
    re-marks, ``modificationTime`` bumped).
  * ``done-partition`` — register a metastore partition whose LAST
    partition value gets a ``.done`` suffix
    (AddDonePartitionAction.java:38-44). Needs a metastore-backed
    catalog (HiveCatalog attaches the handler).
  * ``mark-event`` — record a partition-done event with the metastore
    (MarkPartitionDoneEventAction). The sandbox session catalog has no
    event API, so the handler journals events under the table path —
    documented deviation, same observable contract (pollable events).
  * ``http-report`` — POST ``{"params","table","path","partition"}``
    to ``partition.mark-done-action.http.url`` and require a
    ``{"result": "SUCCESS"}`` response (HttpReportMarkDoneAction.java).
  * ``custom`` — instantiate ``partition.mark-done-action.custom.class``
    (a ``module:Class`` / ``module.Class`` path) and call its
    ``mark_done(partition)`` per partition.

- Batch trigger: ``partition.end-input-to-done`` (CoreOptions.java:1139)
  — every partition written by a batch job is marked done when the
  job's input ends (here: at commit, since a batch ``Table.write`` IS
  one end-to-end input).

- Streaming trigger: ``partition.idle-time-to-done`` +
  ``partition.time-interval`` (FlinkConnectorOptions.java:345-371,
  PartitionMarkDoneTrigger.java:96-155): a partition is done once
  ``now - max(lastUpdate, partitionStartTime + timeInterval) >
  idleTime``. Partition start time comes from the partition VALUES via
  the same ``partition.timestamp-pattern`` / ``-formatter`` extractor
  the values-time expiry uses. Unparseable partitions are dropped from
  tracking (the reference skips "illegal" partitions). Pending state is
  persisted per sink (``partition.mark-done.recover-from-state``,
  default true) so restarts don't lose in-flight partitions.
"""

from __future__ import annotations

import json
import os
import re
import time
import urllib.request

# Hive/Spark escapePathName character set: these (plus control chars)
# are %XX-escaped in partition directory names, everything else is
# written verbatim — must match what the parquet writer produced so the
# _SUCCESS file lands in the real partition directory.
_ESCAPED = set('"#%\'*/:=?\\\x7f{[]^')

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"
SUCCESS_FILE_NAME = "_SUCCESS"


def escape_path_name(value: str) -> str:
    out = []
    for ch in value:
        if ch in _ESCAPED or ord(ch) < 32:
            out.append("%%%02X" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def partition_rel_path(partition_keys: list[str], partition: dict) -> str:
    """Hive-style ``k1=v1/k2=v2`` in partition-key order."""
    segs = []
    for k in partition_keys:
        v = partition.get(k)
        v = HIVE_DEFAULT_PARTITION if v in (None, "") else escape_path_name(str(v))
        segs.append(f"{k}={v}")
    return "/".join(segs)


def parse_partition_spec(spec, partition_keys: list[str]) -> list[dict]:
    """Accept the procedure-surface forms: a dict, a ``k=v,k2=v2`` spec,
    or the reference's ``;``-separated multi-partition string
    (MarkPartitionDoneProcedure: 'day=01;day=02')."""
    if isinstance(spec, dict):
        return [spec]
    if isinstance(spec, (list, tuple)):
        out = []
        for s in spec:
            out.extend(parse_partition_spec(s, partition_keys))
        return out
    parts = []
    for chunk in str(spec).split(";"):
        chunk = chunk.strip()
        if not chunk:
            continue
        d: dict[str, str] = {}
        for piece in chunk.split(","):
            if "=" not in piece:
                raise ValueError(f"cannot parse partition spec {chunk!r}")
            k, v = piece.split("=", 1)
            d[k.strip()] = v.strip().strip("'\"")
        unknown = set(d) - set(partition_keys)
        if unknown:
            raise ValueError(
                f"partition spec {chunk!r} names non-partition columns "
                f"{sorted(unknown)} (partition keys: {partition_keys})"
            )
        parts.append(d)
    return parts


def duration_ms(text: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s*(ms|s|sec|m|min|h|d)?\s*", text)
    if not m:
        raise ValueError(f"cannot parse duration: {text!r}")
    n, unit = int(m.group(1)), (m.group(2) or "ms")
    return n * {
        "ms": 1, "s": 1000, "sec": 1000, "m": 60_000,
        "min": 60_000, "h": 3_600_000, "d": 86_400_000,
    }[unit]


# --- actions ---------------------------------------------------------------


def success_file_mark_done(table, partition: dict, now_ms: int | None = None) -> str:
    """SuccessFileMarkDoneAction: ``_SUCCESS`` JSON in the partition dir
    (the reference writes ``new Path(tablePath, partition)`` — here the
    partition data dirs live under ``<path>/data``, so the marker sits
    next to the partition's actual files, where a downstream poller
    watching the registered LOCATION finds it); re-marking preserves
    creationTime and bumps modificationTime."""
    now = int(time.time() * 1000) if now_ms is None else now_ms
    rel = partition_rel_path(table.schema.partition_keys, partition)
    base = os.path.join(table.path, "data")
    d = os.path.join(base, *rel.split("/")) if rel else base
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, SUCCESS_FILE_NAME)
    creation = now
    if os.path.exists(p):
        try:
            with open(p) as f:
                creation = json.load(f).get("creationTime", now)
        except (json.JSONDecodeError, OSError):
            pass
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"creationTime": creation, "modificationTime": now}, f)
    os.replace(tmp, p)
    return p


def add_done_partition(table, partition: dict) -> dict:
    """AddDonePartitionAction: metastore partition with the last
    partition value suffixed ``.done``."""
    handler = getattr(table, "partition_handler", None)
    if handler is None:
        raise ValueError(
            "done-partition mark-done action needs a metastore-backed "
            "catalog (metastore.partitioned-table on a HiveCatalog table)"
        )
    keys = table.schema.partition_keys
    done = {k: str(partition.get(k, "")) for k in keys}
    done[keys[-1]] = done[keys[-1]] + ".done"
    handler.create_partitions([done])
    return done


def mark_event(table, partition: dict) -> None:
    """MarkPartitionDoneEventAction: a partition-done event the
    downstream can poll. Journaled under the table path (the sandbox
    metastore has no event API — deviation documented in module doc)."""
    d = os.path.join(table.path, "partition_mark")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "events.jsonl")
    rel = partition_rel_path(table.schema.partition_keys, partition)
    with open(p, "a") as f:
        f.write(json.dumps({
            "partition": rel, "event": "partition-done",
            "time": int(time.time() * 1000),
        }) + "\n")


def http_report_mark_done(table, partition: dict) -> None:
    """HttpReportMarkDoneAction: POST the request JSON, require
    ``result == "SUCCESS"`` (case-insensitive) or fail the mark."""
    url = table.schema.options.get("partition.mark-done-action.http.url")
    if not url:
        raise ValueError(
            "partition.mark-done-action.http.url must be non-empty for "
            "the http-report mark-done action"
        )
    body = json.dumps({
        "params": table.schema.options.get(
            "partition.mark-done-action.http.params"
        ),
        "table": table.name,
        "path": table.path,
        "partition": partition_rel_path(table.schema.partition_keys, partition),
    }).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        payload = json.loads(resp.read().decode() or "{}")
    result = payload.get("result")
    if not (isinstance(result, str) and result.upper() == "SUCCESS"):
        raise RuntimeError(
            "http-report mark-done action: response attribute `result` "
            f"should be 'SUCCESS' but is {result!r}"
        )


def _custom_action(table):
    spec = table.schema.options.get("partition.mark-done-action.custom.class")
    if not spec:
        raise ValueError(
            "partition.mark-done-action.custom.class must name a class "
            "implementing mark_done(partition) for the custom action"
        )
    import importlib

    if ":" in spec:
        mod, cls = spec.split(":", 1)
    else:
        mod, _, cls = spec.rpartition(".")
    obj = getattr(importlib.import_module(mod), cls)
    try:
        return obj(table)
    except TypeError:
        return obj()


def configured_actions(table) -> list[str]:
    raw = table.schema.options.get("partition.mark-done-action", "success-file")
    actions = [a.strip() for a in raw.split(",") if a.strip()]
    known = {"success-file", "done-partition", "mark-event", "http-report", "custom"}
    unknown = set(actions) - known
    if unknown:
        raise ValueError(
            f"unknown partition.mark-done-action {sorted(unknown)} "
            f"(known: {sorted(known)})"
        )
    return actions


def mark_done(table, partitions: list[dict]) -> list[str]:
    """Run every configured action for each partition; returns the
    hive-style rel paths marked. Also maintains the repo's
    ``partition_mark/*.done`` registry so ``done_partitions()`` keeps
    answering (pre-existing discovery surface)."""
    if not table.schema.partition_keys:
        raise ValueError("mark_partition_done on an unpartitioned table")
    actions = configured_actions(table)
    custom = _custom_action(table) if "custom" in actions else None
    rels = []
    for part in partitions:
        rel = partition_rel_path(table.schema.partition_keys, part)
        for a in actions:
            if a == "success-file":
                success_file_mark_done(table, part)
            elif a == "done-partition":
                add_done_partition(table, part)
            elif a == "mark-event":
                mark_event(table, part)
            elif a == "http-report":
                http_report_mark_done(table, part)
            elif a == "custom":
                custom.mark_done(rel)
        d = os.path.join(table.path, "partition_mark")
        os.makedirs(d, exist_ok=True)
        name = json.dumps(part, sort_keys=True)
        with open(os.path.join(d, f"{abs(hash(name))}.done"), "w") as f:
            json.dump({"partition": part}, f)
        rels.append(rel)
    if custom is not None and hasattr(custom, "close"):
        custom.close()
    return rels


# --- triggers ---------------------------------------------------------------


class PartitionMarkDoneTrigger:
    """Streaming trigger (PartitionMarkDoneTrigger.java:96-185): track
    last-update time per pending partition; a partition is done when
    idle past ``partition.idle-time-to-done``, where the idle clock only
    starts after the partition's own time window closed
    (``partitionStartTime + partition.time-interval``). Pending state
    persists under the table path keyed by sink id."""

    def __init__(self, table, sink_id: str, now_ms: int | None = None):
        opts = table.schema.options
        self.table = table
        self.idle_ms = (
            duration_ms(opts["partition.idle-time-to-done"])
            if opts.get("partition.idle-time-to-done")
            else None
        )
        self.interval_ms = (
            duration_ms(opts["partition.time-interval"])
            if opts.get("partition.time-interval")
            else None
        )
        self.end_input_to_done = opts.get("partition.end-input-to-done") == "true"
        self.recover = opts.get(
            "partition.mark-done.recover-from-state", "true"
        ) != "false"
        self._state_path = os.path.join(
            table.path, "partition_mark", f"pending-{sink_id}.json"
        )
        now = int(time.time() * 1000) if now_ms is None else now_ms
        self.pending: dict[str, tuple[dict, int]] = {}
        if self.recover and os.path.exists(self._state_path):
            with open(self._state_path) as f:
                for part in json.load(f):
                    key = json.dumps(part, sort_keys=True)
                    self.pending[key] = (part, now)

    def notify(self, partition: dict, now_ms: int | None = None) -> None:
        if not partition:
            return
        now = int(time.time() * 1000) if now_ms is None else now_ms
        self.pending[json.dumps(partition, sort_keys=True)] = (partition, now)

    def done_partitions(
        self, end_input: bool = False, now_ms: int | None = None,
        watermark: int | None = None,
    ) -> list[dict]:
        if end_input and self.end_input_to_done:
            out = [p for p, _ in self.pending.values()]
            self.pending.clear()
            return out
        if self.idle_ms is None or self.interval_ms is None:
            return []
        now = int(time.time() * 1000) if now_ms is None else now_ms
        # partition.mark-done-action.mode=watermark: the stream's
        # watermark, not the wall clock, decides idleness — late data
        # can't race a premature mark (manage-partitions.md:163-166)
        clock = watermark if watermark is not None else now
        done, dead = [], []
        for key, (part, last) in self.pending.items():
            start = self.table._partition_value_time(part)
            if start is None:
                dead.append(key)  # reference: skip + drop illegal partitions
                continue
            effective_last = max(last, start + self.interval_ms)
            if clock - effective_last > self.idle_ms:
                done.append(part)
                dead.append(key)
        for k in dead:
            self.pending.pop(k, None)
        return done

    def snapshot_state(self) -> None:
        os.makedirs(os.path.dirname(self._state_path), exist_ok=True)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump([p for p, _ in self.pending.values()], f)
        os.replace(tmp, self._state_path)


def partitions_of_snapshot(table, snap) -> list[dict]:
    """Distinct partitions ADDed by a commit — read from the delta
    manifest (driver-side metadata, O(files in commit)), the same
    source the HiveCatalog partition sync uses."""
    from flink_table_store_spark.manifest import KIND_ADD

    seen = {}
    for e in table.manifests.read_entries(snap.delta_manifest_list):
        if e.kind == KIND_ADD and e.partition:
            seen[json.dumps(e.partition, sort_keys=True)] = e.partition
    return list(seen.values())
