"""Maintenance procedures — the ``CALL``-style admin surface
(SURVEY §2.10: 42 classes under paimon-spark procedure/; grammar
PaimonSqlExtensions.g4:71-87). Python API: ``call(spark, catalog,
'compact', table='db.t', ...)`` — one entry per implemented procedure,
all dispatching to Table/Catalog methods so they stay scriptable.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import SparkSession

from flink_table_store_spark.catalog import Catalog


def _t(cat: Catalog, args: dict):
    t = cat.get_table(args.pop("table"))
    raw = args.pop("options", None)
    if raw:
        # every reference procedure accepts options => 'k1=v1,k2=v2':
        # per-call dynamic options, never persisted
        if isinstance(raw, str):
            opts = dict(
                kv.split("=", 1) for kv in raw.split(",") if "=" in kv
            )
        else:
            opts = dict(raw)
        t = t.with_dynamic_options(opts)
    return t


def call(spark: SparkSession, catalog: Catalog, name: str, **args: Any):
    proc = PROCEDURES.get(name)
    if proc is None:
        raise ValueError(f"unknown procedure {name}; have {sorted(PROCEDURES)}")
    return proc(spark, catalog, dict(args))


def _ts_millis(val):
    """Procedure timestamp argument: epoch millis, or the reference's
    'yyyy-MM-dd[ HH:mm:ss]' string; None passes through."""
    if val is None or isinstance(val, (int, float)):
        return None if val is None else int(val)
    import datetime as _dt

    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            dt = _dt.datetime.strptime(str(val), fmt)
            return int(dt.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
        except ValueError:
            continue
    raise ValueError(f"cannot parse timestamp {val!r}")


def _compact(spark, cat, a):
    t = _t(cat, a)
    if a.get("partitions") and a.get("where"):
        # same contract as RescaleProcedure.java:104-106 — accepting
        # both and using one would silently ignore the other
        raise ValueError("partitions and where cannot be used together.")
    pf = _compact_partition_filter(t, a)
    idle = a.get("partition_idle_time")
    idle_ms = None
    if idle is not None:
        if a.get("order_strategy"):
            # CompactProcedure.java:169-171
            raise ValueError("sort compact do not support 'partition_idle_time'.")
        from flink_table_store_spark.table import parse_duration_ms

        idle_ms = parse_duration_ms(str(idle))
    if a.get("order_strategy"):
        if pf is not None:
            # never rewrite MORE than the caller scoped: sort compact
            # here is a whole-table relayout
            raise ValueError(
                "sort compact does not support partitions/where scoping "
                "yet — it relayouts the whole table"
            )
        return t.sort_compact(
            spark, a["order_by"], strategy=a["order_strategy"], num_files=a.get("num_files")
        )
    if (
        not t.is_primary_key_table()
        and t.schema.options.get("clustering.incremental", "").lower() == "true"
    ):
        # incremental-clustering.md:113-121: CALL sys.compact on such a
        # table IS an incremental clustering run; compact_strategy =>
        # 'full' reclusters everything. Forward the scoping so
        # Table.compact raises its informative refusal instead of the
        # scope being silently ignored.
        return t.compact(
            spark,
            full=str(a.get("compact_strategy", "")).lower() == "full",
            partition_filter=pf,
            partition_idle_time_ms=idle_ms,
        )
    return t.compact(
        spark,
        full=a.get("full", str(a.get("compact_strategy", "")).lower() != "minor"),
        trigger_runs=a.get("trigger_runs", 5),
        partition_filter=pf,
        partition_idle_time_ms=idle_ms,
    )


def _rescale(spark, cat, a):
    t = _t(cat, a)
    if a.get("partitions") and a.get("where"):
        # RescaleProcedure.java:104-106
        raise ValueError("partitions and where cannot be used together.")
    return t.rescale(
        spark,
        num_buckets=a.get("bucket_num"),
        partition_filter=_compact_partition_filter(t, a),
    )


def _compact_partition_filter(t, a):
    """CompactProcedure's partition scoping: ``partitions =>
    'day=01;day=02'`` specs OR a partition-only ``where`` SQL string."""
    if a.get("partitions"):
        from flink_table_store_spark import markdone
        from flink_table_store_spark import predicate as P

        parts = markdone.parse_partition_spec(
            a["partitions"], t.schema.partition_keys
        )
        preds = []
        for p in parts:
            leafs = [P.equal(k, v) for k, v in p.items()]
            preds.append(leafs[0] if len(leafs) == 1 else P.and_(*leafs))
        return preds[0] if len(preds) == 1 else P.or_(*preds)
    if a.get("where"):
        from flink_table_store_spark.sql import parse_condition

        return parse_condition(a["where"])
    return None


def _expire_snapshots(spark, cat, a):
    """ExpireSnapshotsProcedure: retain_max / retain_min / older_than /
    max_deletes per the reference's Spark procedure doc; bare
    ``retain_last`` keeps the legacy keep-newest-N form; no arguments =
    the table's own retention options."""
    t = _t(cat, a)
    ref_args = {"retain_max", "retain_min", "older_than", "max_deletes"}
    if ref_args & set(a):
        older = _ts_millis(a.get("older_than"))
        return t.expire_snapshots(
            retain_min=int(a["retain_min"]) if "retain_min" in a else None,
            retain_max=int(a["retain_max"]) if "retain_max" in a else None,
            older_than_millis=int(older) if older is not None else None,
            max_deletes=int(a["max_deletes"]) if "max_deletes" in a else None,
        )
    if "retain_last" in a:
        return t.expire_snapshots(retain_last=int(a["retain_last"]))
    return t.expire_snapshots()


def _expire_partitions(spark, cat, a):
    """ExpirePartitionsProcedure: expiration_time / timestamp_formatter /
    timestamp_pattern / expire_strategy / max_expires."""
    return _t(cat, a).expire_partitions(
        older_than_millis=a.get("older_than_millis"),
        partition_filter=a.get("partition_filter"),
        strategy=a.get("expire_strategy", a.get("strategy")),
        expiration_time=a.get("expiration_time"),
        timestamp_formatter=a.get("timestamp_formatter"),
        timestamp_pattern=a.get("timestamp_pattern"),
        max_expires=a.get("max_expires"),
    )


def _compact_database(spark, cat, a):
    """CompactDatabaseProcedure: compact every matching table.
    ``including_databases`` / ``including_tables`` / ``excluding_tables``
    are full-match REGEXES (the reference's Pattern semantics,
    CompactDatabaseProcedure.java:52-61); the legacy ``databases``
    comma list still works."""
    import re as _re

    inc_db = a.get("including_databases")
    if inc_db is None and a.get("databases"):
        inc_db = "|".join(
            _re.escape(d.strip()) for d in a["databases"].split(",") if d.strip()
        )
    inc_tb = a.get("including_tables")
    exc_tb = a.get("excluding_tables")
    db_pat = _re.compile(inc_db) if inc_db else None
    tb_pat = _re.compile(inc_tb) if inc_tb else None
    ex_pat = _re.compile(exc_tb) if exc_tb else None
    out: dict[str, Any] = {}
    for db in cat.list_databases():
        if db_pat and not db_pat.fullmatch(db):
            continue
        for tn in cat.list_tables(db):
            if tb_pat and not tb_pat.fullmatch(tn):
                continue
            if ex_pat and ex_pat.fullmatch(tn):
                continue
            try:
                t = cat.get_table(f"{db}.{tn}")
            except RuntimeError:
                continue  # format/object tables have nothing to compact
            snap = t.compact(spark, full=a.get("full", True))
            out[f"{db}.{tn}"] = snap.id if snap else None
    return out


def _trigger_tag_automatic_creation(spark, cat, a):
    """TriggerTagAutomaticCreationProcedure: create the period tag the
    table's tag.automatic-creation options call for, if absent.
    Supported: process-time / watermark modes, daily|hourly|two-hours
    periods, with_dashes|without_dashes formatters, tag.num-retained-max
    pruning of auto-created tags (CoreOptions TAG_* family)."""
    import datetime as _dt

    t = _t(cat, a)
    opts = t.schema.options
    mode = opts.get("tag.automatic-creation", "none")
    if mode == "none":
        return []
    snap = t.snapshots.latest()
    if snap is None:
        return []
    if mode == "watermark" and snap.watermark is not None:
        instant = _dt.datetime.utcfromtimestamp(snap.watermark / 1000)
    else:  # process-time (or watermark missing): snapshot commit time
        instant = _dt.datetime.utcfromtimestamp(snap.time_millis / 1000)
    period = opts.get("tag.creation-period", "daily")
    if period == "hourly":
        base = instant.replace(minute=0, second=0, microsecond=0)
        fmt = "%Y-%m-%d %H"
    elif period == "two-hours":
        base = instant.replace(hour=instant.hour - instant.hour % 2, minute=0, second=0, microsecond=0)
        fmt = "%Y-%m-%d %H"
    else:
        base = instant.replace(hour=0, minute=0, second=0, microsecond=0)
        fmt = "%Y-%m-%d"
    name = base.strftime(fmt)
    if opts.get("tag.period-formatter", "with_dashes") == "without_dashes":
        name = name.replace("-", "").replace(" ", "")
    created = []
    existing = t.snapshots.tags()
    if opts.get("tag.automatic-completion") == "true":
        # TAG_AUTOMATIC_COMPLETION: backfill tags for periods skipped
        # between the newest existing auto tag and the current period
        # (sparse writes leave gaps the downstream scheduler expects)
        step = {
            "hourly": _dt.timedelta(hours=1),
            "two-hours": _dt.timedelta(hours=2),
        }.get(period, _dt.timedelta(days=1))

        def _parse(n: str) -> _dt.datetime | None:
            for f in (fmt, fmt.replace("-", "").replace(" ", "")):
                try:
                    return _dt.datetime.strptime(n, f)
                except ValueError:
                    continue
            return None

        prior = [d for d in (_parse(n) for n in existing) if d is not None]
        if prior:
            cur = max(prior) + step
            while cur < base:
                missing = cur.strftime(fmt)
                if opts.get("tag.period-formatter", "with_dashes") == "without_dashes":
                    missing = missing.replace("-", "").replace(" ", "")
                if missing not in existing:
                    t.create_tag(missing, snapshot_id=snap.id)
                    created.append(missing)
                cur += step
    if name not in existing:
        t.create_tag(name, snapshot_id=snap.id)
        created.append(name)
    keep = opts.get("tag.num-retained-max")
    if keep:
        # Prune ONLY tags matching THIS table's exact period-formatter
        # pattern — a user tag like '2024-backup' must never be deleted,
        # and mixing with_dashes/without_dashes spellings would sort
        # wrong. One spelling per table, so lexicographic == chronologic.
        import re as _re

        if opts.get("tag.period-formatter", "with_dashes") == "without_dashes":
            pat = r"\d{8}" if fmt == "%Y-%m-%d" else r"\d{10}"
        else:
            pat = (
                r"\d{4}-\d{2}-\d{2}"
                if fmt == "%Y-%m-%d"
                else r"\d{4}-\d{2}-\d{2} \d{2}"
            )
        rx = _re.compile(pat + r"\Z")
        auto = sorted(n for n in t.snapshots.tags() if rx.match(n))
        for stale in auto[: max(0, len(auto) - int(keep))]:
            t.delete_tag(stale)
    return created




def _export_shards(spark, cat, a):
    """Deterministic training-shard export of an engine table scan
    (datapipe/export.export_training_shards): filters/projection push
    into the scan, the shuffle+manifest machinery does the rest."""
    from flink_table_store_spark.datapipe.export import (
        export_training_shards,
    )

    t = _t(cat, a)
    pred = None
    if a.get("where"):
        from flink_table_store_spark.sql import parse_condition

        pred = parse_condition(a["where"])
    proj = (
        [x.strip() for x in a["columns"].split(",")]
        if a.get("columns")
        else None
    )
    df = t.to_df(spark, predicate=pred, projection=proj)
    return export_training_shards(
        df,
        a["path"],
        int(a["n_shards"]),
        key_col=a.get("key_col", "doc_id"),
        seed=int(a.get("seed", 42)),
    )


PROCEDURES: dict[str, Callable] = {
    "compact": _compact,
    # table + column statistics (PaimonAnalyzeTableColumnCommand /
    # stats store paimon-core stats/)
    "analyze": lambda s, c, a: _t(c, a).analyze(
        s,
        columns=[x.strip() for x in a["columns"].split(",")] if a.get("columns") else None,
    ),
    # operability audit (doctor.doctor): gauges + actionable findings
    "doctor": lambda s, c, a: _t(c, a).doctor(
        s, check_orphans=bool(a.get("check_orphans", False))
    ),
    "compact_database": _compact_database,
    "trigger_tag_automatic_creation": _trigger_tag_automatic_creation,
    "expire_snapshots": _expire_snapshots,
    "expire_changelogs": lambda s, c, a: _t(c, a).expire_changelogs(
        int(a.get("retain_last", 10))
    ),
    "expire_partitions": _expire_partitions,
    "create_tag": lambda s, c, a: _t(c, a).create_tag(
        a["tag"], a.get("snapshot_id"), time_retained=a.get("time_retained")
    ),
    "create_tag_from_timestamp": lambda s, c, a: _t(c, a).create_tag_from_timestamp(
        a["tag"], a["timestamp"]
    ),
    "delete_tag": lambda s, c, a: _t(c, a).delete_tag(a["tag"]),
    "rename_tag": lambda s, c, a: _t(c, a).rename_tag(a["tag"], a["target_tag"]),
    "replace_tag": lambda s, c, a: _t(c, a).replace_tag(a["tag"], a.get("snapshot_id")),
    "expire_tags": lambda s, c, a: _t(c, a).expire_tags(a["older_than"]),
    "rollback_to_watermark": lambda s, c, a: _t(c, a).rollback_to_watermark(a["watermark"]),
    "compact_manifest": lambda s, c, a: _t(c, a).compact_manifest(),
    "purge_files": lambda s, c, a: _t(c, a).purge_files(),
    "remove_unexisting_files": lambda s, c, a: _t(c, a).remove_unexisting_files(
        dry_run=a.get("dry_run", False)
    ),
    # RescaleProcedure: bucket_num optional (required for postpone
    # tables); partitions/where scope the rewrite (mutually exclusive)
    "rescale": lambda s, c, a: _rescale(s, c, a),
    "rollback": lambda s, c, a: _t(c, a).rollback_to(a["snapshot_id"]),
    "rollback_to_timestamp": lambda s, c, a: (
        lambda t: t.rollback_to(t.snapshots.for_timestamp(a["timestamp_ms"]).id)
    )(_t(c, a)),
    "remove_orphan_files": lambda s, c, a: _t(c, a).remove_orphan_files(
        dry_run=a.get("dry_run", False),
        # mode=distributed (RemoveOrphanFilesProcedure): Spark-side
        # manifest scan + parallel listing when a session is available
        spark=s if a.get("mode", "distributed") == "distributed" else None,
        # older_than timestamp string; absent = the 1-day safety lag
        older_than_millis=_ts_millis(a.get("older_than")),
    ),
    "repair": lambda s, c, a: _t(c, a).remove_orphan_files(dry_run=True, spark=s),
    "create_branch": lambda s, c, a: _t(c, a).create_branch(a["branch"], a.get("snapshot_id")),
    # chain-table periodic compaction: materialize chained views as
    # full dumps on the snapshot branch (chain-table.md:41 — the
    # reference defers chain compact; chain.py composes it)
    "chain_compact": lambda s, c, a: __import__(
        "flink_table_store_spark.chain", fromlist=["chain_compact"]
    ).chain_compact(
        s,
        _t(c, a),
        max_partitions=int(a["max_partitions"]) if a.get("max_partitions") else None,
        expire_deltas=str(a.get("expire_deltas", "false")).lower()
        in ("true", "1"),
    ),
    "delete_branch": lambda s, c, a: _t(c, a).delete_branch(a["branch"]),
    "fast_forward": lambda s, c, a: _t(c, a).fast_forward(a["branch"]),
    # camelCase arg names per the reference's procedures.md example
    "clear_consumers": lambda s, c, a: _t(c, a).snapshots.clear_consumers(
        including=a.get("includingConsumers") or a.get("including_consumers"),
        excluding=a.get("excludingConsumers") or a.get("excluding_consumers"),
    ),
    "reset_consumer": lambda s, c, a: _t(c, a).snapshots.write_consumer(
        a["consumer_id"], a["next_snapshot"]
    ),
    # index-only rebuild: refreshes sidecar .index files + manifest index
    # stats without rewriting any data file (RewriteFileIndexProcedure)
    "rewrite_file_index": lambda s, c, a: _t(c, a).rewrite_file_index(s),
    # accepts the reference's partitions => 'day=01;day=02' form
    # (MarkPartitionDoneProcedure) or a single partition spec/dict
    "mark_partition_done": lambda s, c, a: _t(c, a).mark_partition_done(
        a.get("partitions", a.get("partition"))
    ),
    # migration / clone family (MigrateTableProcedure, MigrateDatabaseProcedure,
    # CopyFilesProcedure) — flink_table_store_spark.migrate
    "migrate_table": lambda s, c, a: _migrate(s, c, a),
    # function & view DDL family (CreateFunctionProcedure, DropFunctionProcedure,
    # AlterFunctionProcedure, CreateViewProcedure, DropViewProcedure,
    # AlterViewDialectProcedure — paimon-spark procedure/)
    "create_function": lambda s, c, a: c.functions.create(
        a["function_name"], a["params"], a["expr"], a.get("returns", "")
    ),
    "alter_function": lambda s, c, a: c.functions.alter(
        a.pop("function_name"), **a
    ),
    "drop_function": lambda s, c, a: c.functions.drop(a["function_name"]),
    "create_view": lambda s, c, a: c.create_view(
        a["view"], a["query"], dialect=a.get("dialect", "spark"),
        comment=a.get("comment", ""), ignore_if_exists=a.get("ignore_if_exists", False),
    ),
    "drop_view": lambda s, c, a: c.drop_view(a["view"]),
    "alter_view_dialect": lambda s, c, a: c.create_view(
        a["view"], a["query"], dialect=a["dialect"], ignore_if_exists=True
    ),
    # global vector index family (CreateGlobalIndexProcedure /
    # DropGlobalIndexProcedure; core globalindex/) — flink_table_store_spark.globalindex
    "create_global_index": lambda s, c, a: _create_gidx(s, c, a),
    "drop_global_index": lambda s, c, a: _drop_gidx(s, c, a),
    "extend_global_index": lambda s, c, a: _extend_gidx(s, c, a),
    "create_rollup": lambda s, c, a: _create_rollup(s, c, a),
    "refresh_rollup": lambda s, c, a: _refresh_rollup(s, c, a),
    "create_text_search_index": lambda s, c, a: _create_fts(s, c, a),
    "update_text_search_index": lambda s, c, a: _update_fts(s, c, a),
    "search_text_index": lambda s, c, a: _search_fts(s, c, a),
    "migrate_database": lambda s, c, a: _migrate_db(s, c, a),
    "migrate_iceberg_table": lambda s, c, a: _migrate_iceberg(s, c, a),
    "migrate_hudi_table": lambda s, c, a: _migrate_hudi(s, c, a),
    "copy_files": lambda s, c, a: _copy_files(s, c, a),
    # the procedures.md name for the same thing (CALL sys.copy)
    "copy": lambda s, c, a: _copy_files(s, c, a),
    # query service (paimon-flink procedure/QueryServiceProcedure.java:
    # CALL sys.query_service(table, parallelism) starts the lookup
    # service; ours returns the running servers' addresses — they serve
    # on daemon threads until stop() or process exit)
    "query_service": lambda s, c, a: _query_service(c, a),
    # training-data pillar: shard export as an engine procedure
    "export_training_shards": _export_shards,
    # privilege procedures (paimon-flink procedure/privilege/*.java)
    "init_file_based_privilege": lambda s, c, a: _init_privilege(c, a),
    "create_privileged_user": lambda s, c, a: _priv_cat(c).create_privileged_user(
        a["user"], a["password"]
    ),
    "drop_privileged_user": lambda s, c, a: _priv_cat(c).drop_privileged_user(
        a["user"]
    ),
    "grant_privilege_to_user": lambda s, c, a: _priv_cat(c).grant_privilege(
        a["user"], a["privilege"], a.get("database"), a.get("table")
    ),
    "revoke_privilege_from_user": lambda s, c, a: _priv_cat(c).revoke_privilege(
        a["user"], a["privilege"], a.get("database"), a.get("table")
    ),
}


def _init_privilege(cat, a):
    from flink_table_store_spark.privilege import init_file_based_privilege

    init_file_based_privilege(cat, a["root_password"])


def _query_service(cat, a):
    from flink_table_store_spark.service import LookupQueryServer

    path = cat.get_table(a["table"]).path
    n = int(a.get("parallelism", 1))
    servers = [
        LookupQueryServer(path, server_id=i, num_servers=n).start()
        for i in range(n)
    ]
    return servers


def _priv_cat(cat):
    from flink_table_store_spark.privilege import PrivilegedCatalog

    if not isinstance(cat, PrivilegedCatalog):
        raise ValueError(
            "this procedure requires a privileged catalog — construct "
            "PrivilegedCatalog(catalog, user, password) first"
        )
    return cat


def _create_gidx(spark, cat, a):
    from flink_table_store_spark.globalindex import create_global_index

    return create_global_index(
        spark,
        _t(cat, a),
        a.pop("index_name"),
        a.pop("column"),
        a.pop("key_col"),
        **a,
    )


def _drop_gidx(spark, cat, a):
    from flink_table_store_spark.globalindex import drop_global_index

    return drop_global_index(_t(cat, a), a.pop("index_name"))


def _extend_gidx(spark, cat, a):
    from flink_table_store_spark.globalindex import extend_global_index

    return extend_global_index(spark, _t(cat, a), a.pop("index_name"))


def _create_rollup(spark, cat, a):
    """CALL sys.create_rollup(rollup => 'db.r1h', time_col => 'ts',
    interval => '1 hour', group_cols => 'event_type string',
    metrics => 'n=*:count,sum_value=value:sum')."""
    from flink_table_store_spark.operators.rollup import (
        create_rollup_table,
    )

    groups = []
    for g in str(a.pop("group_cols", "") or "").split(","):
        if not g.strip():
            continue
        parts = g.strip().split(None, 1)
        if len(parts) != 2:
            raise ValueError(
                f"group_cols entry {g.strip()!r} must be 'name type' "
                "(e.g. 'event_type string')"
            )
        groups.append(tuple(parts))
    metrics = {}
    for m in str(a.pop("metrics")).split(","):
        out, spec = m.split("=", 1)
        # out=src:fn[:dtype] — e.g. 'n=*:count', 's=v:sum:bigint',
        # 'uniq=user_id:hll'; dtype may itself contain ':'-free text
        # only (decimal(20,2) has no colon)
        parts = [p.strip() for p in spec.split(":")]
        if len(parts) not in (2, 3):
            raise ValueError(
                f"metrics entry {m.strip()!r} must be "
                "'out=src:fn' or 'out=src:fn:dtype'"
            )
        metrics[out.strip()] = tuple(parts)
    create_rollup_table(
        cat,
        a.pop("rollup"),
        time_col=a.pop("time_col"),
        interval=a.pop("interval"),
        group_cols=groups,
        metrics=metrics,
        **a,
    )
    return True


def _refresh_rollup(spark, cat, a):
    """CALL sys.refresh_rollup(rollup => 'db.r1h',
    from_table => 'db.events', commit_identifier => ...) — or with
    incremental => true, fold exactly the source rows committed since
    the last incremental refresh (snapshot-range identifiers,
    crash-self-healing; see rollup.refresh_rollup_incremental)."""
    from flink_table_store_spark.operators.rollup import (
        refresh_rollup_incremental,
        update_rollup,
    )

    ru = cat.get_table(a.pop("rollup"))
    src = cat.get_table(a.pop("from_table"))
    if str(a.pop("incremental", "")).lower() in ("true", "1"):
        if a.get("where"):
            raise ValueError(
                "refresh_rollup: incremental => true derives its own "
                "batch (the source delta); 'where' is not composable "
                "with it"
            )
        return refresh_rollup_incremental(spark, ru, src)
    batch = src.to_df(spark)
    if a.get("where"):
        batch = batch.where(a.pop("where"))
    update_rollup(ru, batch, a.pop("commit_identifier", None))
    return True


def _create_fts(spark, cat, a):
    from flink_table_store_spark.datapipe.textindex import (
        create_text_search_index,
    )

    create_text_search_index(cat, a.pop("index"), **a)
    return True


def _update_fts(spark, cat, a):
    """Fold a source table's rows into the incremental text index:
    CALL sys.update_text_search_index(index => 'db.fts',
    from_table => 'db.docs', text_col => ..., key_col => ...,
    commit_identifier => ...)."""
    from flink_table_store_spark.datapipe.textindex import (
        get_text_search_index,
        update_text_search_index,
    )

    idx = get_text_search_index(cat, a.pop("index"))
    docs = cat.get_table(a.pop("from_table")).to_df(spark)
    update_text_search_index(idx, docs, **a)
    return True


def _search_fts(spark, cat, a):
    from flink_table_store_spark.datapipe.textindex import (
        get_text_search_index,
        search_text_index,
    )

    idx = get_text_search_index(cat, a.pop("index"))
    return search_text_index(spark, idx, a.pop("query"), **a)


def _migrate(spark, cat, a):
    from flink_table_store_spark.migrate import migrate_table

    return migrate_table(
        spark,
        cat,
        a.pop("source_location"),
        a.pop("table"),
        **a,
    )


def _migrate_iceberg(spark, cat, a):
    from flink_table_store_spark.migrate import migrate_iceberg_table

    return migrate_iceberg_table(spark, cat, a.pop("source_location"), a.pop("table"), **a)


def _migrate_hudi(spark, cat, a):
    from flink_table_store_spark.migrate import migrate_hudi_table

    return migrate_hudi_table(spark, cat, a.pop("source_location"), a.pop("table"), **a)


def _migrate_db(spark, cat, a):
    from flink_table_store_spark.migrate import migrate_database

    return migrate_database(spark, cat, a.pop("source_dir"), a.pop("database"), **a)


def _copy_files(spark, cat, a):
    from flink_table_store_spark.migrate import copy_files

    return copy_files(
        spark,
        cat,
        a.pop("source_table"),
        a.pop("target_table"),
        snapshot_id=a.get("snapshot_id"),
        tag=a.get("tag"),
        where=a.get("where"),
    )
