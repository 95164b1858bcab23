"""Streaming layer: snapshot-cursor source, exactly-once sink, changelog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.streaming import (
    SnapshotStream,
    changelog_diff,
    foreach_batch_writer,
    input_changelog,
    write_stream,
)


@pytest.fixture()
def pk_table(spark, warehouse):
    t = warehouse.create_table(
        "db.stream_pk",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "2"},
    )
    return t


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def test_source_latest_full_then_deltas(spark, pk_table):
    pk_table.write(_batch(spark, [(1, "a"), (2, "b")]))
    s = SnapshotStream(pk_table, startup_mode="latest-full")
    first = s.poll(spark)
    assert len(first) == 1 and first[0][0] == 1
    assert first[0][1].count() == 2
    assert s.poll(spark) == []  # nothing new

    pk_table.write(_batch(spark, [(2, "b2"), (3, "c")]))
    nxt = s.poll(spark)
    assert len(nxt) == 1 and nxt[0][0] == 2
    got = {r.k: r.v for r in nxt[0][1].collect()}
    assert got == {2: "b2", 3: "c"}


def test_source_from_snapshot_and_consumer_resume(spark, pk_table):
    for i in range(3):
        pk_table.write(_batch(spark, [(i, f"v{i}")]))
    s = SnapshotStream(pk_table, startup_mode="from-snapshot", from_snapshot=2, consumer_id="c1")
    ids = [sid for sid, _df in s.poll(spark)]
    assert ids == [2, 3]
    assert pk_table.snapshots.read_consumer("c1") == 4

    # a new reader with the same consumer id resumes past old batches
    pk_table.write(_batch(spark, [(9, "z")]))
    s2 = SnapshotStream(pk_table, startup_mode="latest-full", consumer_id="c1")
    ids2 = [sid for sid, _df in s2.poll(spark)]
    assert ids2 == [4]


def test_source_skips_compaction_snapshots(spark, pk_table):
    pk_table.write(_batch(spark, [(1, "a")]))
    pk_table.write(_batch(spark, [(1, "a2")]))
    s = SnapshotStream(pk_table, startup_mode="from-snapshot", from_snapshot=1)
    assert [sid for sid, _ in s.poll(spark)] == [1, 2]
    pk_table.compact(spark, full=True)
    assert s.poll(spark) == []  # COMPACT adds no delta rows


def test_sink_idempotent_replay(spark, pk_table):
    w = foreach_batch_writer(pk_table, sink_id="job1")
    w(_batch(spark, [(1, "a")]), 0)
    w(_batch(spark, [(1, "a")]), 0)  # replay of batch 0 — must not double-commit
    w(_batch(spark, [(2, "b")]), 1)
    assert pk_table.snapshots.latest_id() == 2
    assert pk_table.refresh().to_df(spark).count() == 2


def test_structured_streaming_end_to_end(spark, warehouse, tmp_path):
    t = warehouse.create_table(
        "db.stream_e2e", "k bigint, v timestamp", primary_keys=["k"], options={"bucket": "2"}
    )
    src = str(tmp_path / "in")
    spark.range(0, 100).select(
        (F.col("id") % 10).alias("k"), F.current_timestamp().alias("v")
    ).write.parquet(src)
    stream = spark.readStream.schema("k bigint, v timestamp").parquet(src)
    q = write_stream(
        stream, t, sink_id="file-job", checkpoint_dir=str(tmp_path / "ckpt"), watermark_col="v"
    )
    q.awaitTermination(120)
    assert t.refresh().to_df(spark).count() == 10  # PK dedup to 10 keys
    assert (t.snapshots.latest().watermark or 0) > 0  # persisted watermark (T7)


def test_input_changelog_rowkinds(spark, pk_table):
    pk_table.write(_batch(spark, [(1, "a"), (2, "b")]))
    pk_table.delete(spark, __import__("flink_table_store_spark.predicate", fromlist=["equal"]).equal("k", 1))
    cl = input_changelog(spark, pk_table)
    kinds = sorted((r.k, r.rowkind) for r in cl.collect())
    assert (1, "-D") in kinds and (1, "+I") in kinds and (2, "+I") in kinds


def test_changelog_diff_and_binlog(spark, pk_table):
    pk_table.write(_batch(spark, [(1, "a"), (2, "b"), (3, "c")]))
    pk_table.write(_batch(spark, [(2, "b2"), (4, "d")]))
    pk_table.delete(spark, __import__("flink_table_store_spark.predicate", fromlist=["equal"]).equal("k", 3))
    cl = changelog_diff(spark, pk_table, 1, 3)
    got = sorted((r.rowkind, r.k) for r in cl.collect())
    assert got == [("+I", 4), ("+U", 2), ("-D", 3), ("-U", 2)]

    from flink_table_store_spark.streaming.changelog import binlog

    bl = {r.k: r.op for r in binlog(spark, pk_table, 1, 3).collect()}
    assert bl == {2: "U", 3: "-D", 4: "+I"}


def test_incremental_tvf_variants(spark, pk_table):
    import time

    pk_table.write(_batch(spark, [(1, "a")]))
    t1 = pk_table.snapshots.latest().time_millis
    time.sleep(0.05)
    pk_table.write(_batch(spark, [(2, "b")]))
    t2 = pk_table.snapshots.latest().time_millis
    got = pk_table.incremental_read_between_timestamps(spark, t1, t2).collect()
    assert [(r.k, r.v) for r in got] == [(2, "b")]

    pk_table.create_tag("tg")
    pk_table.write(_batch(spark, [(3, "c")]))
    got2 = pk_table.incremental_read_to_tag(spark, "tg").collect()
    assert [(r.k, r.v) for r in got2] == [(2, "b")]


def test_cdc_debezium_ingest_with_schema_evolution(spark, warehouse):
    from flink_table_store_spark.streaming.cdc import cdc_apply, parse_debezium

    t = warehouse.create_table(
        "db.cdc", "id bigint, name string", primary_keys=["id"], options={"bucket": "2"}
    )
    batch1 = spark.createDataFrame(
        [
            ('{"op":"c","after":{"id":"1","name":"a"}}',),
            ('{"op":"c","after":{"id":"2","name":"b"}}',),
        ],
        "value string",
    )
    cdc_apply(t, parse_debezium(batch1))
    # batch 2: update, delete, and a NEW column "email" -> schema evolves
    batch2 = spark.createDataFrame(
        [
            ('{"op":"u","before":{"id":"1","name":"a"},"after":{"id":"1","name":"a2","email":"x@y"}}',),
            ('{"op":"d","before":{"id":"2","name":"b"}}',),
        ],
        "value string",
    )
    cdc_apply(t, parse_debezium(batch2))
    rows = t.to_df(spark).collect()
    assert len(rows) == 1
    assert (rows[0].id, rows[0].name, rows[0].email) == (1, "a2", "x@y")


def test_cdc_file_stream_connector(spark, warehouse, tmp_path):
    """File-based CDC connector: Structured Streaming tails a directory
    of Debezium JSON-line files, applies batches exactly-once, and a
    second run picks up only new files (checkpointed offsets)."""
    from flink_table_store_spark.streaming.cdc import cdc_file_stream

    t = warehouse.create_table(
        "db.cdcfile", "id bigint, name string", primary_keys=["id"], options={"bucket": "1"}
    )
    src = tmp_path / "cdc_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "f1.jsonl").write_text(
        '{"op":"c","after":{"id":"1","name":"a"}}\n'
        '{"op":"c","after":{"id":"2","name":"b"}}\n'
    )
    q = cdc_file_stream(spark, t, str(src), "cdcfile-sink", ckpt)
    q.awaitTermination(120)
    assert {(r.id, r.name) for r in t.refresh().to_df(spark).collect()} == {
        (1, "a"),
        (2, "b"),
    }

    # new file with an update + delete; old file must not reapply
    (src / "f2.jsonl").write_text(
        '{"op":"u","before":{"id":"1","name":"a"},"after":{"id":"1","name":"a2"}}\n'
        '{"op":"d","before":{"id":"2","name":"b"}}\n'
    )
    q2 = cdc_file_stream(spark, t.refresh(), str(src), "cdcfile-sink", ckpt)
    q2.awaitTermination(120)
    t2 = t.refresh()
    assert {(r.id, r.name) for r in t2.to_df(spark).collect()} == {(1, "a2")}


def test_cdc_canal_ingest(spark, warehouse):
    from flink_table_store_spark.streaming.cdc import cdc_apply, parse_canal

    t = warehouse.create_table(
        "db.cdc2", "id bigint, v string", primary_keys=["id"], options={"bucket": "1"}
    )
    batch = spark.createDataFrame(
        [
            ('{"type":"INSERT","data":[{"id":"1","v":"x"},{"id":"2","v":"y"}]}',),
            ('{"type":"DELETE","data":[{"id":"2","v":"y"}]}',),
        ],
        "value string",
    )
    cdc_apply(t, parse_canal(batch))
    got = {r.id: r.v for r in t.to_df(spark).collect()}
    assert got == {1: "x"}


def test_cdc_foreach_batch_idempotent(spark, warehouse):
    from flink_table_store_spark.streaming.cdc import cdc_foreach_batch

    t = warehouse.create_table(
        "db.cdc3", "id bigint, v string", primary_keys=["id"], options={"bucket": "1"}
    )
    fb = cdc_foreach_batch(t, sink_id="job1")
    batch = spark.createDataFrame([('{"op":"c","after":{"id":"1","v":"a"}}',)], "value string")
    fb(batch, 0)
    fb(batch, 0)  # replay of same batch id must not double-commit
    assert t.snapshots.latest_id() == 1
    assert t.to_df(spark).count() == 1


def test_lookup_changelog_per_commit(spark, warehouse):
    from flink_table_store_spark.streaming.changelog import lookup_changelog

    t = warehouse.create_table(
        "db.lcp", "k bigint, v string", primary_keys=["k"], options={"bucket": "1"}
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    t.write(spark.createDataFrame([(1, "a2"), (3, "c")], "k bigint, v string"))
    # snapshot 1: everything +I
    k1 = {(r.rowkind, r.k) for r in lookup_changelog(spark, t, 1).collect()}
    assert k1 == {("+I", 1), ("+I", 2)}
    # snapshot 2: available immediately after the write, no compaction
    k2 = {(r.rowkind, r.k) for r in lookup_changelog(spark, t, 2).collect()}
    assert k2 == {("-U", 1), ("+U", 1), ("+I", 3)}


def test_source_read_limit_splits_batches(spark, pk_table):
    """S13 ReadLimit: a snapshot's delta splits into sub-batches at
    (partition, bucket) granularity; union of sub-batches == the delta."""
    pk_table.write(_batch(spark, [(i, f"v{i}") for i in range(8)]))
    s = SnapshotStream(
        pk_table, startup_mode="from-snapshot", from_snapshot=1, max_files_per_batch=1
    )
    batches = s.poll(spark)
    assert len(batches) == 2  # bucket=2 → two merge groups
    assert all(sid == 1 for sid, _ in batches)
    got = {r.k for b in batches for r in b[1].collect()}
    assert got == set(range(8))


def test_source_changelog_scan_mode(spark, pk_table):
    """T2 ChangelogFollowUpScanner: scan='changelog' yields rowkind'd
    rows; an upsert of an existing key shows as -U/+U."""
    pk_table.write(_batch(spark, [(1, "a"), (2, "b")]))
    s = SnapshotStream(
        pk_table, startup_mode="from-snapshot", from_snapshot=2, scan="changelog"
    )
    pk_table.write(_batch(spark, [(1, "a2"), (3, "c")]))
    batches = s.poll(spark)
    assert len(batches) == 1
    rows = {(r.rowkind, r.k, r.v) for r in batches[0][1].collect()}
    assert rows == {("-U", 1, "a"), ("+U", 1, "a2"), ("+I", 3, "c")}


def test_source_from_creation_timestamp_modes(spark, pk_table):
    import time

    pk_table.write(_batch(spark, [(1, "a")]))
    mid_ts = pk_table.snapshots.load(1).time_millis
    time.sleep(0.01)
    pk_table.write(_batch(spark, [(2, "b")]))

    # ts within [earliest, latest] commit range -> from-snapshot at the
    # first snapshot committed at/after ts (CoreOptions.java:3432-3437)
    s = SnapshotStream(
        pk_table, startup_mode="from-creation-timestamp", from_timestamp=mid_ts
    )
    ids = [sid for sid, _df in s.poll(spark)]
    assert ids == [1, 2]

    # ts after the latest commit -> file-creation-time fallback: only
    # files created at/after ts appear in the first batch
    future = pk_table.snapshots.load(2).time_millis + 10_000
    s2 = SnapshotStream(
        pk_table, startup_mode="from-file-creation-time", from_timestamp=future
    )
    assert s2.poll(spark) == []  # no file that recent, no deltas yet

    # data files are written before their snapshot commit stamp, so the
    # floor sits after snapshot 1's commit (file 1 predates it)
    cutoff = mid_ts + 1
    s3 = SnapshotStream(
        pk_table, startup_mode="from-file-creation-time", from_timestamp=cutoff
    )
    batches = s3.poll(spark)
    assert len(batches) == 1
    assert {r.k for r in batches[0][1].collect()} == {2}


def test_source_incremental_and_default_modes(spark, pk_table):
    for i in range(4):
        pk_table.write(_batch(spark, [(i, f"v{i}")]))
    s = SnapshotStream(
        pk_table, startup_mode="incremental", from_snapshot=1, until_snapshot=3
    )
    ids = [sid for sid, _df in s.poll(spark)]
    assert ids == [2, 3]
    assert s.poll(spark) == []  # bounded: snapshot 4 is past the end

    d = SnapshotStream(pk_table, startup_mode="default")
    first = d.poll(spark)
    assert first[0][0] == 4 and first[0][1].count() == 4


def test_cdc_kafka_shaped_frames_apply(spark, warehouse, tmp_path):
    """Kafka CDC connector (S21): the foreachBatch apply path consumes a
    kafka-shaped (key binary, value binary, timestamp, topic, partition,
    offset) micro-batch unchanged — proving cdc_kafka_stream's one-line
    source swap; the kafka source itself is probed and absent here."""
    import datetime

    from flink_table_store_spark.streaming.cdc import (
        cdc_foreach_batch,
        cdc_kafka_stream,
        kafka_source_available,
    )

    t = warehouse.create_table(
        "db.cdckafka", "id bigint, name string", primary_keys=["id"], options={"bucket": "1"}
    )
    now = datetime.datetime(2026, 1, 1)
    rows = [
        (b"1", b'{"op":"c","after":{"id":"1","name":"a"}}', "cdc", 0, 0, now),
        (b"2", b'{"op":"c","after":{"id":"2","name":"b"}}', "cdc", 0, 1, now),
        (b"1", b'{"op":"u","before":{"id":"1","name":"a"},"after":{"id":"1","name":"a2"}}', "cdc", 0, 2, now),
        (b"2", b'{"op":"d","before":{"id":"2","name":"b"}}', "cdc", 0, 3, now),
    ]
    kafka_batch = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset bigint, timestamp timestamp",
    )
    apply_fn = cdc_foreach_batch(t, "kafka-sink")
    apply_fn(kafka_batch, 0)
    assert {(r.id, r.name) for r in t.refresh().to_df(spark).collect()} == {(1, "a2")}
    # exactly-once: re-delivery of the same batch id is a no-op
    apply_fn(kafka_batch, 0)
    assert t.refresh().snapshots.latest().id == 1

    # the real kafka source is an add-on jar; absent → clear error
    if not kafka_source_available(spark):
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="kafka source not on classpath"):
            cdc_kafka_stream(
                spark, t, "localhost:9092", "cdc", "kafka-sink", str(tmp_path / "ck")
            )


def test_scan_bounded_watermark(spark, warehouse):
    """scan.bounded.watermark (flink source BoundedChecker.watermark):
    the stream ends when a snapshot with a LARGER watermark appears —
    that snapshot is not emitted."""
    from flink_table_store_spark.streaming.source import SnapshotStream

    t = warehouse.create_table(
        "db.bw", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "1"},
    )
    ddl = "k bigint, v string"
    t.write(spark.createDataFrame([(1, "a")], ddl), watermark=100)
    st = SnapshotStream(t, startup_mode="from-snapshot", from_snapshot=1,
                        bounded_watermark=250)
    got = [sid for sid, _ in st.poll(spark)]
    assert got == [1]
    t.write(spark.createDataFrame([(2, "b")], ddl), watermark=200)
    t.write(spark.createDataFrame([(3, "c")], ddl), watermark=300)  # > bound
    t.write(spark.createDataFrame([(4, "d")], ddl), watermark=400)
    got = [sid for sid, _ in st.poll(spark)]
    assert got == [2]  # snapshot with wm 300 ends the stream, unemitted
    assert st.poll(spark) == []  # ended stays ended
    # the table OPTION spells the same thing
    t2 = warehouse.create_table(
        "db.bw2", ddl, primary_keys=["k"],
        options={"bucket": "1", "scan.bounded.watermark": "150"},
    )
    t2.write(spark.createDataFrame([(1, "a")], ddl), watermark=100)
    t2.write(spark.createDataFrame([(2, "b")], ddl), watermark=200)
    st2 = SnapshotStream(t2, startup_mode="from-snapshot", from_snapshot=1)
    assert [sid for sid, _ in st2.poll(spark)] == [1]


def test_full_compaction_delta_commits_batch(spark, warehouse):
    """full-compaction.delta-commits > 0: every batch commit triggers a
    full compaction (CoreOptions.FULL_COMPACTION_DELTA_COMMITS batch
    semantics)."""
    t = warehouse.create_table(
        "db.fcd", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "1", "full-compaction.delta-commits": "1"},
    )
    ddl = "k bigint, v string"
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ddl))
    t.write(spark.createDataFrame([(1, "a2")], ddl))
    t = t.refresh()
    snap = t.snapshots.latest()
    assert snap.commit_kind == "COMPACT"  # write auto-compacted
    # single max-level run per bucket: reads take the raw path
    entries = t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list)
    from flink_table_store_spark.manifest import MAX_LEVEL
    assert all(e.level == MAX_LEVEL for e in entries)
    assert sorted((r.k, r.v) for r in t.to_df(spark).collect()) == [
        (1, "a2"), (2, "b")]


def test_streaming_read_overwrite_option(spark, warehouse):
    """streaming-read-overwrite (DeltaFollowUpScanner: only APPEND
    commits follow by default; OVERWRITE joins with the option)."""
    from flink_table_store_spark.streaming.source import SnapshotStream

    t = warehouse.create_table(
        "db.srow", "k bigint, pt string", partition_keys=["pt"]
    )
    t.write(spark.createDataFrame([(1, "x")], "k bigint, pt string"))
    src = SnapshotStream(t, startup_mode="from-snapshot", from_snapshot=2)
    t.write(
        spark.createDataFrame([(9, "x")], "k bigint, pt string"),
        overwrite=True,
    )
    t.write(spark.createDataFrame([(3, "y")], "k bigint, pt string"))
    batches = []
    for _sid, df in src.poll(spark):
        batches.extend((r.k, r.pt) for r in df.collect())
    assert batches == [(3, "y")]  # overwrite snapshot skipped by default

    t2 = warehouse.create_table(
        "db.srow2", "k bigint, pt string", partition_keys=["pt"],
        options={"streaming-read-overwrite": "true"},
    )
    t2.write(spark.createDataFrame([(1, "x")], "k bigint, pt string"))
    src2 = SnapshotStream(t2, startup_mode="from-snapshot", from_snapshot=2)
    t2.write(
        spark.createDataFrame([(9, "x")], "k bigint, pt string"),
        overwrite=True,
    )
    got = []
    for _sid, df in src2.poll(spark):
        got.extend((r.k, r.pt) for r in df.collect())
    assert got == [(9, "x")]  # overwrite's new rows emitted with opt-in


def test_streaming_read_overwrite_refused_with_producer(spark, warehouse):
    import pytest
    from flink_table_store_spark.streaming.source import SnapshotStream

    t = warehouse.create_table(
        "db.srow3", "k bigint, v string",
        primary_keys=["k"],
        options={
            "streaming-read-overwrite": "true",
            "changelog-producer": "full-compaction",
        },
    )
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    src = SnapshotStream(t, startup_mode="from-snapshot",
                         from_snapshot=1, scan="changelog")
    with pytest.raises(ValueError, match="streaming-read-overwrite"):
        for _sid, df in src.poll(spark):
            df.collect()
