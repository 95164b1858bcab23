"""`file.format` option: ORC-backed managed tables (SURVEY §2.1 S9;
reference CoreOptions.java:258 file.format = parquet|orc|avro).

The engine stores the format in the table options, writes data files
with Spark's native writer for that format, collects file stats with a
distributed aggregation (non-parquet has no driver-readable footer),
and the read path picks the reader per file-name suffix — so a table
whose `file.format` evolves keeps reading old generations natively.
"""

from __future__ import annotations

import pytest

from flink_table_store_spark import predicate as P


def _live_entries(t):
    snap = t.snapshots.latest()
    return t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)


@pytest.fixture()
def orc_append(spark, warehouse):
    df = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i)) for i in range(100)],
        "id bigint, pt string, v double",
    )
    t = warehouse.create_table(
        "db.orc_a", df.schema, partition_keys=["pt"], options={"file.format": "orc"}
    )
    t.write(df)
    return t


def test_orc_roundtrip_and_files(spark, orc_append):
    got = orc_append.to_df(spark)
    assert got.count() == 100
    assert {r.id for r in got.collect()} == set(range(100))
    entries = _live_entries(orc_append)
    assert entries and all(e.file_name.endswith(".orc") for e in entries)


def test_orc_stats_pruning(spark, orc_append):
    df2 = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i)) for i in range(1000, 1100)],
        "id bigint, pt string, v double",
    )
    orc_append.write(df2)
    plan = orc_append.read_builder().with_filter(P.greater_or_equal("id", 1000)).plan()
    assert plan.raw_entries, "plan must keep the matching files"
    assert all(e.stats["id"]["max"] >= 1000 for e in plan.raw_entries)
    got = orc_append.to_df(spark, predicate=P.greater_or_equal("id", 1000))
    assert got.count() == 100


def test_orc_pk_merge_on_read(spark, warehouse):
    df = spark.createDataFrame(
        [(i, "a", i * 1.0) for i in range(50)], "k bigint, pt string, v double"
    )
    t = warehouse.create_table(
        "db.orc_pk",
        df.schema,
        partition_keys=["pt"],
        primary_keys=["k", "pt"],
        options={"file.format": "orc", "bucket": "2"},
    )
    t.write(df)
    upd = spark.createDataFrame(
        [(i, "a", -1.0) for i in range(0, 50, 2)], "k bigint, pt string, v double"
    )
    t.write(upd)
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert len(got) == 50
    assert all(got[k] == -1.0 for k in range(0, 50, 2))
    assert all(got[k] == float(k) for k in range(1, 50, 2))


def test_format_evolution_mixed_files(spark, warehouse):
    """Old parquet generation + new orc generation read together."""
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id bigint, v double")
    t = warehouse.create_table("db.mixed", df.schema)
    t.write(df)
    t.evolve_schema([{"action": "set_option", "key": "file.format", "value": "orc"}])
    t.write(spark.createDataFrame([(3, 30.0)], "id bigint, v double"))
    entries = _live_entries(t)
    exts = {e.file_name.rsplit(".", 1)[-1] for e in entries}
    assert exts == {"parquet", "orc"}
    assert {r.id for r in t.to_df(spark).collect()} == {1, 2, 3}


def test_orc_compaction(spark, warehouse):
    df = spark.createDataFrame([(i, i * 1.0) for i in range(20)], "k bigint, v double")
    t = warehouse.create_table(
        "db.orc_c", df.schema, primary_keys=["k"],
        options={"file.format": "orc", "bucket": "1"},
    )
    for lo in (0, 5, 10):
        t.write(
            spark.createDataFrame([(i, -float(i)) for i in range(lo, lo + 10)], "k bigint, v double")
        )
    t.compact(spark, full=True)
    entries = _live_entries(t)
    assert all(e.file_name.endswith(".orc") for e in entries)
    assert all(e.level > 0 for e in entries)
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert len(got) == 20


def test_lance_format_gated_on_missing_connector(spark, warehouse):
    """S9 lance: the format is recognized but requires the lance package
    + Spark-Lance connector; absent here, writes fail with a clear
    actionable error instead of a deep Spark stack."""
    import pytest

    t = warehouse.create_table(
        "db.lance_t", "k bigint, v string", options={"file.format": "lance"}
    )
    try:
        import lance  # noqa: F401

        has_lance = True
    except ImportError:
        has_lance = False
    if has_lance:
        pytest.skip("lance installed — gating not exercised")
    with pytest.raises(NotImplementedError, match="lance"):
        t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))


def test_file_compression_option(spark, warehouse):
    """file.compression / file.compression.zstd-level reach the parquet
    writer on both the Spark and the local no-Spark write paths."""
    import os
    import pyarrow.parquet as pq

    t = warehouse.create_table(
        "db.comp", "k bigint, v string",
        options={"file.compression": "zstd", "file.compression.zstd-level": "5"},
    )
    t.write(spark.createDataFrame([(i, "x" * 50) for i in range(100)], "k bigint, v string"))
    import pyarrow as pa

    t.write_arrow(pa.table({"k": [200], "v": ["y"]}))
    files = []
    for root, _dirs, names in os.walk(os.path.join(t.path, "data")):
        files += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        assert md.row_group(0).column(0).compression == "ZSTD"
    assert t.to_df(spark).count() == 101
