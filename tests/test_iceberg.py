"""Iceberg compatibility export (iceberg.py, avro_io.py).

Validation strategy (no Iceberg reader exists in this environment):
1. avro_io round-trips its own output AND is cross-validated against
   the real JVM Avro reader bundled with Spark (org.apache.avro) —
   an independent implementation of the format.
2. The exported metadata's data-file list is read with DuckDB and
   compared against the engine's own scan — the set of parquet files
   an Iceberg reader would scan must reproduce the table contents.
3. Structural assertions on the metadata JSON per the public Iceberg
   v2 spec (format-version, schemas, partition-specs, snapshots).
"""

from __future__ import annotations

import io
import json
import os

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_table_store_spark import avro_io, iceberg
from flink_table_store_spark.catalog import Catalog

# ---------------------------------------------------------------------------
# avro_io
# ---------------------------------------------------------------------------

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": ["null", "long"], "default": None},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "bo", "type": "boolean"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {
            "name": "nested",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "long"}],
                },
            ],
            "default": None,
        },
    ],
}

records_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "i": st.integers(-(2**31), 2**31 - 1),
            "l": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            "s": st.text(max_size=40),
            "b": st.binary(max_size=40),
            "d": st.floats(allow_nan=False, allow_infinity=False),
            "f": st.just(0.5),  # float32 round-trip exactness
            "bo": st.booleans(),
            "arr": st.lists(st.integers(-(2**40), 2**40), max_size=5),
            "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
            "nested": st.one_of(
                st.none(), st.fixed_dictionaries({"x": st.integers(-100, 100)})
            ),
        }
    ),
    max_size=8,
)


@settings(max_examples=40, deadline=None)
@given(records_strategy)
def test_avro_roundtrip_property(tmp_path_factory, records):
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    avro_io.write_container(path, SCHEMA, records)
    schema2, out = avro_io.read_container(path)
    assert schema2 == SCHEMA
    assert out == records


def test_avro_zigzag_longs():
    for n in (0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        buf = io.BytesIO()
        avro_io.write_long(buf, n)
        buf.seek(0)
        assert avro_io.read_long(buf) == n


def test_avro_jvm_cross_validation(spark, tmp_path):
    """The JVM's org.apache.avro reader (an independent implementation)
    must parse our container files identically."""
    path = str(tmp_path / "x.avro")
    recs = [
        {
            "i": -7,
            "l": None,
            "s": "héllo",
            "b": b"\x00\xff",
            "d": 1.25,
            "f": 0.5,
            "bo": True,
            "arr": [1, 2, 3],
            "m": {"k": "v"},
            "nested": {"x": 9},
        }
    ]
    avro_io.write_container(path, SCHEMA, recs)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    rows = []
    while reader.hasNext():
        rows.append(reader.next())
    reader.close()
    assert len(rows) == 1
    r = rows[0]
    assert r.get("i") == -7
    assert r.get("l") is None
    assert str(r.get("s")) == "héllo"
    assert r.get("d") == 1.25
    assert r.get("bo") is True
    assert str(r.get("arr")) == "[1, 2, 3]"
    assert r.get("nested").get("x") == 9


# ---------------------------------------------------------------------------
# iceberg export
# ---------------------------------------------------------------------------


@pytest.fixture()
def warehouse(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


_DUCK = duckdb.connect()


def _duck_read(files: list[str]):
    lst = ", ".join(f"'{f}'" for f in files)
    return _DUCK.sql(f"SELECT * FROM read_parquet([{lst}])")


def test_append_table_export_matches_engine_scan(spark, warehouse):
    li = _lineitem(spark).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate"
    )
    t = warehouse.create_table(
        "db.ice_append",
        li.schema,
        partition_keys=["l_returnflag"],
        options={"metadata.iceberg.storage": "table-location"},
    )
    t.write(li.where(F.col("l_orderkey") % 2 == 0))
    t.write(li.where(F.col("l_orderkey") % 2 == 1))

    meta = iceberg.read_metadata(t.path)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == 2
    assert len(meta["snapshots"]) == 2
    spec = meta["partition-specs"][0]
    assert spec["fields"][0]["name"] == "l_returnflag"
    assert spec["fields"][0]["transform"] == "identity"
    names = {f["name"] for f in meta["schemas"][0]["fields"]}
    assert "l_orderkey" in names and "l_returnflag" in names

    files = iceberg.current_data_files(t.path)
    assert files and all(f["file_format"] == "PARQUET" for f in files)
    assert all(f["partition"]["l_returnflag"] in ("A", "N", "R") for f in files)
    # an Iceberg reader scans exactly these parquet files — DuckDB stands
    # in for it; contents must equal the engine's own scan
    duck = _duck_read([f["file_path"] for f in files])
    expected = t.to_df(spark)
    assert duck.count("*").fetchone()[0] == expected.count()
    dsum = duck.aggregate("sum(l_orderkey) h, sum(l_quantity) q").fetchone()
    esum = expected.agg(
        F.sum("l_orderkey").cast("double"), F.sum("l_quantity").cast("double")
    ).first()
    assert float(dsum[0]) == float(esum[0])
    assert abs(float(dsum[1]) - float(esum[1])) < 1e-6


def test_incremental_append_reuses_manifests(spark, warehouse):
    li = _lineitem(spark).select("l_orderkey", "l_quantity")
    t = warehouse.create_table(
        "db.ice_incr",
        li.schema,
        options={"metadata.iceberg.storage": "table-location"},
    )
    t.write(li.limit(10))
    state1 = json.load(open(os.path.join(t.path, "metadata", iceberg.STATE_FILE)))
    t.write(li.limit(20))
    state2 = json.load(open(os.path.join(t.path, "metadata", iceberg.STATE_FILE)))
    # append-only commit: previous manifest files are reused untouched
    paths1 = [m["row"]["manifest_path"] for m in state1["manifests"]]
    paths2 = [m["row"]["manifest_path"] for m in state2["manifests"]]
    assert paths2[: len(paths1)] == paths1
    assert len(paths2) == len(paths1) + 1
    # second manifest records only the new files
    added = state2["manifests"][-1]["row"]
    assert added["added_files_count"] > 0 and added["existing_files_count"] == 0


def test_numeric_partition_bounds_are_typed(spark, warehouse):
    """Manifest-list partition summaries must compare TYPED values: with
    string comparison "10" < "9" inverts the bounds and an Iceberg
    reader's manifest pruning would skip matching manifests."""
    import struct

    df = spark.range(0, 120).select(
        F.col("id").alias("v"), (F.col("id") % 12).cast("int").alias("p")
    )
    t = warehouse.create_table(
        "db.ice_numpart",
        df.schema,
        partition_keys=["p"],
        options={"metadata.iceberg.storage": "table-location"},
    )
    t.write(df)  # partitions 0..11: lexicographic max is "9", typed max is 11
    meta = iceberg.read_metadata(t.path)
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _schema, rows = avro_io.read_container(cur["manifest-list"])
    assert rows
    for r in rows:
        summ = r["partitions"][0]
        lo = struct.unpack("<i", summ["lower_bound"])[0]
        hi = struct.unpack("<i", summ["upper_bound"])[0]
        assert lo == 0 and hi == 11


def test_delete_consolidates_manifest(spark, warehouse):
    from flink_table_store_spark import predicate as P

    li = _lineitem(spark).select("l_orderkey", "l_quantity")
    t = warehouse.create_table(
        "db.ice_del",
        li.schema,
        options={"metadata.iceberg.storage": "table-location"},
    )
    t.write(li)
    t.delete(spark, P.less_than("l_quantity", 10))
    t = t.refresh()
    files = iceberg.current_data_files(t.path)
    duck = _duck_read([f["file_path"] for f in files])
    assert duck.count("*").fetchone()[0] == t.to_df(spark).count()
    assert duck.aggregate("min(l_quantity)").fetchone()[0] >= 10
    meta = iceberg.read_metadata(t.path)
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert cur["summary"]["operation"] == "overwrite"


def test_pk_table_exports_only_compacted_files(spark, warehouse):
    li = _lineitem(spark).select("l_orderkey", "l_linenumber", "l_quantity")
    t = warehouse.create_table(
        "db.ice_pk",
        li.schema,
        primary_keys=["l_orderkey", "l_linenumber"],
        options={"bucket": "2", "metadata.iceberg.storage": "table-location"},
    )
    t.write(li)
    # uncompacted level-0 runs are NOT visible to Iceberg
    # (IcebergCommitCallback.shouldAddFileToIceberg: level == maxLevel)
    assert iceberg.current_data_files(t.path) == []
    t.compact(spark, full=True)
    t = t.refresh()
    files = iceberg.current_data_files(t.path)
    assert files
    duck = _duck_read([f["file_path"] for f in files])
    # compacted files contain engine system columns; compare shared cols
    assert duck.count("*").fetchone()[0] == t.to_df(spark).count()
    dsum = duck.aggregate("sum(l_quantity)").fetchone()[0]
    esum = t.to_df(spark).agg(F.sum("l_quantity")).first()[0]
    assert abs(float(dsum) - float(esum)) < 1e-6


def test_bounds_serialization_and_stats(spark, warehouse):
    li = _lineitem(spark).select("l_orderkey", "l_shipdate", "l_returnflag")
    t = warehouse.create_table(
        "db.ice_bounds",
        li.schema,
        options={"metadata.iceberg.storage": "table-location"},
    )
    t.write(li)
    files = iceberg.current_data_files(t.path)
    f = files[0]
    fid = {x.name: x.id for x in t.schema.fields}
    lb = {e["key"]: e["value"] for e in f["lower_bounds"]}
    ub = {e["key"]: e["value"] for e in f["upper_bounds"]}
    import struct as _s

    lo = _s.unpack("<q", lb[fid["l_orderkey"]])[0]
    hi = _s.unpack("<q", ub[fid["l_orderkey"]])[0]
    row = (
        _duck_read([f["file_path"]])
        .aggregate("min(l_orderkey), max(l_orderkey)")
        .fetchone()
    )
    assert (lo, hi) == (int(row[0]), int(row[1]))
    vc = {e["key"]: e["value"] for e in f["value_counts"]}
    assert vc[fid["l_orderkey"]] == f["record_count"]


def test_manifest_list_readable_by_jvm_avro(spark, warehouse):
    li = _lineitem(spark).select("l_orderkey", "l_quantity")
    t = warehouse.create_table(
        "db.ice_jvm",
        li.schema,
        options={"metadata.iceberg.storage": "table-location"},
    )
    t.write(li)
    meta = iceberg.read_metadata(t.path)
    snap = meta["snapshots"][-1]
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(snap["manifest-list"]),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    rows = []
    while reader.hasNext():
        rows.append(reader.next())
    reader.close()
    assert rows, "manifest list unreadable by JVM Avro"
    mpath = str(rows[0].get("manifest_path"))
    assert os.path.exists(mpath)
    r2 = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(mpath), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    entries = []
    while r2.hasNext():
        entries.append(r2.next())
    r2.close()
    assert entries and entries[0].get("status") == 1
    assert os.path.exists(str(entries[0].get("data_file").get("file_path")))


def test_dv_table_exports_position_deletes(spark, warehouse):
    from flink_table_store_spark import predicate as P

    li = _lineitem(spark).select("l_orderkey", "l_linenumber", "l_quantity")
    t = warehouse.create_table(
        "db.ice_dv",
        li.schema,
        options={
            "deletion-vectors.enabled": "true",
            "metadata.iceberg.storage": "table-location",
        },
    )
    t.write(li)
    t.delete(spark, P.less_than("l_quantity", 10))
    t = t.refresh()
    data = iceberg.current_data_files(t.path)
    dels = iceberg.current_position_deletes(t.path)
    assert data and dels
    assert all(d["content"] == 1 for d in dels)
    # DuckDB applies the position deletes exactly as an Iceberg reader
    # would: anti-join (file, row position) pairs against the data scan
    dl = ", ".join(f"'{d['file_path']}'" for d in dels)
    fl = ", ".join(f"'{d['file_path']}'" for d in data)
    kept = _DUCK.sql(
        f"""
        SELECT count(*), sum(l_quantity)
        FROM (
          SELECT * FROM read_parquet([{fl}], filename=true, file_row_number=true) d
          ANTI JOIN read_parquet([{dl}]) x
          ON d.filename = x.file_path AND d.file_row_number = x.pos
        )
        """
    ).fetchone()
    eng = t.to_df(spark).agg(
        F.count(F.lit(1)), F.sum("l_quantity").cast("double")
    ).first()
    assert kept[0] == eng[0]
    assert abs(float(kept[1]) - float(eng[1])) < 1e-6
    # delete positions sum matches the DV row count the engine reports
    ndel = _DUCK.sql(f"SELECT count(*) FROM read_parquet([{dl}])").fetchone()[0]
    assert ndel == li.count() - eng[0]


def test_avro_deflate_codec_from_jvm_writer(spark, tmp_path):
    """External Iceberg writers compress manifests (deflate by default);
    our reader must decode a JVM-written deflate container."""
    path = str(tmp_path / "defl.avro")
    jvm = spark._jvm
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "s", "type": "string"},
            ],
        }
    )
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(sch, jvm.java.io.File(path))
    for i in range(100):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("a", i)
        rec.put("s", f"row-{i}" * 10)
        writer.append(rec)
    writer.close()
    _, recs = avro_io.read_container(path)
    assert len(recs) == 100
    assert recs[7] == {"a": 7, "s": "row-7" * 10}


def test_migrate_iceberg_roundtrip(spark, warehouse):
    """Native table -> Iceberg export -> migrate back as a new native
    table: contents must survive both directions, files linked not
    rewritten."""
    from flink_table_store_spark.migrate import migrate_iceberg_table

    li = _lineitem(spark).select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"
    )
    src = warehouse.create_table(
        "db.ice_src",
        li.schema,
        partition_keys=["l_returnflag"],
        options={"metadata.iceberg.storage": "table-location"},
    )
    src.write(li)
    dst = migrate_iceberg_table(spark, warehouse, src.path, "db.ice_migrated")
    assert dst.schema.partition_keys == ["l_returnflag"]
    a = src.to_df(spark)
    b = dst.to_df(spark)
    assert b.count() == a.count()
    asum = a.agg(F.sum("l_orderkey"), F.sum("l_quantity")).first()
    bsum = b.agg(F.sum("l_orderkey"), F.sum("l_quantity")).first()
    assert asum == bsum
    # partition pruning works on the migrated table
    from flink_table_store_spark import predicate as P

    pr = dst.to_df(spark, predicate=P.equal("l_returnflag", "R"))
    assert pr.count() == a.where(F.col("l_returnflag") == "R").count()


def test_migrate_iceberg_refuses_delete_files(spark, warehouse):
    from flink_table_store_spark import predicate as P
    from flink_table_store_spark.migrate import migrate_iceberg_table

    li = _lineitem(spark).select("l_orderkey", "l_quantity")
    src = warehouse.create_table(
        "db.ice_src_dv",
        li.schema,
        options={
            "deletion-vectors.enabled": "true",
            "metadata.iceberg.storage": "table-location",
        },
    )
    src.write(li)
    src.delete(spark, P.less_than("l_quantity", 10))
    with pytest.raises(ValueError, match="delete files"):
        migrate_iceberg_table(spark, warehouse, src.path, "db.ice_nope")


def test_export_disabled_by_default(spark, warehouse):
    li = _lineitem(spark).select("l_orderkey")
    t = warehouse.create_table("db.ice_off", li.schema)
    t.write(li.limit(5))
    assert not os.path.exists(os.path.join(t.path, "metadata", "version-hint.text"))
    # on-demand export still works
    assert t.export_iceberg() is not None
    assert os.path.exists(os.path.join(t.path, "metadata", "version-hint.text"))
