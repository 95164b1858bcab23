"""Training-shard export: deterministic global shuffle + manifest audit."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.export import (
    MANIFEST,
    export_training_shards,
    read_training_shards,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )


def test_export_roundtrip_and_determinism(spark, tmp_path):
    df = _docs(spark)
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    m1 = export_training_shards(df, p1, n_shards=8, seed=5)
    m2 = export_training_shards(df, p2, n_shards=8, seed=5)
    assert m1 == m2  # same (corpus, seed, N) -> identical export
    assert sum(s["n_rows"] for s in m1["shards"].values()) == 500
    back = read_training_shards(spark, p1)
    assert back.count() == 500
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(500))


def test_shards_are_contiguous_slices_of_the_shuffle(spark, tmp_path):
    df = _docs(spark, 1000)
    path = str(tmp_path / "e")
    export_training_shards(df, path, n_shards=4, seed=1)
    back = read_training_shards(spark, path)
    ranges = (
        back.groupBy("__shard")
        .agg(F.min("__u").alias("lo"), F.max("__u").alias("hi"))
        .orderBy("__shard")
        .collect()
    )
    assert len(ranges) == 4
    for a, b in zip(ranges, ranges[1:]):
        assert a["hi"] < b["lo"]  # shard k strictly precedes shard k+1


def test_rows_inside_a_shard_file_are_in_shuffle_order(spark, tmp_path):
    df = _docs(spark, 800)
    path = str(tmp_path / "e")
    export_training_shards(df, path, n_shards=3, seed=9)
    files = glob.glob(os.path.join(path, "__shard=*", "*.parquet"))
    assert files
    import pyarrow.parquet as pq

    for f in files:
        us = pq.read_table(f, columns=["__u"]).column("__u").to_pylist()
        assert us == sorted(us)


def test_subset_read_and_verify_failure(spark, tmp_path):
    df = _docs(spark, 600)
    path = str(tmp_path / "e")
    m = export_training_shards(df, path, n_shards=6, seed=3)
    two = read_training_shards(spark, path, shards=[0, 1])
    assert two.count() == (
        m["shards"]["0"]["n_rows"] + m["shards"]["1"]["n_rows"]
    )
    with pytest.raises(ValueError, match="not in manifest"):
        read_training_shards(spark, path, shards=[99])
    # tamper: drop one shard's data -> loud refusal, not silent training
    mf = json.load(open(os.path.join(path, MANIFEST)))
    mf["shards"]["2"]["n_rows"] += 1
    json.dump(mf, open(os.path.join(path, MANIFEST), "w"))
    with pytest.raises(ValueError, match="fails verification"):
        read_training_shards(spark, path)
    # verify=False still reads (escape hatch for forensics)
    assert read_training_shards(spark, path, verify=False).count() == 600


def test_epoch_reshuffle_changes_order_not_content(spark, tmp_path):
    df = _docs(spark, 300)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    export_training_shards(df, pa, n_shards=4, seed=0)
    export_training_shards(df, pb, n_shards=4, seed=1)
    a = read_training_shards(spark, pa)
    b = read_training_shards(spark, pb)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    # but shard membership differs (a genuinely different order)
    am = {r["doc_id"]: r["__shard"] for r in a.collect()}
    bm = {r["doc_id"]: r["__shard"] for r in b.collect()}
    assert any(am[k] != bm[k] for k in am)


def test_shard_assignment_matches_duckdb(spark, tmp_path):
    """The prefix shard math replays exactly in DuckDB — the
    portability contract."""
    import duckdb

    df = _docs(spark, 400)
    path = str(tmp_path / "e")
    export_training_shards(df, path, n_shards=5, seed=7)
    got = {
        r["doc_id"]: r["__shard"]
        for r in read_training_shards(spark, path).collect()
    }
    want = dict(
        duckdb.sql(
            """
            SELECT i,
              ('0x' || substr(md5(i::VARCHAR || '-7'), 1, 7))::BIGINT
                * 5 // 268435456
            FROM range(400) t(i)
            """
        ).fetchall()
    )
    assert got == want


def test_export_procedure_over_engine_table(spark, warehouse):
    """CALL sys.export_training_shards: filter + projection push into
    the engine scan; the export manifest matches a direct export of
    the same slice."""
    import tempfile

    from flink_table_store_spark import procedures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = warehouse.create_table("db.docs", docs.schema)
    t.write(docs)
    out = tempfile.mkdtemp(prefix="exp_proc_")
    m = procedures.call(
        spark,
        warehouse,
        "export_training_shards",
        table="db.docs",
        path=out,
        n_shards=4,
        key_col="doc_id",
        seed=5,
        where="lang = 'en'",
        columns="doc_id,text,lang",
    )
    n_en = docs.where(F.col("lang") == "en").count()
    assert sum(s["n_rows"] for s in m["shards"].values()) == n_en
    back = read_training_shards(spark, out)
    assert back.count() == n_en
    assert set(back.columns) == {"doc_id", "text", "lang", "__u", "__shard"}
    assert back.where(F.col("lang") != "en").count() == 0


def test_empty_shards_are_manifested_and_readable(spark, tmp_path):
    """Review-pass regression: Poisson-empty shards must be manifest
    entries (0 rows), so prefix-subset reads of a sparse export work."""
    df = _docs(spark, 20)
    path = str(tmp_path / "e")
    m = export_training_shards(df, path, n_shards=64, seed=1)
    assert len(m["shards"]) == 64
    empties = [s for s, v in m["shards"].items() if v["n_rows"] == 0]
    assert empties  # 20 rows over 64 shards must leave gaps
    # a prefix read crossing empty shards verifies and returns the rest
    got = read_training_shards(spark, path, shards=list(range(32)))
    want = sum(m["shards"][str(s)]["n_rows"] for s in range(32))
    assert got.count() == want


def test_reexport_of_a_readback_export(spark, tmp_path):
    """Review-pass regression: re-sharding a read-back export (new
    epoch) must not trip over the __u/__shard columns it carries."""
    df = _docs(spark, 200)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_training_shards(df, p1, n_shards=4, seed=1)
    back = read_training_shards(spark, p1)
    m2 = export_training_shards(back, p2, n_shards=2, seed=2)
    re2 = read_training_shards(spark, p2)
    assert re2.count() == 200
    assert sum(s["n_rows"] for s in m2["shards"].values()) == 200


def test_null_keys_are_refused(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="NULL 'doc_id'"):
        export_training_shards(df, str(tmp_path / "e"), n_shards=2)


def test_empty_export_read_is_loud(spark, tmp_path):
    df = _docs(spark, 0)
    path = str(tmp_path / "e")
    m = export_training_shards(df, path, n_shards=3)
    assert all(v["n_rows"] == 0 for v in m["shards"].values())
    with pytest.raises(ValueError, match="is empty"):
        read_training_shards(spark, path)


def test_curriculum_export_orders_within_shards(spark, tmp_path):
    """curriculum_col switches the within-shard order to the score
    (shard membership — the unbiased md5 slice — is unchanged, so
    manifests/checksums verify identically); descending flips it."""
    df = _docs(spark, 400).withColumn(
        "difficulty", (F.col("doc_id") * 37 % 101).cast("double")
    )
    plain = str(tmp_path / "plain")
    curr = str(tmp_path / "curr")
    m1 = export_training_shards(df, plain, n_shards=4, seed=9)
    m2 = export_training_shards(
        df, curr, n_shards=4, seed=9, curriculum_col="difficulty"
    )
    # same membership + checksums, manifest records the ordering
    assert {k: v for k, v in m1["shards"].items()} == m2["shards"]
    assert m2["curriculum"] == {"col": "difficulty", "descending": False}
    assert "curriculum" not in m1
    for f in glob.glob(os.path.join(curr, "__shard=*", "*.parquet")):
        import pyarrow.parquet as pq

        ds = pq.read_table(f, columns=["difficulty"]).column(
            "difficulty"
        ).to_pylist()
        assert ds == sorted(ds), f
    # verified read-back still round-trips
    assert read_training_shards(spark, curr).count() == 400
    # descending
    hard_first = str(tmp_path / "hard")
    export_training_shards(
        df, hard_first, n_shards=2, seed=9,
        curriculum_col="difficulty", curriculum_desc=True,
    )
    for f in glob.glob(os.path.join(hard_first, "__shard=*", "*.parquet")):
        import pyarrow.parquet as pq

        ds = pq.read_table(f, columns=["difficulty"]).column(
            "difficulty"
        ).to_pylist()
        assert ds == sorted(ds, reverse=True), f
