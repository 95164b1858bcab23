"""Global vector index: create/drop procedures, $indexes system table,
IVF search through persisted posting lists, stale-tail exactness.

Reference parity: paimon-core globalindex/ + table/VectorSearchTable.java,
create_global_index/drop_global_index procedures (paimon-spark procedure/).
"""

from __future__ import annotations

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow
import os

from pyspark.sql import functions as F

from flink_table_store_spark.globalindex import list_global_indexes, vector_search
from flink_table_store_spark.datapipe.similarity import brute_force_topk
from flink_table_store_spark.procedures import call

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _emb_table(spark, warehouse):
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    t = warehouse.create_table("db.emb", emb.schema, ignore_if_exists=True)
    if not t.snapshots.latest_id():
        t.write(emb)
    return t.refresh(), emb


def test_global_index_lifecycle_and_search(spark, warehouse):
    t, emb = _emb_table(spark, warehouse)
    meta = call(
        spark, warehouse, "create_global_index",
        table="db.emb", index_name="emb_ivf", column="embedding",
        key_col="vec_id", n_cells=8,
    )
    assert meta["snapshot_id"] == 1 and len(meta["centroids"]) == 8
    assert [m["name"] for m in list_global_indexes(t)] == ["emb_ivf"]

    sys_df = t.system_table(spark, "indexes")
    assert sys_df.collect()[0]["index_name"] == "emb_ivf"

    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = vector_search(spark, t, "emb_ivf", queries, k=3, nprobe=8)
    # the persisted search's final per-query rank must group-limit too
    # (same InferWindowGroupLimit pin as the in-memory top-k family)
    import contextlib as _ctx
    import io as _io

    buf = _io.StringIO()
    with _ctx.redirect_stdout(buf):
        got.explain(mode="formatted")
    assert buf.getvalue().count("WindowGroupLimit") >= 2
    # nprobe = n_cells → every cell probed → exact; must equal brute force
    exact = brute_force_topk(emb, queries, k=3)
    g = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
    e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    assert g == e
    # self-match at rank 1
    assert all(g[(qid, 1)] == qid for qid, rk in g if rk == 1)

    assert call(spark, warehouse, "drop_global_index", table="db.emb", index_name="emb_ivf")
    assert list_global_indexes(t) == []


def test_global_index_stale_tail(spark, warehouse):
    t, emb = _emb_table(spark, warehouse)
    call(
        spark, warehouse, "create_global_index",
        table="db.emb", index_name="ivf2", column="embedding",
        key_col="vec_id", n_cells=4,
    )
    # rows written AFTER indexing must still be searchable (brute-force tail)
    tail = emb.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    t.write(tail)
    t = t.refresh()
    q = tail.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # the tail row duplicates an indexed embedding → both score 1.0;
    # top-2 must contain the un-indexed copy
    got = vector_search(spark, t, "ivf2", q, k=2, nprobe=1).collect()
    qid = got[0]["query_id"]
    assert qid in {r["vec_id"] for r in got}  # finds the un-indexed row


def test_ivfpq_recall_and_size(spark, warehouse):
    """IVFPQ (VERDICT r2 missing #6): PQ-coded postings must (a) reach
    recall@10 ≥ 0.9 vs brute force and (b) cost ≤ 25% of the raw vector
    bytes — cells stream instead of materializing raw vectors."""
    from flink_table_store_spark.globalindex import (
        _postings_dir,
        create_global_index,
    )

    t, emb = _emb_table(spark, warehouse)
    meta = create_global_index(
        spark, t, "emb_pq", "embedding", "vec_id",
        index_type="ivfpq", n_cells=8, pq_m=8, pq_ksub=64,
    )
    assert meta["pq_m"] == 8 and len(meta["pq_codebooks"]) == 8

    queries = emb.limit(10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = vector_search(spark, t, "emb_pq", queries, k=10, nprobe=4)
    exact = brute_force_topk(emb, queries, k=10)
    g: dict[int, set] = {}
    for r in got.collect():
        g.setdefault(r["query_id"], set()).add(r["vec_id"])
    e: dict[int, set] = {}
    for r in exact.collect():
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(g.get(q, set()) & ids) / len(ids) for q, ids in e.items()]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.9, f"recall@10 = {recall}"

    # postings bytes ≤ 25% of the raw embedding bytes (dim 64 × float32)
    pdir = _postings_dir(t.path, "emb_pq")
    postings_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(pdir)
        for f in fns
    )
    n_rows = emb.count()
    raw_bytes = n_rows * 64 * 4
    assert postings_bytes <= 0.25 * raw_bytes, (postings_bytes, raw_bytes)


def test_ivfpq_non_bigint_key(spark, warehouse):
    """IVFPQ postings/ADC schemas derive the key type from the table —
    string-keyed tables index and search like bigint-keyed ones."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("doc_key"), "embedding"
    )
    t = warehouse.create_table("db.emb_strkey", emb.schema)
    t.write(emb)
    t = t.refresh()
    call(
        spark, warehouse, "create_global_index",
        table="db.emb_strkey", index_name="pq_str", column="embedding",
        key_col="doc_key", index_type="ivfpq", n_cells=4, pq_m=4,
    )
    queries = emb.limit(3).select(
        F.col("doc_key").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = vector_search(spark, t, "pq_str", queries, k=1, nprobe=4).collect()
    # exact self-match at rank 1 survives PQ because of the exact re-rank
    assert {r["query_id"] for r in got} == {r["doc_key"] for r in got}


def test_hnsw_graph_recall_and_serialization():
    """datapipe/hnsw.py: graph search ≈ exact nearest centroids, and the
    graph roundtrips through JSON (it ships inside the index meta)."""
    import json

    import numpy as np

    from flink_table_store_spark.datapipe import hnsw

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((600, 16)).astype("float32")
    g = json.loads(json.dumps(hnsw.build(vecs, M=12, ef_construction=80)))
    hits = 0
    for q in rng.standard_normal((60, 16)).astype("float32"):
        exact = int(((vecs - q) ** 2).sum(axis=1).argmin())
        got = hnsw.search(g, vecs, q, k=1, ef=48)
        hits += got[0] == exact
    assert hits / 60 >= 0.9  # near-exact 1-NN through the graph
    # empty graph is valid
    assert hnsw.search(hnsw.build([]), [], [0.0], k=1) == []


def test_hnsw_coarse_quantizer_index(spark, warehouse):
    """coarse='hnsw' probes cells through the centroid graph end-to-end;
    with nprobe = n_cells recall is governed only by graph probing, so
    top-1 self-match must survive."""
    t, emb = _emb_table(spark, warehouse)
    meta = call(
        spark, warehouse, "create_global_index",
        table="db.emb", index_name="emb_hnsw", column="embedding",
        key_col="vec_id", n_cells=8, coarse="hnsw",
    )
    assert "hnsw" in meta and meta["hnsw"]["entry"] >= 0
    # listings stay slim: no graph / codebooks / centroids payloads
    listed = [m for m in list_global_indexes(t) if m["name"] == "emb_hnsw"][0]
    assert "hnsw" not in listed and "centroids" not in listed
    queries = emb.limit(4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = vector_search(spark, t, "emb_hnsw", queries, k=1, nprobe=8).collect()
    assert {r["query_id"] for r in got} == {r["vec_id"] for r in got}
    call(spark, warehouse, "drop_global_index", table="db.emb", index_name="emb_hnsw")


def test_extend_global_index_matches_full_build(spark, warehouse):
    """FAISS add() analogue: index half the corpus, write the rest,
    extend — all-probe search must equal brute force over everything,
    and the tail brute-force path must be EMPTY (postings cover all)."""
    from flink_table_store_spark.globalindex import (
        create_global_index,
        extend_global_index,
        _postings_dir,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    first = emb.where(F.col("vec_id") % 2 == 0)
    rest = emb.where(F.col("vec_id") % 2 == 1)
    t = warehouse.create_table("db.emb_ext", emb.schema)
    t.write(first)
    t = t.refresh()
    meta = create_global_index(
        spark, t, "ivfx", "embedding", "vec_id", n_cells=8
    )
    assert meta["snapshot_id"] == 1
    t.write(rest)
    t = t.refresh()
    meta = extend_global_index(spark, t, "ivfx")
    assert meta["snapshot_id"] == 2
    # postings now cover every row — no brute-force tail left
    postings = spark.read.parquet(_postings_dir(t.path, "ivfx"))
    assert postings.count() == emb.count()
    assert sorted(r["seg"] for r in postings.select("seg").distinct().collect()) == [1, 2]

    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = vector_search(spark, t, "ivfx", queries, k=3, nprobe=8)
    exact = brute_force_topk(emb, queries, k=3)
    g = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
    e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    assert g == e

    # replayed extension (crash between postings write and meta update):
    # rewind the meta and re-run — the seg overwrite must NOT duplicate
    import json as _json
    from flink_table_store_spark.globalindex import _meta_path

    meta["snapshot_id"] = 1
    with open(_meta_path(t.path, "ivfx"), "w") as f:
        _json.dump(meta, f)
    meta = extend_global_index(spark, t, "ivfx")
    assert meta["snapshot_id"] == 2
    assert spark.read.parquet(
        _postings_dir(t.path, "ivfx")
    ).count() == emb.count()
    # extension with nothing new is a no-op
    assert extend_global_index(spark, t, "ivfx")["snapshot_id"] == 2


def test_extend_global_index_ivfpq_and_pk_refusal(spark, warehouse):
    from flink_table_store_spark.globalindex import (
        create_global_index,
        extend_global_index,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    t = warehouse.create_table("db.emb_pqx", emb.schema)
    t.write(emb.where(F.col("vec_id") < 300))
    t = t.refresh()
    create_global_index(
        spark, t, "pqx", "embedding", "vec_id",
        index_type="ivfpq", n_cells=4, pq_m=4,
    )
    t.write(emb.where(F.col("vec_id") >= 300))
    t = t.refresh()
    extend_global_index(spark, t, "pqx")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = vector_search(spark, t, "pqx", queries, k=5, nprobe=4).collect()
    # PQ is approximate, but the self-vector must stay rank 1
    byq = {r["query_id"]: r for r in got if r["rank"] == 1}
    assert all(byq[q]["vec_id"] == q for q in byq)

    import pytest as _pytest

    pk = warehouse.create_table(
        "db.emb_pk", emb.schema, primary_keys=["vec_id"]
    )
    pk.write(emb.limit(10))
    with _pytest.raises(ValueError, match="insert-only"):
        extend_global_index(spark, pk.refresh(), "whatever")


def test_extend_retry_after_crash_with_new_commits(spark, warehouse):
    """ADVICE r10 (medium): an extension that crashed between its
    postings write and its meta update leaves seg dirs behind; if NEW
    commits arrive before the retry, the retry writes a DIFFERENT seg id
    and dynamic overwrite alone would keep the crashed dirs — duplicate
    keys across segs. The fix deletes every seg dir newer than the meta
    snapshot before writing; this test replays exactly that window."""
    import json as _json

    from flink_table_store_spark.globalindex import (
        _meta_path,
        _postings_dir,
        create_global_index,
        extend_global_index,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    a = emb.where(F.col("vec_id") % 3 == 0)
    b = emb.where(F.col("vec_id") % 3 == 1)
    c = emb.where(F.col("vec_id") % 3 == 2)
    t = warehouse.create_table("db.emb_crash", emb.schema)
    t.write(a)
    t = t.refresh()
    meta = create_global_index(spark, t, "ivfc", "embedding", "vec_id", n_cells=8)
    t.write(b)
    t = t.refresh()
    meta = extend_global_index(spark, t, "ivfc")  # seg=2 lands
    assert meta["snapshot_id"] == 2
    # crash: postings for seg=2 written, meta update lost
    meta["snapshot_id"] = 1
    with open(_meta_path(t.path, "ivfc"), "w") as f:
        _json.dump(meta, f)
    # new commits arrive BEFORE the retry
    t.write(c)
    t = t.refresh()
    meta = extend_global_index(spark, t, "ivfc")
    assert meta["snapshot_id"] == 3
    postings = spark.read.parquet(_postings_dir(t.path, "ivfc"))
    # no key appears twice (the pre-fix bug: b's keys in seg=2 AND seg=3)
    assert postings.count() == emb.count()
    assert postings.select("key").distinct().count() == emb.count()
    assert sorted(
        r["seg"] for r in postings.select("seg").distinct().collect()
    ) == [1, 3]
    queries = emb.limit(4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = vector_search(spark, t, "ivfc", queries, k=3, nprobe=8)
    exact = brute_force_topk(emb, queries, k=3)
    g = {(r["query_id"], r["rank"]): r["vec_id"] for r in got.collect()}
    e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    assert g == e


def test_extend_refuses_legacy_flat_layout(spark, warehouse):
    """ADVICE r10 (low): an index whose postings root still holds the
    legacy flat cell=N dirs (no seg level) must be refused — writing
    seg=... next to them mixes partition depths and the root becomes
    unreadable by spark.read.parquet."""
    import shutil as _shutil

    import pytest as _pytest

    from flink_table_store_spark.globalindex import (
        _postings_dir,
        create_global_index,
        extend_global_index,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    t = warehouse.create_table("db.emb_legacy", emb.schema)
    t.write(emb.where(F.col("vec_id") < 200))
    t = t.refresh()
    create_global_index(spark, t, "ivfl", "embedding", "vec_id", n_cells=4)
    # rewrite the postings into the pre-seg flat layout
    pdir = _postings_dir(t.path, "ivfl")
    seg_dir = os.path.join(pdir, "seg=1")
    for cell in os.listdir(seg_dir):
        _shutil.move(os.path.join(seg_dir, cell), os.path.join(pdir, cell))
    _shutil.rmtree(seg_dir)
    t.write(emb.where(F.col("vec_id") >= 200))
    t = t.refresh()
    with _pytest.raises(RuntimeError, match="legacy"):
        extend_global_index(spark, t, "ivfl")
