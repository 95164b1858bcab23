"""Eval-driven ANN index tuning with flink_table_store_spark.

Runnable walkthrough of the similarity + eval pillar over the sf0.001
embeddings table — the loop a retrieval team actually runs when picking
index parameters:

    exact brute-force top-k  ─▶ the gold standard (its results ARE the
                                relevance labels: exact top-3 per query)
    IVF index (nprobe sweep) ─▶ recall@k / MRR / nDCG vs the gold via
                                datapipe/ireval.retrieval_metrics
    binary quantization      ─▶ same eval at a fraction of the IO
    persistent global index  ─▶ create_global_index + vector_search,
                                evaluated the same way

Prints one metrics line per configuration — recall rising with nprobe
(and hitting 1.0 at nprobe = n_cells) is the expected shape.
Deterministic end to end. Usage:

    python examples/retrieval_tuning.py [sf_dir] [warehouse_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.datapipe.ireval import (
    retrieval_metrics,
    retrieval_summary,
)
from flink_table_store_spark.datapipe.similarity import (
    binary_hamming_topk,
    brute_force_topk,
    ivf_topk,
    train_ivf_centroids,
)
from flink_table_store_spark.globalindex import (
    create_global_index,
    vector_search,
)
from flink_table_store_spark.session import get_spark

K = 3
N_QUERIES = 20
N_CELLS = 8


def summarize(tag, results, gold):
    per_q = retrieval_metrics(results, gold, k=K)
    s = retrieval_summary(per_q).collect()[0]
    print(
        f"{tag:28s} recall@{K}={s['recall']:.4f} "
        f"mrr={s['mrr']:.4f} ndcg={s['ndcg']:.4f}"
    )
    return s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ftss_retrieval_demo"
    shutil.rmtree(wh, ignore_errors=True)
    spark = get_spark("retrieval-tuning")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    # 1. gold standard: the EXACT top-K is the relevance label set
    exact = brute_force_topk(emb, queries, k=K)
    gold = exact.select("query_id", "vec_id")
    summarize("brute_force (gold)", exact, gold)

    # 2. IVF sweep: recall should rise with nprobe, reaching 1.0 when
    #    every cell is probed (the probe/assign pipeline is then exact)
    centroids = train_ivf_centroids(emb, n_cells=N_CELLS)
    last = 0.0
    for nprobe in (1, 2, 4, N_CELLS):
        res = ivf_topk(
            emb, queries, k=K, centroids=centroids, nprobe=nprobe
        )
        s = summarize(f"ivf nprobe={nprobe}/{N_CELLS}", res, gold)
        assert s["recall"] >= last - 1e-9, "recall must not fall as nprobe grows"
        last = s["recall"]
    assert last == 1.0, "all-probe IVF must reproduce the exact top-k"

    # 3. binary quantization: 8-byte signatures for the candidate pass,
    #    exact re-rank of rerank*K rows per query
    for rerank in (2, 8):
        res = binary_hamming_topk(emb, queries, k=K, rerank=rerank)
        summarize(f"binary_quant rerank={rerank}", res, gold)

    # 4. the PERSISTED path: build the table + global index once, then
    #    vector_search through the posting lists
    cat = Catalog(wh)
    t = cat.create_table("db.emb", emb.schema)
    t.write(emb)
    t = t.refresh()
    create_global_index(
        spark, t, "emb_ivf", "embedding", "vec_id", n_cells=N_CELLS
    )
    res = vector_search(spark, t, "emb_ivf", queries, k=K, nprobe=N_CELLS)
    s = summarize("global index (all-probe)", res, gold)
    assert s["recall"] == 1.0, "all-probe persisted search must be exact"
    print("retrieval tuning walkthrough complete")


if __name__ == "__main__":
    main()
