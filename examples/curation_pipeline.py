"""End-to-end training-data curation with flink_table_store_spark.

Runnable walkthrough of the full pillar over the sf0.001 testdata:

    raw docs ─▶ exact dedup ─▶ quality gates (heuristic + model
             + CCNet perplexity tail-drop) ─▶ DSIR domain selection
             ─▶ decontaminate vs an eval set (7-gram AND embedding
             cosine) ─▶ UniMax epoch-capped mix ─▶ leakage-safe split
             ─▶ pack train split ─▶ curriculum shard export

Every step is deterministic: rerunning this script byte-reproduces the
export manifest. Usage:

    python examples/curation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_table_store_spark.session import get_spark
from flink_table_store_spark.datapipe.dedup import exact_dedup
from flink_table_store_spark.datapipe.export import export_training_shards
from flink_table_store_spark.datapipe.packing import pack_sequences, packing_stats
from flink_table_store_spark.datapipe.quality_model import (
    score_quality_model,
    train_quality_model,
)
from flink_table_store_spark.datapipe.sampling import (
    resample_to_mix,
    split_dataset,
    temperature_weights,
    unimax_allocation,
)
from flink_table_store_spark.datapipe.text import (
    gopher_metrics,
    token_count,
    word_ngrams,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ftss_curation_demo"
    spark = get_spark("curation-pipeline")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. exact dedup: one survivor (min doc_id) per normalized content
    docs = exact_dedup(docs)

    # 2a. heuristic gates: Gopher word-level rules
    docs = gopher_metrics(docs).where(F.col("gopher_keep")).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    # 2b. model gate: NB classifier trained on a labeled slice
    labeled = docs.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text",
        F.coalesce((F.col("lang") == "en").cast("int"), F.lit(0)).alias("label"),
    )
    model = train_quality_model(labeled, n_buckets=65536, seed=11)
    # DCLM-style top-slice keep: threshold at the 20th score percentile
    # (one scoring pass: filter the scored frame directly rather than
    # re-scoring through quality_filter)
    scored = score_quality_model(docs, model)
    thr = scored.approxQuantile("quality_score", [0.2], 0.001)[0]
    keep_ids = scored.where(
        F.col("quality_score") >= thr
    ).select("doc_id")
    docs = docs.join(keep_ids, "doc_id", "semi")

    # 2c. CCNet perplexity gate (Wenzek et al. 2020): bucket each doc's
    # bigram-LM perplexity into head/middle/tail WITHIN its language
    # and drop the tail (the least language-like third). Thresholds are
    # fit once (here on the corpus itself; on a sample in production)
    # so assignment is a pure broadcast comparison.
    from flink_table_store_spark.datapipe.lm import (
        fit_perplexity_thresholds,
        perplexity_buckets,
    )

    ppl_thr = fit_perplexity_thresholds(docs)
    buckets = perplexity_buckets(docs, thresholds=ppl_thr).where(
        F.col("ppl_bucket").isin("head", "middle")
    )
    docs = docs.join(buckets.select("doc_id"), "doc_id", "semi")

    # 2d. DSIR domain selection (Xie et al. 2023): keep the 80% of the
    # corpus whose hashed-ngram distribution best matches an English
    # target slice — Gumbel-top-k over importance weights, seeded
    from flink_table_store_spark.datapipe.dsir import dsir_resample, fit_dsir

    target = docs.where(F.col("lang") == "en").orderBy("doc_id").limit(50)
    dsir_model = fit_dsir(target, docs, n_buckets=8192, seed=13)
    docs = dsir_resample(
        docs, dsir_model, k=int(docs.count() * 0.8), seed=7
    ).drop("n_grams", "dsir_logratio")

    # 3. decontaminate: drop docs sharing word 7-grams with a held-out
    # eval set (probes broadcast; the corpus scan stays narrow)
    eval_set = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    probes = eval_set.select(
        F.explode(word_ngrams("text", 7)).alias("probe")
    ).distinct()
    contaminated = docs.join(
        F.broadcast(probes), F.expr("contains(text, probe)"), "semi"
    )
    docs = docs.join(contaminated.select("doc_id"), "doc_id", "anti")

    # 3b. semantic decontamination: paraphrased eval leakage shares no
    # 7-gram but still sits next to its source in embedding space —
    # drop docs whose best cosine against the eval embeddings clears
    # the bar (probes collapse to ONE broadcast row; no corpus shuffle)
    from flink_table_store_spark.datapipe.similarity import (
        semantic_contamination,
    )

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    eval_emb = emb.join(eval_set.select("doc_id"), "doc_id", "semi").select(
        F.col("doc_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    sem = semantic_contamination(
        docs.join(emb, "doc_id"), eval_emb, threshold=0.45, id_col="doc_id"
    )
    docs = docs.join(sem.select("doc_id"), "doc_id", "anti")

    # 4. mixture: UniMax epoch-capped budget (compare with temperature
    # weights — both are printed; the mix uses UniMax, the fair one)
    tw = temperature_weights(docs, "lang", 0.7, token_col="n_chars")
    ua = unimax_allocation(
        docs, "lang",
        budget=0.9 * sum(
            r[1] for r in docs.where(F.col("lang").isNotNull())
            .groupBy("lang").agg(F.sum("n_chars")).collect()
        ),
        max_epochs=2.0, token_col="n_chars",
    )
    print("lang        temp-w   unimax-w  unimax-epochs")
    for lang in sorted(ua):
        print(f"  {lang:8s} {tw.get(lang, 0):7.4f} {ua[lang]['weight']:9.4f}"
              f" {ua[lang]['epochs']:9.4f}")
    w = {d: v["weight"] for d, v in ua.items()}
    docs = resample_to_mix(docs, "lang", w, token_col="n_chars", seed=5)
    docs = docs.withColumn(
        "doc_id", F.col("doc_id") * 1000 + F.col("copy")
    ).drop("copy")  # repeated copies get distinct ids downstream

    # 5. leakage-safe split: whole sources stay on one side
    docs = docs.withColumn("n_tokens", token_count("text"))
    docs = split_dataset(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05},
        group_col="source", seed=7,
    )

    # 6. pack the train split into 1024-token training rows
    train = docs.where(F.col("split") == "train")
    packed = pack_sequences(
        train, seq_len=1024, token_col="n_tokens", key_col="doc_id", seed=42
    )
    stats = packing_stats(packed, 1024).collect()[0]

    # 7. export as deterministic shards with an auditable manifest;
    # within-shard curriculum order (short docs first), shard
    # membership still the unbiased md5 slice
    manifest = export_training_shards(
        train.select("doc_id", "text", "lang", "n_tokens"),
        os.path.join(out, "train_shards"),
        n_shards=8,
        seed=1,
        curriculum_col="n_tokens",
    )

    kept = docs.groupBy("split").count().collect()
    print(f"raw docs:        {n0}")
    for r in sorted(kept):
        print(f"  {r['split']:5s} docs:    {r['count']}")
    print(f"train packs:     {stats['n_packs']} (fill {stats['avg_fill']})")
    print(f"export shards:   {manifest['n_shards']}, rows "
          f"{sum(s['n_rows'] for s in manifest['shards'].values())}")


if __name__ == "__main__":
    main()
