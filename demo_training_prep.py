#!/usr/bin/env python
"""Executable demo: the training-data-prep pipeline end to end.

Chains the engine's scale-path operators the way an LLM data pipeline
would, over the synthetic documents table:

    quality/language filter  (functions/text.py — pure expressions)
  → char-entropy screen      (doc_entropy: gibberish/template gate)
  → boilerplate span gate    (cross-doc duplicated 4-gram fraction —
                              the substring-dedup signal)
  → exact dedup              (md5 fingerprint keep-lowest-id)
  → near dedup               (minhash → LSH bands → connected
                              components → keep canonical)
  → semantic dedup           (SemDeDup: IVF-cluster-bounded embedding
                              pair graph → keep canonical)
  → mixture resampling       (deterministic md5 acceptance toward
                              equal source shares)
  → train/val/test split     (deterministic md5-prefix assignment)
  → token-window chunking    (50-token chunks, 10 overlap)
  → write, partitioned by split

Every stage is a DataFrame transform — one driver, no collects except
the printed summary counts; the written tree is partitioned so
downstream training jobs read their split via partition pruning.

    python demo_training_prep.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from awi_datapipelinepublic_spark import get_spark
from awi_datapipelinepublic_spark.functions import text as X
from awi_datapipelinepublic_spark.operators.chunking import chunk_documents
from awi_datapipelinepublic_spark.operators.dedup import (
    exact_dedup,
    near_dedup_keep_canonical,
)
from awi_datapipelinepublic_spark.operators.sampling import train_val_test_split


def prepare(spark, sf_dir: str, out_dir: str) -> dict:
    docs = spark.read.parquet(str(Path(sf_dir) / "documents.parquet"))
    n_raw = docs.count()

    # 1. quality + language gate (pure Column expressions, one scan):
    # composite score, stopword-ratio lang-id, AND the Gopher
    # word-level rule verdict — all fused into the scan stage by
    # Catalyst. Then the character-entropy gibberish/boilerplate
    # screen (doc_entropy — explode + map-side-combine char counts;
    # natural prose sits ~4-4.5 bits/char, template spam under ~3).
    gopher_pass = X.gopher_rules(F.col("text"), min_words=20)["passes"]
    kept = docs.filter(
        (X.quality_score("text") > 0.3)
        & (X.lang_id("text") == "en")
        & (gopher_pass == 1)
    )
    low_ent = X.doc_entropy(kept, ["doc_id"]).filter(
        F.col("entropy") < 3.0
    ).select("doc_id")
    kept = kept.join(low_ent, "doc_id", "left_anti")
    n_quality = kept.count()

    # 1b. boilerplate gate: drop documents whose text is mostly word
    # 4-gram spans shared with OTHER documents (the substring-dedup
    # signal — catches pages assembled from common fragments that no
    # whole-doc near-dup stage would pair up).
    from awi_datapipelinepublic_spark.operators.quality import cross_doc_duplicate_spans

    spans = cross_doc_duplicate_spans(kept, n=4)
    boiler = spans.filter(F.col("dup_span_frac") > 0.8).select("doc_id")
    kept = kept.join(boiler, "doc_id", "left_anti")
    n_spans = kept.count()

    # 2. exact dedup: keep the lowest id per normalized fingerprint
    exact_keep = exact_dedup(kept).select("doc_id")
    kept = kept.join(exact_keep, "doc_id", "left_semi")
    n_exact = kept.count()

    # 3. near dedup: minhash → LSH → components → canonical survivor
    survivors = near_dedup_keep_canonical(kept)
    kept = kept.join(survivors, "doc_id", "left_semi")
    n_near = kept.count()

    # 3b. semantic dedup (SemDeDup): embedding-space near-duplicates
    # the text-level stages can't see — IVF-cluster-bounded pair graph
    # over the surviving docs' embeddings (vec_id == doc_id).
    from awi_datapipelinepublic_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet(str(Path(sf_dir) / "embeddings.parquet")).join(
        kept.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_keep = semantic_dedup(emb, threshold=0.95, n_clusters=8).select(
        F.col("vec_id").alias("doc_id")
    )
    kept = kept.join(sem_keep, "doc_id", "left_semi")
    n_sem = kept.count()

    # 3c. source-mixture resampling: downsample the surviving corpus
    # toward equal source shares (deterministic md5 acceptance — the
    # same rows are kept on every run/engine/incremental batch).
    from awi_datapipelinepublic_spark.operators.sampling import mixture_resample

    srcs = [r["source"] for r in kept.select("source").distinct().collect()]
    budget = max(1, int(n_sem * 0.9))
    kept = mixture_resample(
        kept, "source", "doc_id", {s: 1.0 for s in srcs}, total_rows=budget
    )
    n_mix = kept.count()

    # 4. deterministic split, then chunk each split's documents
    split = train_val_test_split(kept, "doc_id")
    chunks = chunk_documents(split, size=50, overlap=10).join(
        split.select("doc_id", "split"), "doc_id"
    )

    # 5. write partitioned by split — training readers prune to theirs
    chunks.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    out = spark.read.parquet(out_dir)
    per_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # 6. pack the train split's chunks into fixed-token pretraining
    # blocks (greedy scan order — operators/corpus.sequence_pack)
    from awi_datapipelinepublic_spark.operators.corpus import sequence_pack

    train_chunks = (
        out.filter(F.col("split") == "train")
        .select(
            (F.col("doc_id") * 10000 + F.col("chunk_no")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
    )
    blocks = sequence_pack(train_chunks, block_tokens=512)
    n_blocks = blocks.count()

    # 7. tokenizer artifacts over the final train corpus: vocabulary
    # with deterministic dense ids + bigram LM table (the exports a
    # tokenizer / speculative-decode build consumes)
    from awi_datapipelinepublic_spark.operators.corpus import bigram_lm, vocab_build

    train_docs = split.filter(F.col("split") == "train")
    vocab_size = vocab_build(train_docs, min_count=5).count()
    bigrams = bigram_lm(train_docs, min_count=5, top_per_context=3).count()

    return {
        "raw_docs": n_raw,
        "after_quality_lang": n_quality,
        "after_boilerplate_span_gate": n_spans,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_near,
        "after_semantic_dedup": n_sem,
        "after_mixture_resample": n_mix,
        "chunks_per_split": per_split,
        "train_blocks_512tok": n_blocks,
        "train_vocab_terms": vocab_size,
        "train_bigram_rows": bigrams,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="training_prep_")
    spark = get_spark("training-prep-demo")
    spark.sparkContext.setLogLevel("ERROR")
    summary = prepare(spark, sf_dir, out_dir)
    for k, v in summary.items():
        print(f"{k}: {v}")
    print(f"written: {out_dir} (partitioned by split)")


if __name__ == "__main__":
    main()
