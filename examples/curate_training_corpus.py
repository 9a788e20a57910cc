#!/usr/bin/env python
"""End-to-end tour of the training-data stack: quality + repetition
signals → exact / near-dup / semantic dedup → benchmark decontamination
→ PII redaction → deterministic mixture sampling → sequence chunking
and packing — every stage a Catalyst plan from ``abecto_spark``.

Run: python examples/curate_training_corpus.py [sf_dir]
(defaults to /root/testdata/sf0.001; finishes in ~1 min on local[4])
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict[str, int]:
    from pyspark.sql import functions as F

    from abecto_spark.functions.text import lang_id, quality_score
    from abecto_spark.operators.chunk import chunk_documents, pack_contiguous
    from abecto_spark.operators.decontaminate import ngram_contamination
    from abecto_spark.operators.dedup import neardup_dedup, semdedup
    from abecto_spark.operators.mixture import mixture_sample
    from abecto_spark.functions.pii import redact_pii
    from abecto_spark.operators.ann import train_ivf_centroids
    from abecto_spark.operators.repetition import repetition_signals
    from abecto_spark.session import get_spark

    spark = get_spark(
        app_name="curate_training_corpus", master="local[4]", shuffle_partitions=4
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    counts: dict[str, int] = {"input": docs.count()}

    # 1. quality floor + repetition filter (all row-local signals)
    rep = repetition_signals(docs)
    scored = (
        docs.join(rep, "doc_id")
        .withColumn("quality", quality_score(F.col("text")))
        .withColumn("lang_guess", lang_id(F.col("text")))
    )
    kept = scored.where((F.col("quality") >= 0.2) & (F.col("dup_line_frac") <= 0.9))
    counts["after_quality"] = kept.count()

    # 2. near-duplicate removal (MinHash-LSH -> Jaccard verify -> CC)
    verdicts = neardup_dedup(kept, "doc_id", "text", jaccard_threshold=0.8)
    kept = kept.join(verdicts.where("keep").select("doc_id"), "doc_id")
    counts["after_neardup"] = kept.count()

    # 3. semantic dedup on the embedding side (SemDeDup)
    cents = train_ivf_centroids(emb, n_cells=8, sample=1000)
    sem_kept = semdedup(emb, cents, tau=0.9)
    counts["embeddings_kept"] = sem_kept.count()

    # 4. benchmark decontamination: drop docs sharing 13-grams with a
    # (here: synthetic) benchmark slice
    bench = docs.where(F.col("doc_id") < 10).select("doc_id", "text")
    contaminated = ngram_contamination(kept, bench, n=13)
    kept = kept.join(contaminated.select("doc_id").distinct(), "doc_id", "left_anti")
    counts["after_decontamination"] = kept.count()

    # 5. PII redaction (typed placeholders, per-kind counts)
    red = redact_pii(kept.select("doc_id", "text"))
    counts["redacted_rows"] = red.count()

    # 6. deterministic mixture over languages (replayable by key-hash)
    mixed = mixture_sample(
        kept.withColumn("lang", F.col("lang_guess")),
        "lang", {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.5}, "doc_id",
    )
    counts["after_mixture"] = mixed.count()

    # 7. sequence prep: fixed windows + contiguous packing
    chunks = chunk_documents(mixed, window=64, stride=64)
    counts["chunks"] = chunks.count()
    packs = pack_contiguous(mixed, budget=512, n_shards=16)
    counts["bins"] = packs.select("shard", "bin").distinct().count()

    for k, v in counts.items():
        print(f"{k:24s} {v}")
    return counts


if __name__ == "__main__":
    main(*sys.argv[1:2])
