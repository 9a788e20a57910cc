#!/usr/bin/env python
"""Benchmark harness: runs the headline operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ...,
     "pipeline": {...docs/sec details...}}

The headline metric is KG-pipeline triple-emission throughput (docs/sec)
per the north rule; per-query seconds cover the operator suite.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_docs = int(os.environ.get("ABECTO_BENCH_DOCS", 250_000))
    n_entities = int(os.environ.get("ABECTO_BENCH_ENTITIES", max(n_docs // 12, 10)))

    from abecto_spark.session import get_spark

    spark = get_spark(
        app_name="abecto_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    from abecto_spark.plans.entry_queries import QUERIES

    bench_queries = [
        "aspect_scan",
        "aspect_bgp",
        "construct_rules",
        "topk_per_group",
        "anti_join",
        "equivalent_value_mapping",
        "closure_cc",
        "rule_fixpoint",
        "population_measures",
        "property_value_coverage",
        "ceq_numeric",
        "exact_dedup",
        "segment_dedup",
        "repeated_span_dedup",
        "incremental_span_dedup",
        "quantize_embeddings",
        "minhash_candidates",
        "simhash_candidates",
        "neardup_dedup",
        "ngram_jaccard",
        "text_stats",
        "bpe_token_count",
        "doc_quality",
        "repetition_signals",
        "redact_pii",
        "mixture_sample",
        "ngram_contamination",
        "corpus_curation",
        "bm25_topk",
        "mixture_upsample",
        "incremental_dedup",
        "corpus_stats",
        "top_ngrams",
        "perplexity_buckets",
        "unigram_logprob",
        "bigram_logprob",
        "bigram_score_cross",
        "chunk_documents",
        "pack_contiguous",
        "semdedup",
        "doc_fingerprint",
        "ann_top1",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "embedding_neardup",
        "functional_mapping",
        "property_findings",
        "wrong_value_suppression",
        "aspect_algebra",
        "sparql_paths",
        "sparql_paths_seeded",
        "sparql_paths_ground",
        "sparql_corners",
        "sparql_graph",
        "sparql_subquery",
        "rule_builtins",
        "construct_grouped",
        "sparql_agg",
        "sparql_describe",
        "sessionize",
        "windowed_agg",
        "kg_degree_stats",
        "kg_pagerank",
        "kg_triangles",
        "characteristic_sets",
        "void_stats",
        "link_prediction",
        "kcore_15",
        "dsir_select",
        "clustering_coefficient",
        "assortativity",
        "incremental_canonical",
        "kg_bfs_distances",
        "kg_ppr",
        "events_asof",
        "events_interval",
        "events_rollup",
        "part_pmi",
        "kg_wpr",
        "label_propagation",
        "tfidf_terms",
        "kg_hits",
        "kg_harmonic",
        "shacl_report",
        "sparql_update",
        "sparql_update_quads",
        "kg_sssp",
        "kg_walks",
        "rdfs_closure",
    ]

    timings: dict[str, float] = {}
    for name in bench_queries:
        fn = QUERIES[name]
        t0 = time.time()
        _noop_write(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # ---- KG pipeline throughput (the north-rule headline) ---------------
    from abecto_spark.plans.pipeline import DocsPipeline, PipelineConfig
    from abecto_spark.sources.checkpoint import SnapshotStore
    from abecto_spark.sources.docs import synth_docs

    snap_root = tempfile.mkdtemp(prefix="abecto_bench_")
    try:
        docs = synth_docs(
            spark, n_docs=n_docs, n_entities=n_entities, seed=42,
            partitions=max(cpus, 8),
        ).localCheckpoint(eager=True)  # materialize input before timing
        # best-of-2: the shared host takes co-tenant load spikes that
        # inflate a single run 30-80%; the headline should measure the
        # engine, not whichever noise burst one run landed in (same
        # policy as scripts/scaling_bench.py)
        elapsed = None
        for attempt in range(2):
            store = SnapshotStore(spark, f"{snap_root}/r{attempt}")
            pipe = DocsPipeline(spark, store, PipelineConfig())
            t0 = time.time()
            result = pipe.run(docs, resume=False)
            run_elapsed = time.time() - t0
            if elapsed is None or run_elapsed < elapsed:
                elapsed = run_elapsed
        n_triples = result.metrics["s4_triples"]["row_count"]
        docs_per_sec = n_docs / elapsed if elapsed > 0 else 0.0
        timings["kg_pipeline"] = round(elapsed, 3)
    finally:
        shutil.rmtree(snap_root, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "kg_pipeline_docs_per_sec",
        "value": round(docs_per_sec, 2),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "pipeline": {
            "n_docs": n_docs,
            "elapsed_sec": round(elapsed, 3),
            "docs_per_sec": round(docs_per_sec, 2),
            "triples_emitted": n_triples,
            "cpus": cpus,
        },
        "total_sec": total,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
