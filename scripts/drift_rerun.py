#!/usr/bin/env python
"""Interleaved quiet-window re-run to adjudicate bench drift.

Round 4's suite moved five queries in the same family upward
(ann_top1 +48%, embedding_neardup +41%, exact_dedup +40%,
doc_fingerprint +33%, ann_ivf_topk +31%) and the kg_pipeline headline
−7.6%, none of whose code changed that round. This script measures
those queries INTERLEAVED (A..E per round, R rounds, first round
discarded as warmup) at sf0.1 / local[32], reporting per-query
min/median — the methodology used for round 4's
property_value_coverage verdict. Interleaving means a co-tenant load
burst inflates one round of every query rather than every round of one
query, so the per-query MIN is a noise-resistant estimate.

Usage: python scripts/drift_rerun.py [--rounds 4]
Prints one JSON line; load average recorded before and after.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "ann_top1",
    "embedding_neardup",
    "exact_dedup",
    "doc_fingerprint",
    "ann_ivf_topk",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--queries", default=None,
                    help="comma-separated override of the query list")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--docs", type=int, default=250_000)
    args = ap.parse_args()
    global QUERIES
    if args.queries:
        QUERIES = args.queries.split(",")

    load0 = os.getloadavg()

    from abecto_spark.plans.entry_queries import QUERIES as Q
    from abecto_spark.session import get_spark

    spark = get_spark(
        app_name="abecto_drift_rerun", master="local[32]",
        shuffle_partitions=32,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    from abecto_spark.plans.pipeline import DocsPipeline, PipelineConfig
    from abecto_spark.sources.checkpoint import SnapshotStore
    from abecto_spark.sources.docs import synth_docs

    docs = synth_docs(
        spark, n_docs=args.docs, n_entities=max(args.docs // 12, 10),
        seed=42, partitions=32,
    ).localCheckpoint(eager=True)

    samples: dict[str, list[float]] = {n: [] for n in QUERIES + ["kg_pipeline"]}
    snap_root = tempfile.mkdtemp(prefix="abecto_drift_")
    try:
        for rnd in range(args.rounds):
            for name in QUERIES:
                t0 = time.time()
                noop(Q[name](spark, args.sf_dir))
                samples[name].append(round(time.time() - t0, 3))
            store = SnapshotStore(spark, f"{snap_root}/r{rnd}")
            t0 = time.time()
            DocsPipeline(spark, store, PipelineConfig()).run(docs, resume=False)
            samples["kg_pipeline"].append(round(time.time() - t0, 3))
            print(f"round {rnd}: " + json.dumps(
                {n: samples[n][-1] for n in samples}), file=sys.stderr)
    finally:
        shutil.rmtree(snap_root, ignore_errors=True)

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    out = {
        "rounds": args.rounds,
        "first_discarded": True,
        "load_before": load0,
        "load_after": os.getloadavg(),
        "results": {
            n: {
                "all": v,
                "min_after_warmup": min(v[1:]) if len(v) > 1 else v[0],
                "median_after_warmup": med(v[1:]) if len(v) > 1 else v[0],
            }
            for n, v in samples.items()
        },
        "pipeline_docs": args.docs,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
