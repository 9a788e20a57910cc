#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

The north-rule deployment shape: the ``abecto_spark`` package ships to the
executors as a ``--py-files`` zip (built by ``scripts/make_pyfiles.py``)
and this script is the job file — master, deploy mode and resources are
owned entirely by the submitter, never set in code:

    python scripts/make_pyfiles.py                    # -> dist/abecto_spark.zip
    spark-submit --master yarn --deploy-mode cluster \\
        --py-files dist/abecto_spark.zip \\
        --num-executors 1000 --executor-cores 8 \\
        --conf spark.sql.shuffle.partitions=8192 \\
        examples/submit_pipeline.py \\
        --input hdfs:///warehouse/docs --output hdfs:///warehouse/kg \\
        --snapshots hdfs:///warehouse/kg_snapshots

Local smoke (same artifact, small scale):

    spark-submit --master 'local[4]' --py-files dist/abecto_spark.zip \\
        examples/submit_pipeline.py --docs 5000 \\
        --output /tmp/kg_out --snapshots /tmp/kg_snap

Input is a parquet table of interleaved documents with the north-rule
shape ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``;
``--docs N`` synthesizes one deterministically instead (seed 42) so the
job is runnable with no external data. The run is resumable: re-submit
with the same ``--snapshots`` dir and ``--resume`` to pick up after the
last committed stage snapshot. Per-stage metrics (rows, partitions,
elapsed) print as JSON lines and are persisted in the snapshot store's
metrics table.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="parquet docs table (doc_id, spans)")
    ap.add_argument("--docs", type=int, default=0,
                    help="synthesize N docs instead of --input (seed 42)")
    ap.add_argument("--entities", type=int, default=0,
                    help="entity universe for synthesis (default docs/12)")
    ap.add_argument("--output", required=True,
                    help="output dir for the (subj, pred, obj) triples table")
    ap.add_argument("--snapshots", required=True,
                    help="per-stage snapshot/checkpoint dir (resumable)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from existing stage snapshots")
    args = ap.parse_args()
    if not args.input and not args.docs:
        ap.error("one of --input or --docs is required")

    # imports resolve from the --py-files zip on the driver and executors
    from abecto_spark.plans.pipeline import DocsPipeline, PipelineConfig
    from abecto_spark.session import submit_spark
    from abecto_spark.sources.checkpoint import SnapshotStore
    from abecto_spark.sources.docs import synth_docs

    spark = submit_spark(app_name="abecto_kg_pipeline")
    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        docs = synth_docs(
            spark, n_docs=args.docs,
            n_entities=args.entities or max(args.docs // 12, 10), seed=42,
        )
    store = SnapshotStore(spark, args.snapshots)
    result = DocsPipeline(spark, store, PipelineConfig()).run(
        docs, resume=args.resume
    )
    result.triples.write.mode("overwrite").parquet(args.output)
    for stage, m in result.metrics.items():
        print(json.dumps({"stage": stage, **m}))
    spark.stop()


if __name__ == "__main__":
    main()
