#!/usr/bin/env python
"""End-to-end tour of the engine: synthetic interleaved docs → KG
pipeline (mentions → JW linking → canonicalization → triples + media
features) → population measures → reports → N-Triples export.

Run: python examples/quickstart.py   (finishes in ~1 min on local[4])
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from abecto_spark.plans.pipeline import DocsPipeline, PipelineConfig
    from abecto_spark.plans.reports import (
        export_deviations_csv,
        mapping_review,
        measurements_markdown,
    )
    from abecto_spark.session import get_spark
    from abecto_spark.sources.checkpoint import SnapshotStore
    from abecto_spark.sources.docs import synth_docs
    from abecto_spark.sources.rdf import write_ntriples

    spark = get_spark(app_name="quickstart", master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="abecto_quickstart_")

    # 1. input: interleaved text+media documents (3 synthetic datasets)
    docs = synth_docs(spark, n_docs=2000, n_entities=150, seed=42)
    print("docs:", docs.count())
    docs.select("doc_id", "spans").show(2, truncate=80)

    # 2. the KG-construction pipeline, checkpointed + resumable
    cfg = PipelineConfig(threshold=0.90, media_features=True, media_feature_dim=8)
    store = SnapshotStore(spark, os.path.join(work, "snapshots"))
    result = DocsPipeline(spark, store, cfg).run(docs, resume=True)

    print("value links:", result.edges.count())
    print("canonical clusters:", result.canonical.select("canonical_id").distinct().count())
    print("triples:", result.triples.count())
    print("media features:", result.media_features.count())
    result.triples.show(4, truncate=60)

    # 3. measures + findings (population comparison across the datasets)
    print(measurements_markdown(result.measures.limit(12)))
    export_deviations_csv(result.findings, os.path.join(work, "deviations_csv"))

    # 4. human review of the linking + graph export
    from abecto_spark.operators.extract import mentions_as_values

    values = mentions_as_values(result.mentions)
    from abecto_spark.operators.jw_mapping import jw_mapping

    edges = jw_mapping(values, ["label"], 0.90, case_sensitive=False)
    mapping_review(edges, values, "label").show(4, truncate=40)
    write_ntriples(result.triples, os.path.join(work, "graph_nt"))
    print("wrote N-Triples to", os.path.join(work, "graph_nt"))

    # 5. per-stage lineage metrics (what the metrics table records)
    for stage, manifest in result.metrics.items():
        if isinstance(manifest, dict) and "row_count" in manifest:
            print(f"  {stage}: rows={manifest['row_count']} partitions={len(manifest.get('partition_rows', {}))}")


if __name__ == "__main__":
    main()
