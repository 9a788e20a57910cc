#!/usr/bin/env python
"""Per-stage wall-clock profile of the KG pipeline at one parallelism
level (invoke twice with different CORES to compare scaling).

Usage: CORES=8 DOCS=100000 python scripts/stage_profile.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(os.environ.get("CORES", 8))
    n_docs = int(os.environ.get("DOCS", 100_000))
    docs_path = os.environ.get("DOCS_PATH")

    from pyspark.sql import functions as F

    from abecto_spark.operators.closure import connected_components, strip_synthetic
    from abecto_spark.operators.extract import DEFAULT_RULES, extract_mentions, mentions_as_values
    from abecto_spark.operators.jw_mapping import jw_mapping
    from abecto_spark.operators.population import population_comparison
    from abecto_spark.plans.pipeline import DocsPipeline, PipelineConfig
    from abecto_spark.session import get_spark
    from abecto_spark.sources.checkpoint import SnapshotStore
    from abecto_spark.sources.docs import synth_docs

    spark = get_spark(
        app_name=f"stage_profile_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    T = time.time
    if docs_path:
        docs = spark.read.parquet(docs_path)
    else:
        docs = synth_docs(spark, n_docs=n_docs, n_entities=max(n_docs // 12, 10),
                          partitions=64).localCheckpoint(eager=True)
    t = T(); docs.count(); print(f"[{cores}] docs ready: {round(T()-t,1)}s")

    snap = tempfile.mkdtemp(prefix=f"prof_{cores}_")
    store = SnapshotStore(spark, snap)
    try:
        t = T()
        mentions = extract_mentions(docs, DEFAULT_RULES)
        m1 = store.write(mentions, "s1", "t")
        print(f"[{cores}] S1 extract+write: {round(T()-t,1)}s rows={m1['row_count']}")
        mentions = store.read("s1")
        values = mentions_as_values(mentions)

        t = T()
        edges = jw_mapping(values, ["label"], 0.90, case_sensitive=False,
                           block="grams", star=True, return_value_links=True)
        m2 = store.write(edges, "s2", "t")
        print(f"[{cores}] S2 jw+write: {round(T()-t,1)}s rows={m2['row_count']}")
        edges = store.read("s2")

        t = T()
        from abecto_spark.operators.closure import canonical_from_value_links

        canonical = strip_synthetic(
            canonical_from_value_links(edges, values, ["label"], False)
        )
        m3 = store.write(canonical, "s3", "t")
        print(f"[{cores}] S3 cc+write: {round(T()-t,1)}s rows={m3['row_count']}")
        canonical = store.read("s3")

        t = T()
        pipe = DocsPipeline(spark, store, PipelineConfig())
        triples = pipe._materialize_triples(mentions, canonical)
        m4 = store.write(triples, "s4", "t")
        print(f"[{cores}] S4 triples+write: {round(T()-t,1)}s rows={m4['row_count']}")

        t = T()
        members = values.select("dataset", "resource").distinct()
        measures, _ = population_comparison(spark, members, canonical, "entity")
        store.write(measures, "s5", "t")
        print(f"[{cores}] S5 measures+write: {round(T()-t,1)}s")
    finally:
        shutil.rmtree(snap, ignore_errors=True)


if __name__ == "__main__":
    main()
