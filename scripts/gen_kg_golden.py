#!/usr/bin/env python
"""Recompute the flagship-pipeline golden fingerprint
(KG_GOLDEN_N_TRIPLES / KG_GOLDEN_HASH in plans/entry_queries.py and the
kg_pipeline_triples oracle). Run after any *intentional* semantic change
to the pipeline, then paste the printed constants.

The corpus is seed-deterministic (synth_docs n_docs=1500 n_entities=120
seed=42), so the fingerprint is stable across machines and sf dirs.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from abecto_spark.plans.entry_queries import kg_pipeline_triples_df
    from abecto_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    t = kg_pipeline_triples_df(spark)
    row = t.agg(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64("s", "p", "o_kind", "o_value", "doc_id", "span_idx"),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
    ).collect()[0]
    print(f"KG_GOLDEN_N_TRIPLES = {row['n']}")
    print(f"KG_GOLDEN_HASH = {row['h']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
