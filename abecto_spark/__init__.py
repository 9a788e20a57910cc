"""abecto_spark — a PySpark-native knowledge-graph construction & ABox
comparison engine.

From-scratch rebuild of the capabilities of fusion-jena/abecto (reference at
/root/reference, v3.1.3) as idiomatic Spark DataFrame stages:

- sources:   interleaved text+media document tables, RDF-ish long statement
             tables, snapshot checkpoint store (parquet; Iceberg-ready).
- operators: mention extraction, Jaro-Winkler / equivalent-value /
             functional / use-present entity linking, transitive mapping
             closure (connected components with incorrespondence veto),
             population & property comparison measures, rule fixpoints,
             dedup (exact/minhash/simhash), ANN similarity search.
- functions: C-EQ literal canonicalization, vectorized Jaro-Winkler,
             language matching, text quality analysis.
- plans:     resumable stage pipeline with per-partition lineage metrics.

Everything is built on public knowledge only: the Apache Spark API and the
reference repository's observable behavior/test fixtures.
"""

__version__ = "0.1.0"
