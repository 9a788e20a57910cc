"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction slice on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the training-data extensions); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible operator. Column
aliases match between both sides (the driver sorts columns by name and
hashes values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _tune(spark: SparkSession) -> None:
    # the driver may hand us a default session; pin the knobs that matter
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end KG-construction slice (synthetic
    interleaved docs → vectorized mention extraction → blocked JW entity
    linking → value-level CC canonicalization → (s, p, o) triples with
    span provenance), per the north rule."""
    _tune(spark)
    from abecto_spark.plans.entry_queries import kg_pipeline_triples_df

    return kg_pipeline_triples_df(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from abecto_spark.plans.entry_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from abecto_spark.plans.entry_queries import ORACLES

    return dict(ORACLES)
