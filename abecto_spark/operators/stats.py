"""Grouped corpus distribution statistics — the per-source / per-language
length and quality profile every training-data ops team watches.

Exact percentiles, not approximations: Spark's ``percentile`` aggregate
is a TypedImperativeAggregate over a value→count histogram, so it
partial-aggregates map-side and its per-group merge state is bounded by
the number of *distinct* values, not rows — for token/char lengths that
is at most a few hundred thousand entries per group at any corpus size,
which is why the exact form is safe here where it would not be for an
unbounded-cardinality metric (there, switch to ``approx_percentile``).
Interpolation is the standard linear rule, bit-identical to DuckDB's
``quantile_cont`` (verified in the driver oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count


def corpus_stats(
    docs: DataFrame,
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    percentiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One row per group: document count, total tokens, mean tokens, and
    the exact token-count percentiles (columns ``p50_tokens`` etc.,
    rounded to 6 dp). One map-side-combined shuffle keyed by the group
    columns; group count only bounds the *output*, not any task's input,
    because the percentile state is a mergeable histogram."""
    base = docs.select(
        *[F.col(c) for c in group_cols], token_count(F.col(text_col)).alias("_nt")
    )
    pcols = [
        F.round(F.expr(f"percentile(_nt, {p!r})"), 6).alias(
            f"p{str(p)[2:].ljust(2, '0')}_tokens"
        )
        for p in percentiles
    ]
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.round(F.avg("_nt"), 6).alias("avg_tokens"),
        *pcols,
        F.max("_nt").alias("max_tokens"),
    )
