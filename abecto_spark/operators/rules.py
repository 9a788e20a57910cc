"""Semi-naive fixpoint evaluation — the Spark re-expression of the
reference's SparqlConstructProcessor / ForwardRuleReasoningProcessor
(`SparqlConstructProcessor.java:30-56`, `ForwardRuleReasoningProcessor.java:33-44`):
a rule is a join-project over the current relation; iteration re-runs it
until no new rows appear (or ``max_iterations``), with ``localCheckpoint``
per round to cut lineage (Catalyst does not iterate, SURVEY.md §4).

Semi-naive: each round joins only the *delta* against the full relation,
not all-pairs again — the work per round is proportional to new facts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fixpoint(
    base: DataFrame,
    rule: Callable[[DataFrame, DataFrame], DataFrame],
    max_iterations: int = 25,
) -> DataFrame:
    """Least fixpoint of ``base ∪ rule(delta, all)``.

    ``rule(delta, all)`` must return candidate new rows with the same
    schema as ``base`` given the last round's new rows and the full
    relation (semi-naive evaluation).
    """
    all_rows = base.distinct().localCheckpoint(eager=True)
    delta = all_rows
    for _ in range(max_iterations):
        new = (
            rule(delta, all_rows)
            .distinct()
            .join(all_rows, list(base.columns), "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            break
        all_rows = all_rows.unionByName(new).localCheckpoint(eager=True)
        delta = new
    return all_rows


def transitive_closure(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """All-pairs reachability closure of (src, dst) edges (the fixpoint of
    ``reach(x,z) ← reach(x,y), edge(y,z)``)."""
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)

    def rule(delta: DataFrame, _all: DataFrame) -> DataFrame:
        return (
            delta.alias("d")
            .join(edges.alias("e"), F.col("d.dst") == F.col("e.src"))
            .select(F.col("d.src").alias("src"), F.col("e.dst").alias("dst"))
        )

    return fixpoint(edges, rule, max_iterations)
