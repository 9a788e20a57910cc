"""EquivalentValueMappingProcessor (`EquivalentValueMappingProcessor.java:44-113`)
as an explode-then-join equi-join.

Two resources of the same aspect in different datasets correspond iff for
**every** configured variable they share at least one equivalent value
(`:85-107`): literal values by RDF-term equality, resource values by
current correspondence (expanded over correspondence groups, `:85-100`);
resources with an unbound configured variable never correspond
(`Aspect.java:275`).

Spark shape: per variable, join dataset1-rows × dataset2-rows on the value
key (term key for literals, canonical cluster id for resources); a resource
pair links iff it matches on all ``len(variables)`` distinct variables.
"Only one pair of values must be equivalent per variable" = explode before
the join, not array equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ceq import term_key
from ..operators.closure import canonicalize


def equivalent_value_mapping(
    values: DataFrame,
    variables: list[str],
    canonical: DataFrame,
    assume_single_valued: bool | None = None,
) -> DataFrame:
    """Correspondence edges (src, dst) across all unordered dataset pairs.

    ``canonical``: (resource, canonical_id) from prior mapping steps —
    resource-valued variables match via cluster id.

    When every (resource, variable) is single-valued, "share ≥1 equivalent
    value for every variable" degenerates to equality of the whole value
    tuple — one pivot + one equi-join on the composite key instead of a
    per-variable explode-join (which shuffles |vars| low-cardinality joins
    and suffers key skew). Detected with one cheap aggregate unless forced
    via ``assume_single_valued``.
    """
    n_vars = len(variables)
    v = values.where(F.col("variable").isin(variables))

    # value key: literals by term, resources by canonical cluster
    iri_vals = v.where(F.col("o_kind") == "iri")
    iri_keyed = canonicalize(
        iri_vals.withColumnRenamed("o_value", "valres").withColumnRenamed(
            "resource", "res_keep"
        ).withColumnRenamed("valres", "resource"),
        canonical,
    )
    iri_keyed = iri_keyed.select(
        "dataset",
        F.col("res_keep").alias("resource"),
        "variable",
        F.concat(F.lit("res:"), F.col("canonical_id")).alias("vkey"),
    )
    lit_keyed = v.where(F.col("o_kind") != "iri").select(
        "dataset",
        "resource",
        "variable",
        F.concat(
            F.lit("term:"),
            term_key(F.col("o_kind"), F.col("o_value"), F.col("o_datatype"), F.col("o_lang")),
        ).alias("vkey"),
    )
    keyed = iri_keyed.unionByName(lit_keyed)

    if assume_single_valued is None:
        assume_single_valued = (
            keyed.groupBy("dataset", "resource", "variable")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > 1)
            .limit(1)
            .count()
            == 0
        )
    if assume_single_valued:
        wide = (
            keyed.groupBy("dataset", "resource")
            .pivot("variable", variables)
            .agg(F.first("vkey"))
        )
        for var in variables:  # unbound variable -> never equivalent
            wide = wide.where(F.col(f"`{var}`").isNotNull())
        tup = F.concat_ws("\x1f", *[F.col(f"`{v_}`") for v_ in variables])
        w1 = wide.select(
            F.col("dataset").alias("d1"), F.col("resource").alias("src"), tup.alias("t")
        )
        w2 = wide.select(
            F.col("dataset").alias("d2"), F.col("resource").alias("dst"), tup.alias("t")
        )
        return (
            w1.join(w2, "t")
            .where(F.col("d1") < F.col("d2"))
            .select("src", "dst")
            .distinct()
        )

    s1 = keyed.select(
        F.col("dataset").alias("d1"),
        F.col("resource").alias("src"),
        "variable",
        "vkey",
    )
    s2 = keyed.select(
        F.col("dataset").alias("d2"),
        F.col("resource").alias("dst"),
        "variable",
        "vkey",
    )
    matched = (
        s1.join(s2, ["variable", "vkey"])
        .where(F.col("d1") < F.col("d2"))
        .select("src", "dst", "variable")
        .distinct()
    )
    edges = (
        matched.groupBy("src", "dst")
        .agg(F.count_distinct("variable").alias("nv"))
        .where(F.col("nv") == n_vars)
        .select("src", "dst")
    )
    return edges
