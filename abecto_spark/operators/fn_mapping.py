"""FunctionalMappingProcessor (`FunctionalMappingProcessor.java:43-84`):
if corresponding resources of a *referring* aspect point via a variable to
resources of a *referred* aspect, those referred resources correspond.
Literal values yield "Invalid Value" issues (`:73-76`).

Spark shape: join referring values to the canonical cluster map (inner —
only resources that are members of a correspondence group stream through
the reference's group loop), collect the referred resources per cluster,
and emit star edges to the cluster minimum (CC closes the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def functional_mapping(
    referring_values: DataFrame,
    referring_variable: str,
    canonical: DataFrame,
    aspect: str = "aspect",
) -> tuple[DataFrame, DataFrame]:
    """Returns (edges, issues).

    ``referring_values``: long values table of the referring aspect.
    ``canonical``: (resource, canonical_id) over the referring resources.
    """
    vals = referring_values.where(F.col("variable") == referring_variable)
    grouped = vals.join(canonical, "resource")  # inner: grouped resources only

    res_vals = grouped.where(F.col("o_kind") == "iri")
    # star edges: min referred resource per cluster — CC infers the clique
    w = Window.partitionBy("canonical_id")
    edges = (
        res_vals.select("canonical_id", F.col("o_value").alias("referred"))
        .distinct()
        .withColumn("lo", F.min("referred").over(w))
        .where(F.col("referred") != F.col("lo"))
        .select(F.col("lo").alias("src"), F.col("referred").alias("dst"))
        .distinct()
    )

    issues = grouped.where(F.col("o_kind") != "iri").select(
        F.lit("issue").alias("kind"),
        F.lit(aspect).alias("aspect"),
        F.lit(referring_variable).alias("variable"),
        F.col("dataset").alias("affected_dataset"),
        F.col("resource").alias("affected_resource"),
        F.col("o_value").alias("affected_value"),
        F.lit(None).cast("string").alias("compared_to_dataset"),
        F.lit(None).cast("string").alias("compared_to_resource"),
        F.lit(None).cast("string").alias("compared_to_value"),
        F.lit("Invalid Value: Should be a resource.").alias("comment"),
    )
    return edges, issues
