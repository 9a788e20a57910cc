"""UsePresentMappingProcessor (`UsePresentMappingProcessor.java:44-88`):
each resource corresponds to the resource stored as the value of the
configured variable (explicit cross-links present in the data); literal
values yield "Invalid Value" issues (`:75-83`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def use_present_mapping(
    values: DataFrame, variable: str, aspect: str = "aspect"
) -> tuple[DataFrame, DataFrame]:
    vals = values.where(F.col("variable") == variable)
    edges = (
        vals.where(F.col("o_kind") == "iri")
        .select(F.col("resource").alias("src"), F.col("o_value").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    issues = vals.where(F.col("o_kind") != "iri").select(
        F.lit("issue").alias("kind"),
        F.lit(aspect).alias("aspect"),
        F.lit(variable).alias("variable"),
        F.col("dataset").alias("affected_dataset"),
        F.col("resource").alias("affected_resource"),
        F.col("o_value").alias("affected_value"),
        F.lit(None).cast("string").alias("compared_to_dataset"),
        F.lit(None).cast("string").alias("compared_to_resource"),
        F.lit(None).cast("string").alias("compared_to_value"),
        F.lit("Invalid Value: Failed to get corresponding resource, found a literal.").alias(
            "comment"
        ),
    )
    return edges, issues
