"""Metadata-graph ingestion — reading the reference's annotation
vocabulary out of plain triples into the engine's relational inputs:

  * ``wrong_values_from_metadata`` — `av:WrongValue` quality annotations
    (`Metadata.java:199-228`: ?ann oa:hasTarget ?r ; oa:hasBody [ a
    av:WrongValue ; av:affectedAspect ?a ; av:affectedValue ?v ;
    av:affectedVariableName ?n ]) → the ``wrong_values`` DataFrame
    consumed by property_comparison's suppression anti-join.
  * ``correspondences_from_metadata`` — predefined
    `av:correspondsToResource` / `av:correspondsNotToResource`
    statements (`MappingProcessor.java:38-50`, tutorial
    `manualMappings` graph) → (corr, incorr) edge DataFrames for
    MappingGraph.

Both run through the engine's own SPARQL compiler (sparql.py) /
predicate filters — pure Catalyst, no collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sparql import sparql_select

AV = "http://w3id.org/abecto/vocabulary#"
OA = "http://www.w3.org/ns/oa#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def wrong_values_from_metadata(
    triples: DataFrame, dataset: str, aspect: str | None = None
) -> DataFrame:
    """(dataset, resource, variable, o_value) rows for every
    av:WrongValue annotation in the metadata triples — the input-side of
    the reference's `isWrongValue` ASK probe, materialized once instead
    of probed per finding."""
    aspect_atom = (
        f"<{AV}affectedAspect> <{aspect}> ;" if aspect
        else f"<{AV}affectedAspect> ?aspect ;"
    )
    wide = sparql_select(
        triples,
        f"""
        SELECT ?r ?var ?val WHERE {{
          ?ann <{OA}hasTarget> ?r ; <{OA}hasBody> ?body .
          ?body a <{AV}WrongValue> ;
                {aspect_atom}
                <{AV}affectedValue> ?val ;
                <{AV}affectedVariableName> ?var .
        }}
        """,
    )
    return wide.select(
        F.lit(dataset).alias("dataset"),
        F.col("r")["value"].alias("resource"),
        F.col("var")["value"].alias("variable"),
        F.col("val")["value"].alias("o_value"),
    ).distinct()


def correspondences_from_metadata(
    triples: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """(corr_edges, incorr_edges) from explicit statements in a
    (predefined) metadata graph."""

    def edges(pred: str) -> DataFrame:
        return (
            triples.where((F.col("p") == pred) & (F.col("o_kind") == "iri"))
            .select(F.col("s").alias("src"), F.col("o_value").alias("dst"))
            .distinct()
        )

    return (
        edges(AV + "correspondsToResource"),
        edges(AV + "correspondsNotToResource"),
    )
