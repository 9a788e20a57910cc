"""Core schemas of the engine (the Spark mapping of the reference's data
model, see SURVEY.md §1.3).

All value-bearing tables use the flattened RDF-term tagged union:
``(o_kind, o_value, o_datatype, o_lang)`` with ``o_kind ∈ {iri, bnode,
literal}``; for literals ``o_value`` is the lexical form. This mirrors the
reference's single value type (Jena RDFNode, `Aspect.java:145-170`) in a
columnar-friendly long format.
"""

from __future__ import annotations

from pyspark.sql import types as T

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_FLOAT = XSD + "float"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATE = XSD + "date"
XSD_DATETIME = XSD + "dateTime"

# xsd:integer plus its derived types — all share BigDecimal(lexical)
# semantics in the reference (`util/Literals.java:104-120`).
XSD_INTEGER_TYPES = tuple(
    XSD + n
    for n in (
        "integer", "decimal", "long", "int", "short", "byte",
        "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
        "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
        "unsignedByte",
    )
)
STRINGISH_TYPES = (XSD_STRING, RDF_LANG_STRING)
DATEISH_TYPES = (XSD_DATE, XSD_DATETIME)
NUMERIC_TYPES = XSD_INTEGER_TYPES + (XSD_FLOAT, XSD_DOUBLE)

# tagged-union value payload columns shared by several tables
VALUE_FIELDS = [
    T.StructField("o_kind", T.StringType(), False),     # iri | bnode | literal
    T.StructField("o_value", T.StringType(), True),     # IRI / bnode id / lexical form
    T.StructField("o_datatype", T.StringType(), True),  # literal datatype IRI
    T.StructField("o_lang", T.StringType(), True),      # language tag ('' if none)
]

# the aspect extraction output: one row per (dataset, resource, variable, value)
VALUES_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("resource", T.StringType(), False),
        T.StructField("variable", T.StringType(), False),
    ]
    + VALUE_FIELDS
)

# distinct aspect membership: which resources belong to the aspect per dataset
MEMBERS_SCHEMA = T.StructType([
    T.StructField("dataset", T.StringType(), False),
    T.StructField("resource", T.StringType(), False),
])

# correspondence / incorrespondence edges (D6)
EDGES_SCHEMA = T.StructType([
    T.StructField("src", T.StringType(), False),
    T.StructField("dst", T.StringType(), False),
])

# canonicalization result (D7): connected component representative
CANONICAL_SCHEMA = T.StructType([
    T.StructField("resource", T.StringType(), False),
    T.StructField("canonical_id", T.StringType(), False),
])

DECIMAL_16 = T.DecimalType(38, 16)  # BigDecimalMeasure scale 16 HALF_UP

# quality measurements (D8); compared_to is a sorted array of dataset ids
MEASURES_SCHEMA = T.StructType([
    T.StructField("measure", T.StringType(), False),
    T.StructField("aspect", T.StringType(), False),
    T.StructField("variable", T.StringType(), True),
    T.StructField("dataset", T.StringType(), False),       # computedOn
    T.StructField("compared_to", T.ArrayType(T.StringType()), False),
    T.StructField("value", DECIMAL_16, False),
])

# quality annotations (D9), long format; kind ∈ {deviation, value_omission,
# resource_omission, resource_duplicate, issue}
FINDINGS_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("aspect", T.StringType(), False),
        T.StructField("variable", T.StringType(), True),
        T.StructField("affected_dataset", T.StringType(), False),
        T.StructField("affected_resource", T.StringType(), True),
        T.StructField("affected_value", T.StringType(), True),
        T.StructField("compared_to_dataset", T.StringType(), True),
        T.StructField("compared_to_resource", T.StringType(), True),
        T.StructField("compared_to_value", T.StringType(), True),
        T.StructField("comment", T.StringType(), True),
    ]
)

# emitted graph triples (S4 output) with provenance back to the source doc
TRIPLES_SCHEMA = T.StructType([
    T.StructField("s", T.StringType(), False),
    T.StructField("p", T.StringType(), False),
    T.StructField("o_kind", T.StringType(), False),
    T.StructField("o_value", T.StringType(), True),
    T.StructField("o_datatype", T.StringType(), True),
    T.StructField("o_lang", T.StringType(), True),
    T.StructField("doc_id", T.StringType(), True),
    T.StructField("span_idx", T.IntegerType(), True),
])

# interleaved text+media documents (BASELINE.json input_hint)
SPAN_STRUCT = T.StructType([
    T.StructField("kind", T.StringType(), False),       # text|image|audio|table
    T.StructField("text", T.StringType(), True),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("offset", T.IntegerType(), False),
])
DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
])

# extracted mentions (S1 output)
MENTIONS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("dataset", T.StringType(), False),
    T.StructField("resource", T.StringType(), False),
    T.StructField("variable", T.StringType(), False),
    T.StructField("value", T.StringType(), True),
    T.StructField("span_idx", T.IntegerType(), False),
])

# measure name constants (mirroring the AV vocabulary of the reference)
M_COUNT = "count"
M_DEDUP_COUNT = "deduplicatedCount"
M_DUP_COUNT = "duplicateCount"
M_ABS_COVERAGE = "absoluteCoverage"
M_ABS_COVEREDNESS = "absoluteCoveredness"
M_REL_COVERAGE = "relativeCoverage"
M_REL_COVEREDNESS = "relativeCoveredness"
M_COMPLETENESS = "marCompletenessThomas08"
