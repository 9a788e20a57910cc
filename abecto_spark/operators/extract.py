"""S1 — vectorized mention detection over interleaved document spans
(the Spark re-expression of ABECTO's aspect pattern scan, SURVEY.md §7.1).

Extraction rules are declarative regexes applied JVM-side with
``regexp_extract_all`` inside whole-stage codegen — the span explode +
regex scan never leaves Tungsten. Each doc is one KG resource (its
entity); mentions become values of the configured variable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MentionRule:
    variable: str
    pattern: str  # java regex with one capture group
    group: int = 1


DEFAULT_RULES = (MentionRule("label", r"\[\[([^\]]+)\]\]"),)


def extract_mentions(
    docs: DataFrame,
    rules: tuple[MentionRule, ...] = DEFAULT_RULES,
    dataset_expr=None,
) -> DataFrame:
    """MENTIONS_SCHEMA rows: (doc_id, dataset, resource, variable, value,
    span_idx). ``dataset_expr``: Column deriving the dataset id from the
    doc (default: the ``d<k>-`` doc_id prefix)."""
    if dataset_expr is None:
        dataset_expr = F.regexp_extract(F.col("doc_id"), r"^(d\d+)-", 1)

    ex = docs.select(
        "doc_id",
        dataset_expr.alias("dataset"),
        F.posexplode("spans").alias("span_idx", "span"),
    ).where(F.col("span.kind") == "text")

    outs = []
    for rule in rules:
        outs.append(
            ex.select(
                "doc_id",
                "dataset",
                F.col("doc_id").alias("resource"),
                F.lit(rule.variable).alias("variable"),
                F.explode(
                    F.regexp_extract_all(F.col("span.text"), F.lit(rule.pattern), F.lit(rule.group))
                ).alias("value"),
                F.col("span_idx").cast("int").alias("span_idx"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def mentions_as_values(mentions: DataFrame) -> DataFrame:
    """Adapt MENTIONS rows to the long VALUES table consumed by the
    mapping/comparison operators."""
    from ..model import XSD_STRING

    return mentions.select(
        "dataset",
        "resource",
        "variable",
        F.lit("literal").alias("o_kind"),
        F.col("value").alias("o_value"),
        F.lit(XSD_STRING).alias("o_datatype"),
        F.lit("").alias("o_lang"),
    )
