"""SPARQL ``langMatches`` semantics and the language-filter exclusion of
the reference (`PropertyComparisonProcessor.java:528-538`): only literals
of type xsd:string / rdf:langString are subject to filtering; a value is
excluded when its language tag matches none of the patterns. Pattern
semantics (RFC 4647 basic filtering, as in Jena's NodeFunctions):
``""`` matches only the empty tag, ``"*"`` any non-empty tag, otherwise
case-insensitive exact match or prefix match at a ``-`` boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import STRINGISH_TYPES, XSD_STRING


def lang_matches(lang: Column, pattern: str) -> Column:
    lang = F.lower(F.coalesce(lang, F.lit("")))
    if pattern == "":
        return lang == ""
    if pattern == "*":
        return lang != ""
    p = pattern.lower()
    return (lang == p) | lang.startswith(p + "-")


def lang_excluded(
    o_kind: Column, o_datatype: Column, o_lang: Column, patterns: tuple[str, ...]
) -> Column:
    """True when the value must be dropped from comparison entirely."""
    is_stringish = (o_kind == "literal") & F.coalesce(
        o_datatype, F.lit(XSD_STRING)
    ).isin(*STRINGISH_TYPES)
    any_match = F.lit(False)
    for p in patterns:
        any_match = any_match | lang_matches(o_lang, p)
    return is_stringish & ~any_match
