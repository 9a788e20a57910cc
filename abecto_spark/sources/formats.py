"""Multi-format RDF ingestion with format sniffing — the analog of the
reference's `util/Models.java:66-95` (Jena RIOT tries a language list
until one parses).

``read_rdf_local`` dispatches by file extension first, then content
sniffing: XML declaration / ``<rdf:RDF`` → RDF/XML, leading ``{``/``[``
→ JSON-LD, ``GRAPH`` / named-graph blocks → TriG, line-shaped
``<s> <p> <o> .`` → distributed N-Triples, otherwise Turtle. Driver-side
parsers (Turtle/TriG/RDF/XML/JSON-LD) are for plan/config/fixture files;
N-Triples/N-Quads stay the distributed cluster ingestion path
(sources/rdf.py)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_EXT = {
    ".nt": "ntriples", ".nq": "ntriples",
    ".ttl": "turtle", ".turtle": "turtle",
    ".trig": "trig",
    ".rdf": "rdfxml", ".owl": "rdfxml", ".xml": "rdfxml",
    ".trix": "trix",
    ".jsonld": "jsonld", ".json": "jsonld",
}

_NT_LINE = re.compile(r"^<[^>]*>\s+<[^>]*>\s+.+\s*\.\s*$")


def sniff_format(path: str, head: str | None = None) -> str:
    """Return one of ntriples|turtle|trig|rdfxml|jsonld|trix."""
    low = path.lower()
    for ext, fmt in _EXT.items():
        if low.endswith(ext):
            return fmt
    if head is None:
        with open(path, encoding="utf-8-sig", errors="replace") as fh:
            head = fh.read(8192)
    stripped = head.lstrip("﻿ \t\r\n")
    if "<TriX" in head or "trix/trix-1" in head:
        return "trix"
    if stripped.startswith("<?xml") or "<rdf:RDF" in head:
        return "rdfxml"
    if stripped.startswith("{"):
        return "jsonld"
    if stripped.startswith("["):
        # Turtle statements may legally start with a blank node
        # ('[] a ex:Thing .' / '[ ex:p 1 ] ex:q 2 .'); only treat the
        # file as JSON-LD when the bracket opens a JSON-looking array
        # (next token is an object/array/string) or is an empty array
        if re.match(r"\[\s*[\[{\"]", stripped) or re.fullmatch(
            r"\[\s*\]\s*", stripped
        ):
            return "jsonld"
        # otherwise fall through to the Turtle-family heuristics
    body = re.sub(r"#[^\n]*", "", head)
    if re.search(r"(?im)^\s*GRAPH\b", body) or re.search(r"}\s*$", body.strip()):
        return "trig"
    lines = [ln for ln in body.splitlines() if ln.strip()]
    if lines and all(_NT_LINE.match(ln) for ln in lines[:20]):
        return "ntriples"
    return "turtle"


def read_rdf_local(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Load one RDF file into the triples DataFrame, sniffing the format
    unless ``fmt`` is given."""
    fmt = fmt or sniff_format(path)
    if fmt == "ntriples":
        from .rdf import read_ntriples

        return read_ntriples(spark, path).drop("graph")
    if fmt == "turtle":
        from .turtle import read_turtle_local

        return read_turtle_local(spark, path)
    if fmt == "trig":
        from .turtle import read_trig_local

        return read_trig_local(spark, path).drop("graph")
    if fmt == "rdfxml":
        from .rdfxml import read_rdfxml_local

        return read_rdfxml_local(spark, path)
    if fmt == "trix":
        from .trix import read_trix_local

        return read_trix_local(spark, path).drop("graph")
    if fmt == "jsonld":
        from .jsonld import read_jsonld_local

        return read_jsonld_local(spark, path)
    raise ValueError(f"unknown RDF format {fmt!r}")
