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
    ".rj": "rdfjson",
    ".rt": "rdfthrift", ".trdf": "rdfthrift",
    ".shaclc": "shaclc", ".shc": "shaclc",
}

_NT_LINE = re.compile(r"^<[^>]*>\s+<[^>]*>\s+.+\s*\.\s*$")


def sniff_format(path: str, head: str | None = None) -> str:
    """Return one of ntriples|turtle|trig|rdfxml|jsonld|trix."""
    low = path.lower()
    for ext, fmt in _EXT.items():
        if low.endswith(ext):
            return fmt
    if head is None:
        with open(path, "rb") as fh:
            raw = fh.read(8192)
        # an RDF-Thrift stream opens with the RDF_StreamRow field header:
        # 0x1C (prefixDecl) / 0x2C (triple) are bytes no RDF text format
        # starts with (0x3C — a quad-first stream — is '<', which opens
        # XML/N-Triples, so that case needs the extension/content type)
        if raw[:1] in (b"\x1c", b"\x2c"):
            return "rdfthrift"
        head = raw.decode("utf-8", errors="replace").lstrip("﻿")
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
    if fmt == "rdfjson":
        from .rdfjson import read_rdfjson_local

        return read_rdfjson_local(spark, path)
    if fmt == "shaclc":
        from .shaclc import read_shaclc_local

        return read_shaclc_local(spark, path)
    if fmt == "rdfthrift":
        from .rdfthrift import read_rdfthrift_local

        return read_rdfthrift_local(spark, path).drop("graph")
    raise ValueError(f"unknown RDF format {fmt!r}")


# ---------------------------------------------------------------------------
# text-content parsing with brute-force language fallback
# (`util/Models.java:69-95`: try each supported language on the buffered
# stream, collect per-language errors, raise combined)

#: HTTP content types → formats (for content negotiation); the Accept
#: header offered by url_source lists these, mirroring Models.java:108-111
CONTENT_TYPES = {
    "text/turtle": "turtle",
    "application/x-turtle": "turtle",
    "application/rdf+xml": "rdfxml",
    "application/ld+json": "jsonld",
    "application/json": "jsonld",
    "application/n-triples": "turtle",  # NT ⊂ Turtle, driver-side
    "application/n-quads": "trig",
    "application/trig": "trig",
    "application/trix+xml": "trix",
    "application/rdf+json": "rdfjson",
    "application/rdf+thrift": "rdfthrift",  # binary — handled pre-decode
}


def _parse_text(fmt: str, text: str) -> list[tuple]:
    """Parse RDF text of a known format into 6-tuple triple rows."""
    if fmt in ("turtle", "ntriples"):
        from .turtle import parse_turtle

        return parse_turtle(text)
    if fmt == "trig":
        from .turtle import parse_trig

        return [tuple(r[1:]) for r in parse_trig(text)]
    if fmt == "rdfxml":
        from .rdfxml import parse_rdfxml

        return parse_rdfxml(text)
    if fmt == "jsonld":
        from .jsonld import parse_jsonld

        return parse_jsonld(text)
    if fmt == "rdfjson":
        from .rdfjson import parse_rdfjson

        return parse_rdfjson(text)
    if fmt == "trix":
        from .trix import parse_trix

        return [tuple(r[1:]) for r in parse_trix(text)]
    raise ValueError(f"unknown RDF format {fmt!r}")


#: brute-force order ≈ the reference's supportedLanguages list
#: (`Models.java:66-67`), minus the binary/absent formats, plus Turtle
#: (which also covers N-Triples/N-Quads driver-side)
_BRUTE_FORCE_ORDER = ("rdfxml", "trig", "rdfjson", "jsonld", "trix", "turtle")


def parse_rdf_text(text: str, fmt: str | None = None) -> list[tuple]:
    """Parse RDF text into triple rows. With ``fmt`` (e.g. from an HTTP
    content type) that parser is tried first; on failure — or with no
    format hint — every driver-side parser is tried in order and the
    combined per-language errors raise loudly (`Models.java:69-95`)."""
    errors: dict[str, Exception] = {}
    if fmt:
        try:
            return _parse_text(fmt, text)
        except Exception as e:  # noqa: BLE001 — fall through to brute force
            errors[fmt] = e
    for lang in _BRUTE_FORCE_ORDER:
        if lang in errors:
            continue
        try:
            return _parse_text(lang, text)
        except Exception as e:  # noqa: BLE001 — try the next language
            errors[lang] = e
    detail = "\n  ".join(f"Failed to parse {k}: {v}" for k, v in errors.items())
    raise ValueError(f"Unknown RDF language.\n  {detail}")


def read_rdf_text(spark: SparkSession, text: str, fmt: str | None = None) -> DataFrame:
    rows = parse_rdf_text(text, fmt)
    ddl = ("s string, p string, o_kind string, o_value string,"
           " o_datatype string, o_lang string")
    return spark.createDataFrame(rows, ddl) if rows else spark.createDataFrame([], ddl)
