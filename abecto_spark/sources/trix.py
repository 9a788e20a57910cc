"""Driver-side TriX reader — one of the formats the reference's sniffer
accepts (`util/Models.java:66-95`, ``Lang.TRIX``). TriX is the simplest
XML RDF serialization (W3C note, namespace
``http://www.w3.org/2004/03/trix/trix-1/``):

.. code-block:: xml

    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph>
        <uri>http://example.org/g1</uri>          <!-- optional label -->
        <triple>
          <uri>http://example.org/s</uri>
          <uri>http://example.org/p</uri>
          <plainLiteral xml:lang="en">hello</plainLiteral>
        </triple>
      </graph>
    </TriX>

Term elements: ``uri``, ``id`` (blank node), ``plainLiteral`` (optional
``xml:lang``), ``typedLiteral`` (required ``datatype``). A graph's
leading ``uri``/``id`` (before any ``triple``) names the graph; without
one the triples belong to the default graph (graph ``''``, the TriG
reader's convention). Bounded, driver-side like the other non-line
formats; unsupported constructs raise ``TrixUnsupported`` loudly.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_LANG_STRING, XSD_STRING

TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"
XML_NS = "http://www.w3.org/XML/1998/namespace"

QUADS_DDL = (
    "graph string, s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)


class TrixUnsupported(ValueError):
    pass


def _local(tag: str) -> str:
    if tag.startswith(f"{{{TRIX_NS}}}"):
        return tag[len(TRIX_NS) + 2:]
    raise TrixUnsupported(f"element {tag!r} outside the TriX namespace")


def _term(el) -> tuple[str, str, str | None, str]:
    """(kind, value, datatype, lang) of one term element."""
    local = _local(el.tag)
    text = el.text or ""
    if local == "uri":
        return ("iri", text.strip(), None, "")
    if local == "id":
        value = text.strip()
        return ("bnode", value if value.startswith("_:") else f"_:{value}", None, "")
    if local == "plainLiteral":
        lang = el.get(f"{{{XML_NS}}}lang", "")
        dt = RDF_LANG_STRING if lang else XSD_STRING
        return ("literal", text, dt, lang)
    if local == "typedLiteral":
        dt = el.get("datatype")
        if not dt:
            raise TrixUnsupported("typedLiteral without datatype")
        return ("literal", text, dt, "")
    raise TrixUnsupported(f"unknown term element <{local}>")


def parse_trix(text: str) -> list[tuple]:
    """Parse TriX text into (graph, s, p, o_kind, o_value, o_datatype,
    o_lang) tuples; default-graph rows carry graph ``''``."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise TrixUnsupported(f"not well-formed XML: {e}") from e
    if _local(root.tag) != "TriX":
        raise TrixUnsupported(f"root element is <{_local(root.tag)}>, not <TriX>")
    rows: list[tuple] = []
    for graph in root:
        if _local(graph.tag) != "graph":
            raise TrixUnsupported(f"unexpected <{_local(graph.tag)}> under <TriX>")
        gname = ""
        for child in graph:
            local = _local(child.tag)
            if local != "triple":
                # a leading uri/id names the graph
                if rows_in_graph(graph, child):
                    raise TrixUnsupported(
                        "graph label must precede the graph's triples"
                    )
                kind, value, _dt, _lang = _term(child)
                gname = value
                continue
            terms = list(child)
            if len(terms) != 3:
                raise TrixUnsupported(
                    f"<triple> with {len(terms)} term elements"
                )
            (sk, sv, _, _), (pk, pv, _, _), (ok, ov, odt, olang) = (
                _term(t) for t in terms
            )
            if sk == "literal":
                raise TrixUnsupported("literal subject")
            if pk != "iri":
                raise TrixUnsupported("predicate must be a <uri>")
            rows.append((gname, sv, pv, ok, ov, odt, olang))
    return rows


def rows_in_graph(graph, before) -> bool:
    """True if a <triple> appears before ``before`` in ``graph``."""
    for child in graph:
        if child is before:
            return False
        if _local(child.tag) == "triple":
            return True
    return False


def read_trix_local(spark: SparkSession, path: str) -> DataFrame:
    """Load a TriX file into the quads DataFrame (graph '' = default)."""
    with open(path, encoding="utf-8-sig") as fh:
        rows = parse_trix(fh.read())
    if not rows:
        return spark.createDataFrame([], QUADS_DDL)
    return spark.createDataFrame(rows, QUADS_DDL)
