"""Driver-side RDF/XML reader — the multi-format ingestion surface of the
reference (`util/Models.java:66-95` sniffs RDF/XML among others;
`Abecto.java:246-249` loads the bundled `om-2.0.rdf` ontology with it).

Bounded, driver-side (like the Turtle/TriG reader): plan/config/fixture
files, not a cluster ingestion path. Implements the RDF/XML subset the
reference's own bundled files use, verified against the full 42k-line
OM-2 ontology:

  * node elements: `rdf:Description` and typed elements (`owl:Class` →
    an `rdf:type` triple), `rdf:about` / `rdf:ID` / anonymous blank nodes,
  * property elements: `rdf:resource`, nested node elements, text
    literals with `rdf:datatype` / scoped `xml:lang`,
  * `rdf:parseType="Collection"` (rdf:first/rest list),
    `rdf:parseType="Literal"` (XML content serialized as an
    rdf:XMLLiteral lexical form), `rdf:parseType="Resource"` (implicit
    blank node),
  * container item elements `rdf:li` → `rdf:_1, _2, ...`,
  * DOCTYPE `<!ENTITY ...>` declarations (pre-expanded — Python's
    ElementTree does not resolve custom entities),
  * `xml:base` + relative `rdf:about/resource` resolution.

Unsupported constructs raise ``RdfXmlUnsupported`` loudly.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_LANG_STRING, XSD_STRING

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
RDF_TYPE = RDF_NS + "type"

TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)

_Q = lambda local: f"{{{RDF_NS}}}{local}"  # noqa: E731

# node-element attributes that are NOT property attributes
_NODE_ATTRS = {_Q("about"), _Q("ID"), _Q("nodeID"), f"{{{XML_NS}}}lang",
               f"{{{XML_NS}}}base"}

_ENTITY_DECL = re.compile(r"<!ENTITY\s+(\w+)\s+\"([^\"]*)\"\s*>")


class RdfXmlUnsupported(ValueError):
    pass


def _expand_entities(text: str) -> str:
    """Pre-expand DOCTYPE-declared entities (&om; etc.) — ElementTree
    raises 'undefined entity' otherwise. Standard XML entities are left
    for the parser."""
    decls = dict(_ENTITY_DECL.findall(text))
    if not decls:
        return text
    # entity values may reference earlier entities (not used by OM-2, but
    # cheap to support with a bounded fixpoint)
    for _ in range(4):
        changed = False
        for k, v in decls.items():
            nv = re.sub(
                r"&(\w+);",
                lambda m: decls.get(m.group(1), m.group(0)),
                v,
            )
            if nv != v:
                decls[k] = nv
                changed = True
        if not changed:
            break
    std = {"amp", "lt", "gt", "quot", "apos"}
    return re.sub(
        r"&(\w+);",
        lambda m: decls[m.group(1)] if m.group(1) in decls and m.group(1) not in std
        else m.group(0),
        text,
    )


class _RdfXmlParser:
    def __init__(self):
        self.triples: list[tuple] = []
        self._bn = 0

    def _fresh(self) -> str:
        self._bn += 1
        return f"_:x{self._bn}"

    def _emit(self, s, p, kind, value, datatype, lang):
        self.triples.append((s, p, kind, value, datatype, lang))

    @staticmethod
    def _split(tag: str) -> str:
        if not tag.startswith("{"):
            raise RdfXmlUnsupported(f"unnamespaced element <{tag}>")
        ns, local = tag[1:].split("}", 1)
        return ns + local

    def parse(self, text: str) -> list[tuple]:
        root = ET.fromstring(_expand_entities(text))
        base = root.get(f"{{{XML_NS}}}base", "")
        if self._split(root.tag) == RDF_NS + "RDF":
            for child in root:
                self.node_element(child, base, lang="")
        else:  # a single node element as document root is legal
            self.node_element(root, base, lang="")
        return self.triples

    def _resolve(self, ref: str, base: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", ref) or not base:
            return ref
        return urljoin(base, ref)

    def node_element(self, el: ET.Element, base: str, lang: str) -> tuple[str, str]:
        """Returns (kind, node) for the subject this element denotes."""
        base = el.get(f"{{{XML_NS}}}base", base)
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        about = el.get(_Q("about"))
        rid = el.get(_Q("ID"))
        node_id = el.get(_Q("nodeID"))
        if about is not None:
            kind, node = "iri", self._resolve(about, base)
        elif rid is not None:
            kind, node = "iri", self._resolve("#" + rid, base)
        elif node_id is not None:
            kind, node = "bnode", "_:" + node_id
        else:
            kind, node = "bnode", self._fresh()
        tag = self._split(el.tag)
        if tag != RDF_NS + "Description":
            self._emit(node, RDF_TYPE, "iri", tag, None, "")
        # property attributes (e.g. <om:Unit rdfs:label="x"/>)
        for attr, value in el.attrib.items():
            if attr in _NODE_ATTRS:
                continue
            p = self._split(attr)
            if p == RDF_TYPE:
                self._emit(node, p, "iri", self._resolve(value, base), None, "")
            elif p.startswith(RDF_NS):
                raise RdfXmlUnsupported(f"rdf: attribute {attr} on node element")
            else:
                self._emit(node, p, "literal", value,
                           RDF_LANG_STRING if lang else XSD_STRING, lang)
        li_counter = 0
        for prop in el:
            li_counter = self.property_element(node, prop, base, lang, li_counter)
        return kind, node

    def property_element(
        self, subj: str, el: ET.Element, base: str, lang: str, li_counter: int
    ) -> int:
        base = el.get(f"{{{XML_NS}}}base", base)
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        p = self._split(el.tag)
        if p == RDF_NS + "li":
            li_counter += 1
            p = f"{RDF_NS}_{li_counter}"

        parse_type = el.get(_Q("parseType"))
        resource = el.get(_Q("resource"))
        node_id = el.get(_Q("nodeID"))
        datatype = el.get(_Q("datatype"))
        children = list(el)

        if parse_type == "Collection":
            items = [self.node_element(c, base, lang) for c in children]
            if not items:
                self._emit(subj, p, "iri", RDF_NS + "nil", None, "")
                return li_counter
            heads = [self._fresh() for _ in items]
            self._emit(subj, p, "bnode", heads[0], None, "")
            for i, (ikind, inode) in enumerate(items):
                self._emit(heads[i], RDF_NS + "first", ikind, inode, None, "")
                if i + 1 < len(heads):
                    self._emit(heads[i], RDF_NS + "rest", "bnode", heads[i + 1], None, "")
                else:
                    self._emit(heads[i], RDF_NS + "rest", "iri", RDF_NS + "nil", None, "")
            return li_counter
        if parse_type == "Literal":
            inner = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            self._emit(subj, p, "literal", inner, RDF_NS + "XMLLiteral", "")
            return li_counter
        if parse_type == "Resource":
            bn = self._fresh()
            self._emit(subj, p, "bnode", bn, None, "")
            inner_li = 0
            for c in children:
                inner_li = self.property_element(bn, c, base, lang, inner_li)
            return li_counter
        if parse_type is not None:
            raise RdfXmlUnsupported(f"parseType {parse_type!r}")

        if resource is not None:
            self._emit(subj, p, "iri", self._resolve(resource, base), None, "")
            return li_counter
        if node_id is not None:
            self._emit(subj, p, "bnode", "_:" + node_id, None, "")
            return li_counter
        if children:
            if len(children) != 1 or (el.text or "").strip():
                raise RdfXmlUnsupported(
                    f"property <{p}> mixes text and element content"
                )
            okind, onode = self.node_element(children[0], base, lang)
            self._emit(subj, p, okind, onode, None, "")
            return li_counter
        # text literal (possibly empty)
        lex = el.text or ""
        if datatype is not None:
            self._emit(subj, p, "literal", lex, datatype, "")
        elif lang:
            self._emit(subj, p, "literal", lex, RDF_LANG_STRING, lang.lower())
        else:
            self._emit(subj, p, "literal", lex, XSD_STRING, "")
        return li_counter


def parse_rdfxml(text: str) -> list[tuple]:
    """Parse RDF/XML text into (s, p, o_kind, o_value, o_datatype, o_lang)
    tuples (driver-side, bounded input)."""
    return _RdfXmlParser().parse(text)


def read_rdfxml_local(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8-sig") as fh:
        rows = parse_rdfxml(fh.read())
    if not rows:
        return spark.createDataFrame([], TRIPLES_DDL)
    return spark.createDataFrame(rows, TRIPLES_DDL)
