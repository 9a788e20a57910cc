"""SHACL Compact Syntax (SHACL-C) reader — the writable half of the
reference's sniff-list tail (`util/Models.java:66-67` lists SHACLC via
Jena's shacl module; RDF-Thrift, the binary entry, stays a clear
conversion error in ``formats.py``).

Parses the W3C SHACL-C draft grammar's core into the standard SHACL
triples Jena's reader would produce, for the subset that occurs in real
shape files:

  * ``BASE <iri>``, ``PREFIX p: <iri>``, ``IMPORTS <iri>``
    (→ ``owl:imports`` on ``owl:Ontology``);
  * ``shape <name> [-> <targetClass> ...] { ... }`` →
    ``sh:NodeShape`` + ``sh:targetClass``;
  * target directives ``targetNode= / targetClass= / targetObjectsOf= /
    targetSubjectsOf= v ... .``;
  * property lines ``[^]<path> atom ... .`` where each atom is a
    datatype/class IRI (xsd-namespace IRIs → ``sh:datatype``, others →
    ``sh:class`` — Jena's propertyType rule), ``@<shape>`` →
    ``sh:node``, a node-kind word → ``sh:nodeKind``, a cardinality
    ``[m..n]`` → ``sh:minCount``/``sh:maxCount`` (0 / ``*`` omitted),
    or ``name=value`` → ``sh:<name>``.

  * ``name=[v1 v2 ...]`` value lists → rdf:first/rest chains (so
    ``in= / languageIn=`` work; languageIn members must be quoted
    strings), and shape-level ``closed=true`` /
    ``ignoredProperties=[...]`` lines.

Everything else (nested inline shapes, logical combinators) raises
``ShaclcUnsupported`` loudly. Blank-node labels are deterministic
(``_:pc1`` ...), so output is reproducible.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..model import XSD, XSD_STRING

SH = "http://www.w3.org/ns/shacl#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
OWL = "http://www.w3.org/2002/07/owl#"

TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)

_NODE_KINDS = {
    "IRI", "BlankNode", "Literal",
    "BlankNodeOrIRI", "BlankNodeOrLiteral", "IRIOrLiteral",
}

_TARGETS = {
    "targetNode": SH + "targetNode",
    "targetClass": SH + "targetClass",
    "targetObjectsOf": SH + "targetObjectsOf",
    "targetSubjectsOf": SH + "targetSubjectsOf",
}


class ShaclcUnsupported(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    \s+|\#[^\n]*
  | (?P<iri><[^<>\s]*>)
  | (?P<str>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<card>\[\s*\d+\s*\.\.\s*(?:\d+|\*)\s*\])
  | (?P<num>[+-]?(?:\d+\.\d+|\d+))
  | (?P<arrow>->)
  | (?P<pname>(?:[A-Za-z_][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_][A-Za-z0-9_.-]*)?)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[{}=.^@\[\]])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ShaclcUnsupported(
                f"cannot tokenize SHACL-C at: {text[pos:pos+30]!r}"
            )
        pos = m.end()
        if m.lastgroup:
            out.append((m.lastgroup, m.group().strip()))
    out.append(("eof", ""))
    return out


class _ShaclcParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.triples: list[tuple] = []
        self._bn = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, val: str):
        k, v = self.next()
        if v != val:
            raise ShaclcUnsupported(f"expected {val!r}, got {v!r}")

    # -- terms ----------------------------------------------------------
    def _iri(self, k: str, v: str) -> str:
        if k == "iri":
            return v[1:-1]
        if k == "pname":
            pfx, local = v.split(":", 1)
            if pfx not in self.prefixes:
                raise ShaclcUnsupported(f"undeclared prefix {pfx!r}:")
            return self.prefixes[pfx] + local
        raise ShaclcUnsupported(f"IRI expected, got {v!r}")

    def _emit(self, s, p, kind, value, datatype=None, lang=""):
        self.triples.append((s, p, kind, value, datatype, lang))

    def _value(self):
        """A parameter/target value: IRI, string, number, or boolean —
        returns (kind, value, datatype)."""
        k, v = self.next()
        if k in ("iri", "pname"):
            return ("iri", self._iri(k, v), None)
        if k == "str":
            return ("literal", v[1:-1], XSD_STRING)
        if k == "num":
            dt = XSD + ("integer" if re.fullmatch(r"[+-]?\d+", v) else "decimal")
            return ("literal", v, dt)
        if k == "word" and v in ("true", "false"):
            return ("literal", v, XSD + "boolean")
        raise ShaclcUnsupported(f"bad value {v!r}")

    def _list(self):
        """A ``[v1 v2 ...]`` value list as an rdf:first/rest chain;
        returns the head term — ``rdf:nil`` for the empty list."""
        self.eat("[")
        items = []
        while self.peek()[1] != "]":
            items.append(self._value())
        self.eat("]")
        if not items:
            return ("iri", RDF_NS + "nil", None)
        nodes = []
        for _ in items:
            self._bn += 1
            nodes.append(f"_:pc{self._bn}")
        for idx, (kind, value, dt) in enumerate(items):
            self._emit(nodes[idx], RDF_NS + "first", kind, value, dt)
            if idx + 1 < len(items):
                self._emit(nodes[idx], RDF_NS + "rest", "bnode",
                           nodes[idx + 1])
            else:
                self._emit(nodes[idx], RDF_NS + "rest", "iri",
                           RDF_NS + "nil")
        return ("bnode", nodes[0], None)

    def _value_or_list(self):
        if self.peek()[1] == "[":
            return self._list()
        return self._value()

    # -- top level -------------------------------------------------------
    def parse(self) -> list[tuple]:
        while True:
            k, v = self.peek()
            if k == "eof":
                return self.triples
            if k == "word" and v == "BASE":
                self.next()
                k2, v2 = self.next()
                self.base = self._iri(k2, v2)
            elif k == "word" and v == "PREFIX":
                self.next()
                k2, v2 = self.next()
                if k2 != "pname" or not v2.endswith(":"):
                    raise ShaclcUnsupported(f"bad prefix name {v2!r}")
                k3, v3 = self.next()
                self.prefixes[v2[:-1]] = self._iri(k3, v3)
            elif k == "word" and v == "IMPORTS":
                self.next()
                k2, v2 = self.next()
                onto = self.base or ""
                self._emit(onto, RDF_TYPE, "iri", OWL + "Ontology")
                self._emit(onto, OWL + "imports", "iri", self._iri(k2, v2))
            elif k == "word" and v == "shape":
                self.next()
                self._shape()
            else:
                raise ShaclcUnsupported(f"unsupported SHACL-C at {v!r}")

    def _shape(self):
        k, v = self.next()
        s = self._iri(k, v)
        self._emit(s, RDF_TYPE, "iri", SH + "NodeShape")
        if self.peek()[0] == "arrow":
            self.next()
            while self.peek()[1] != "{":
                k2, v2 = self.next()
                self._emit(s, SH + "targetClass", "iri", self._iri(k2, v2))
        self.eat("{")
        while self.peek()[1] != "}":
            self._body_line(s)
        self.eat("}")

    def _body_line(self, s: str):
        k, v = self.peek()
        if k == "word" and v in _TARGETS:
            self.next()
            self.eat("=")
            pred = _TARGETS[v]
            while self.peek()[1] != ".":
                kind, value, dt = self._value()
                self._emit(s, pred, kind, value, dt)
            self.eat(".")
            return
        if k == "word" and v in ("closed", "ignoredProperties"):
            self.next()
            self.eat("=")
            kind, value, dt = self._value_or_list()
            self._emit(s, SH + v, kind, value, dt)
            self.eat(".")
            return
        self._property_line(s)

    def _property_line(self, s: str):
        self._bn += 1
        b = f"_:pc{self._bn}"
        self._emit(s, SH + "property", "bnode", b)
        inverse = False
        if self.peek()[1] == "^":
            self.next()
            inverse = True
        k, v = self.next()
        path = self._iri(k, v)
        if inverse:
            self._bn += 1
            pb = f"_:pc{self._bn}"
            self._emit(b, SH + "path", "bnode", pb)
            self._emit(pb, SH + "inversePath", "iri", path)
        else:
            self._emit(b, SH + "path", "iri", path)
        while self.peek()[1] != ".":
            self._property_atom(b)
        self.eat(".")

    def _property_atom(self, b: str):
        k, v = self.peek()
        if k == "card":
            self.next()
            m = re.fullmatch(r"\[\s*(\d+)\s*\.\.\s*(\d+|\*)\s*\]", v)
            lo, hi = m.group(1), m.group(2)
            if int(lo) > 0:
                self._emit(b, SH + "minCount", "literal", lo, XSD + "integer")
            if hi != "*":
                self._emit(b, SH + "maxCount", "literal", hi, XSD + "integer")
            return
        if v == "@":
            self.next()
            k2, v2 = self.next()
            self._emit(b, SH + "node", "iri", self._iri(k2, v2))
            return
        if k == "word" and v in _NODE_KINDS:
            self.next()
            self._emit(b, SH + "nodeKind", "iri", SH + v)
            return
        if k == "word":  # name=value parameter (value or [list])
            self.next()
            self.eat("=")
            kind, value, dt = self._value_or_list()
            self._emit(b, SH + v, kind, value, dt)
            return
        if k in ("iri", "pname"):
            self.next()
            iri = self._iri(k, v)
            # Jena's propertyType rule: xsd-namespace IRIs are datatypes,
            # anything else a class constraint
            pred = "datatype" if iri.startswith(XSD) else "class"
            self._emit(b, SH + pred, "iri", iri)
            return
        raise ShaclcUnsupported(f"unsupported property atom at {v!r}")


def parse_shaclc(text: str) -> list[tuple]:
    """Parse SHACL-C text into (s, p, o_kind, o_value, o_datatype,
    o_lang) triple rows (driver-side, bounded input — shape files)."""
    return _ShaclcParser(text).parse()


def read_shaclc_local(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as fh:
        rows = parse_shaclc(fh.read())
    if not rows:
        return spark.createDataFrame([], TRIPLES_DDL)
    return spark.createDataFrame(rows, TRIPLES_DDL)
