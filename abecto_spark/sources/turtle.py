"""Driver-side Turtle reader for small fixture/config files — the subset
the reference's own tutorial sources use (`tutorial-source*.ttl`;
multi-format loading `util/Models.java:66-95`, FileSourceProcessor
`processor/FileSourceProcessor.java:31-55`).

Turtle is not line-splittable, so it is NOT a cluster ingestion path
(that is read_ntriples, sources/rdf.py); this parser exists so the
reference's fixtures and plan files load directly instead of being
re-typed by hand. It is deliberately bounded: prefixes (@prefix and
SPARQL-style PREFIX), ``;``/``,`` predicate-object lists, ``a``, IRIs,
prefixed names (including an empty prefix ``:local``), blank nodes,
string literals with ``@lang`` / ``^^datatype``, numeric and boolean
shorthand. Blank-node property lists ``[...]``, collections ``(...)``,
and multiline strings raise ``TurtleUnsupported``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_LANG_STRING, XSD, XSD_STRING

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)


class TurtleUnsupported(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    \s+|\#[^\n]*
  | (?P<iri><[^<>\s]*>)
  | (?P<bnode>_:[A-Za-z0-9_.-]+)
  | (?P<str>"""
    + r'"""(?:[^"\\]|\\.|"(?!""))*"""'
    + r"""|"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtsep>\^\^)
  | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<pname>(?:[A-Za-z_][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_][A-Za-z0-9_.-]*)?)
  | (?P<punct>[;,.\[\]()])
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


def _tokenize(text: str):
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise TurtleUnsupported(f"cannot tokenize at: {text[pos:pos+30]!r}")
        pos = m.end()
        if m.lastgroup:
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _unquote(v: str) -> str:
    body = v[3:-3] if v.startswith(('"""', "'''")) else v[1:-1]
    out, i = [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt in ("u", "U"):
                width = 4 if nxt == "u" else 8
                out.append(chr(int(body[i + 2 : i + 2 + width], 16)))
                i += 2 + width
                continue
        out.append(ch)
        i += 1
    return "".join(out)


class _TurtleParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple] = []

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val and v.lower() != val.lower():
            raise TurtleUnsupported(f"expected {val!r}, got {v!r}")

    def parse(self):
        while True:
            k, v = self.peek()
            if k == "eof":
                return self.triples
            if k == "langtag" and v.lower() in ("@prefix", "@base"):
                self.next()
                if v.lower() == "@base":
                    raise TurtleUnsupported("@base not supported")
                self._prefix_decl(dot=True)
            elif k == "word" and v.upper() in ("PREFIX", "BASE"):
                self.next()
                if v.upper() == "BASE":
                    raise TurtleUnsupported("BASE not supported")
                self._prefix_decl(dot=False)
            else:
                self._statement()

    def _prefix_decl(self, dot: bool):
        k, pname = self.next()
        if k != "pname" or not pname.endswith(":"):
            raise TurtleUnsupported(f"bad prefix name {pname!r}")
        k2, iri = self.next()
        if k2 != "iri":
            raise TurtleUnsupported("prefix IRI expected")
        self.prefixes[pname[:-1]] = iri[1:-1]
        if dot:
            self.expect(".")

    def _statement(self):
        s_kind, s = self._subject()
        while True:
            p = self._predicate()
            while True:
                self._object(s, p)
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
                if self.peek()[1] in (".",):
                    break
                if self.peek()[0] == "eof":
                    break
                if self.peek()[1] == ";":
                    continue
                continue
            break
        self.expect(".")

    def _resolve(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise TurtleUnsupported(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _subject(self):
        k, v = self.next()
        if k == "iri":
            return "iri", v[1:-1]
        if k == "pname":
            return "iri", self._resolve(v)
        if k == "bnode":
            return "bnode", v
        raise TurtleUnsupported(f"bad subject {v!r}")

    def _predicate(self) -> str:
        k, v = self.next()
        if k == "iri":
            return v[1:-1]
        if k == "pname":
            return self._resolve(v)
        if k == "word" and v == "a":
            return RDF_TYPE
        raise TurtleUnsupported(f"bad predicate {v!r}")

    def _object(self, s: str, p: str):
        k, v = self.next()
        if k == "iri":
            self.triples.append((s, p, "iri", v[1:-1], None, ""))
        elif k == "pname":
            self.triples.append((s, p, "iri", self._resolve(v), None, ""))
        elif k == "bnode":
            self.triples.append((s, p, "bnode", v, None, ""))
        elif k == "str":
            lex = _unquote(v)
            nk, nv = self.peek()
            if nk == "langtag":
                self.next()
                self.triples.append((s, p, "literal", lex, RDF_LANG_STRING, nv[1:].lower()))
            elif nk == "dtsep":
                self.next()
                dk, dv = self.next()
                dt = dv[1:-1] if dk == "iri" else self._resolve(dv)
                self.triples.append((s, p, "literal", lex, dt, ""))
            else:
                self.triples.append((s, p, "literal", lex, XSD_STRING, ""))
        elif k == "num":
            if re.fullmatch(r"[+-]?\d+", v):
                dt = XSD + "integer"
            elif "e" in v.lower():
                dt = XSD + "double"
            else:
                dt = XSD + "decimal"
            self.triples.append((s, p, "literal", v, dt, ""))
        elif k == "word" and v in ("true", "false"):
            self.triples.append((s, p, "literal", v, XSD + "boolean", ""))
        elif v in ("[", "("):
            raise TurtleUnsupported(
                "blank-node property lists / collections not supported"
            )
        else:
            raise TurtleUnsupported(f"bad object {v!r}")


def parse_turtle(text: str) -> list[tuple]:
    """Parse Turtle text into (s, p, o_kind, o_value, o_datatype, o_lang)
    tuples (driver-side, bounded input)."""
    return _TurtleParser(text).parse()


def read_turtle_local(spark: SparkSession, path: str) -> DataFrame:
    """Load one local Turtle file into the triples DataFrame. For big
    line-oriented data use read_ntriples instead (distributed)."""
    with open(path, encoding="utf-8") as fh:
        rows = parse_turtle(fh.read())
    if not rows:
        return spark.createDataFrame([], TRIPLES_DDL)
    return spark.createDataFrame(rows, TRIPLES_DDL)
