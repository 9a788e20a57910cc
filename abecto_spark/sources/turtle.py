"""Driver-side Turtle/TriG reader for fixture, plan-configuration and
metadata files — the formats the reference's own entry point consumes
(`Abecto.java:152-155` loads the plan dataset with Jena RIOT;
multi-format loading `util/Models.java:66-95`, FileSourceProcessor
`processor/FileSourceProcessor.java:31-55`).

Turtle/TriG is not line-splittable, so this is NOT a cluster ingestion
path (that is read_ntriples, sources/rdf.py); this parser exists so the
reference's fixtures, plan files (`tutorial-configuration.trig`) and
annotation graphs load directly instead of being re-typed by hand.

Supported: prefixes (@prefix / PREFIX), @base / BASE with relative-IRI
resolution, ``;``/``,`` predicate-object lists, ``a``, IRIs, prefixed
names (incl. empty prefix ``:local``), labelled and anonymous blank
nodes, blank-node property lists ``[ ... ]`` (as subject and object),
collections ``( ... )`` (rdf:first/rest/nil), string literals (single-,
double-, and triple-quoted) with ``@lang`` / ``^^datatype``, numeric and
boolean shorthand, and TriG named-graph blocks (``GRAPH <g> { ... }``,
``<g> { ... }``, ``{ ... }``). Everything else raises
``TurtleUnsupported`` loudly.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_LANG_STRING, XSD, XSD_STRING

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"

TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)
QUADS_DDL = "graph string, " + TRIPLES_DDL


class TurtleUnsupported(ValueError):
    pass


# pname local parts may contain '.' but not end with one (Turtle PN_LOCAL),
# so `ex:o.` (statement dot glued to the name) tokenizes as name + '.'.
_TOKEN = re.compile(
    r"""
    \s+|\#[^\n]*
  | (?P<iri><[^<>\s]*>)
  | (?P<bnode>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<str>"""
    + r'"""(?:[^"\\]|\\.|"(?!""))*"""'
    + r"|'''(?:[^'\\]|\\.|'(?!''))*'''"
    + r"""|"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtsep>\^\^)
  | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<pname>(?:[A-Za-z_][A-Za-z0-9_.-]*?)?:(?:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?)
  | (?P<punct>[;,.\[\](){}])
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


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


class _TrigParser:
    """Recursive-descent Turtle/TriG parser emitting
    (graph, s, p, o_kind, o_value, o_datatype, o_lang) quads;
    graph == "" is the default graph."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.quads: list[tuple] = []
        self.graph = ""
        self._bnode_n = 0

    # -- token plumbing ------------------------------------------------
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

    def _fresh_bnode(self) -> str:
        self._bnode_n += 1
        return f"_:anon{self._bnode_n}"

    # -- IRIs ------------------------------------------------------------
    def _iri(self, raw: str) -> str:
        """Resolve an <...> IRI reference against @base (RFC 3986 merge)."""
        ref = raw[1:-1]
        if _SCHEME.match(ref) or self.base is None:
            return ref  # absolute, or relative with no base: keep verbatim
        return urljoin(self.base, ref)

    def _resolve(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise TurtleUnsupported(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    # -- top level -------------------------------------------------------
    def parse(self):
        while True:
            k, v = self.peek()
            if k == "eof":
                return self.quads
            if k == "langtag" and v.lower() in ("@prefix", "@base"):
                self.next()
                self._directive(v.lower()[1:], dot=True)
            elif k == "word" and v.upper() in ("PREFIX", "BASE"):
                self.next()
                self._directive(v.upper().lower(), dot=False)
            elif k == "word" and v.upper() == "GRAPH":
                self.next()
                name = self._graph_name()
                self._graph_block(name)
            elif v == "{":
                self._graph_block("")
            else:
                # `<g> { ... }` TriG shorthand vs a plain triples statement:
                # look ahead one token after a single term.
                if k in ("iri", "pname", "bnode") and self.toks[self.i + 1][1] == "{":
                    name = self._graph_name()
                    self._graph_block(name)
                else:
                    self._statement(allow_graph_label=True)
                    self.expect(".")

    def _directive(self, kind: str, dot: bool):
        if kind == "base":
            k, iri = self.next()
            if k != "iri":
                raise TurtleUnsupported("BASE IRI expected")
            self.base = (
                self._iri(iri) if self.base is not None else iri[1:-1]
            )
        else:
            k, pname = self.next()
            if k != "pname" or not pname.endswith(":"):
                raise TurtleUnsupported(f"bad prefix name {pname!r}")
            k2, iri = self.next()
            if k2 != "iri":
                raise TurtleUnsupported("prefix IRI expected")
            self.prefixes[pname[:-1]] = self._iri(iri)
        if dot:
            self.expect(".")

    def _graph_name(self) -> str:
        k, v = self.next()
        if k == "iri":
            return self._iri(v)
        if k == "pname":
            return self._resolve(v)
        if k == "bnode":
            return v
        raise TurtleUnsupported(f"bad graph name {v!r}")

    def _graph_block(self, name: str):
        prev, self.graph = self.graph, name
        self.expect("{")
        while self.peek()[1] != "}":
            self._statement()
            if self.peek()[1] == ".":
                self.next()
            elif self.peek()[1] != "}":
                raise TurtleUnsupported(
                    f"expected '.' or '}}' in graph block, got {self.peek()[1]!r}"
                )
        self.expect("}")
        self.graph = prev

    # -- triples ----------------------------------------------------------
    def _statement(self, allow_graph_label: bool = False):
        start = len(self.quads)
        k, v = self.peek()
        if v == "[":
            s = self._bnode_property_list()
            # a bare `[ ... ] .` statement (no trailing predicates) is legal
            if self.peek()[1] not in (".", "}"):
                self._predicate_object_list(s)
        elif v == "(":
            s = self._collection()
            self._predicate_object_list(s)
        else:
            s = self._subject()
            self._predicate_object_list(s)
        # N-Quads-style trailing graph label (`<s> <p> <o> <g> .`): in
        # plain Turtle an IRI/pname/bnode here is a syntax error, so
        # consuming it as the statement's graph is unambiguous.  Only at
        # top level (never inside a TriG graph block).
        if allow_graph_label and self.peek()[0] in ("iri", "pname", "bnode"):
            g = self._graph_name()
            self.quads[start:] = [(g,) + q[1:] for q in self.quads[start:]]

    def _subject(self) -> str:
        k, v = self.next()
        if k == "iri":
            return self._iri(v)
        if k == "pname":
            return self._resolve(v)
        if k == "bnode":
            return v
        raise TurtleUnsupported(f"bad subject {v!r}")

    def _predicate(self) -> str:
        k, v = self.next()
        if k == "iri":
            return self._iri(v)
        if k == "pname":
            return self._resolve(v)
        if k == "word" and v == "a":
            return RDF_TYPE
        raise TurtleUnsupported(f"bad predicate {v!r}")

    def _predicate_object_list(self, s: str):
        while True:
            p = self._predicate()
            while True:
                self._object(s, p)
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                while self.peek()[1] == ";":
                    self.next()
                if self.peek()[1] in (".", "}", "]") or self.peek()[0] == "eof":
                    break
                continue
            break

    def _bnode_property_list(self) -> str:
        """`[ p o ; ... ]` — returns the fresh blank node label."""
        self.expect("[")
        node = self._fresh_bnode()
        if self.peek()[1] != "]":
            self._predicate_object_list(node)
        self.expect("]")
        return node

    def _collection(self) -> str:
        """`( o1 o2 ... )` — rdf:first/rdf:rest chain; `()` is rdf:nil."""
        self.expect("(")
        items: list[str] = []
        while self.peek()[1] != ")":
            head = self._fresh_bnode()
            items.append(head)
            self._object(head, RDF_NS + "first")
        self.expect(")")
        if not items:
            return RDF_NS + "nil"
        for cur, nxt in zip(items, items[1:]):
            self._emit(cur, RDF_NS + "rest", "bnode", nxt, None, "")
        self._emit(items[-1], RDF_NS + "rest", "iri", RDF_NS + "nil", None, "")
        return items[0]

    def _emit(self, s, p, kind, value, datatype, lang):
        self.quads.append((self.graph, s, p, kind, value, datatype, lang))

    def _object(self, s: str, p: str):
        k, v = self.next()
        if k == "iri":
            self._emit(s, p, "iri", self._iri(v), None, "")
        elif k == "pname":
            self._emit(s, p, "iri", self._resolve(v), None, "")
        elif k == "bnode":
            self._emit(s, p, "bnode", v, None, "")
        elif k == "str":
            lex = _unquote(v)
            nk, nv = self.peek()
            if nk == "langtag":
                self.next()
                self._emit(s, p, "literal", lex, RDF_LANG_STRING, nv[1:].lower())
            elif nk == "dtsep":
                self.next()
                dk, dv = self.next()
                dt = self._iri(dv) if dk == "iri" else self._resolve(dv)
                self._emit(s, p, "literal", lex, dt, "")
            else:
                self._emit(s, p, "literal", lex, XSD_STRING, "")
        elif k == "num":
            if re.fullmatch(r"[+-]?\d+", v):
                dt = XSD + "integer"
            elif "e" in v.lower():
                dt = XSD + "double"
            else:
                dt = XSD + "decimal"
            self._emit(s, p, "literal", v, dt, "")
        elif k == "word" and v in ("true", "false"):
            self._emit(s, p, "literal", v, XSD + "boolean", "")
        elif v == "[":
            self.i -= 1
            node = self._bnode_property_list()
            self._emit(s, p, "bnode", node, None, "")
        elif v == "(":
            self.i -= 1
            node = self._collection()
            kind = "iri" if node == RDF_NS + "nil" else "bnode"
            self._emit(s, p, kind, node, None, "")
        else:
            raise TurtleUnsupported(f"bad object {v!r}")


def parse_trig(text: str) -> list[tuple]:
    """Parse Turtle/TriG text into (graph, s, p, o_kind, o_value,
    o_datatype, o_lang) quads; graph == '' is the default graph.
    Driver-side, bounded input (plan/config/fixture files)."""
    return _TrigParser(text).parse()


def parse_turtle(text: str) -> list[tuple]:
    """Parse Turtle text into (s, p, o_kind, o_value, o_datatype, o_lang)
    tuples (driver-side, bounded input). Named-graph content, if present,
    is flattened into the result."""
    return [q[1:] for q in parse_trig(text)]


def read_turtle_local(spark: SparkSession, path: str) -> DataFrame:
    """Load one local Turtle file into the triples DataFrame. For big
    line-oriented data use read_ntriples instead (distributed)."""
    with open(path, encoding="utf-8") as fh:
        rows = parse_turtle(fh.read())
    if not rows:
        return spark.createDataFrame([], TRIPLES_DDL)
    return spark.createDataFrame(rows, TRIPLES_DDL)


def read_trig_local(spark: SparkSession, path: str) -> DataFrame:
    """Load one local TriG file into a quads DataFrame (graph column,
    '' = default graph)."""
    with open(path, encoding="utf-8") as fh:
        rows = parse_trig(fh.read())
    if not rows:
        return spark.createDataFrame([], QUADS_DDL)
    return spark.createDataFrame(rows, QUADS_DDL)
