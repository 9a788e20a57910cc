"""Driver-side JSON-LD reader — part of the reference's multi-format
ingestion surface (`util/Models.java:66-95` sniffs JSON-LD among the
formats FileSourceProcessor accepts).

Bounded subset (loudly rejecting the rest): a local ``@context`` with
term → IRI string mappings, prefix definitions, ``@vocab``, and typed
terms ``{"@id": ..., "@type": "@id" | <datatype>}``; node objects with
``@id`` / ``@type`` / nested node objects / arrays; value objects
``{"@value", "@language", "@type"}``; ``@graph`` (flattened);
``@list`` (rdf:first/rest chains). No remote contexts (no network), no
``@reverse``/``@container``/``@nest``/``@included``.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_LANG_STRING, XSD, XSD_STRING

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"

TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)

_ABS = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


class JsonLdUnsupported(ValueError):
    pass


class _Context:
    def __init__(self, ctx):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        if ctx is None:
            return
        if not isinstance(ctx, dict):
            raise JsonLdUnsupported(
                "only a local object @context is supported (no remote/array)"
            )
        for term, spec in ctx.items():
            if term == "@vocab":
                self.vocab = spec
                continue
            if term.startswith("@"):
                raise JsonLdUnsupported(f"@context keyword {term!r}")
            if isinstance(spec, str):
                self.terms[term] = {"@id": spec}
            elif isinstance(spec, dict) and set(spec) <= {"@id", "@type"}:
                self.terms[term] = dict(spec)
            else:
                raise JsonLdUnsupported(f"@context entry {term!r}: {spec!r}")

    def expand_iri(
        self, value: str, for_type: bool = False,
        _seen: frozenset[str] = frozenset(),
    ) -> str:
        if value.startswith("@"):
            raise JsonLdUnsupported(f"unexpected keyword {value!r}")
        if value in self.terms:
            if value in _seen:  # {"a": "a"} or {"a": "b", "b": "a"}
                raise JsonLdUnsupported(
                    f"cyclic @context term definition via {value!r}"
                )
            return self.expand_iri(
                self.terms[value]["@id"], for_type, _seen | {value}
            )
        if ":" in value:
            pfx, local = value.split(":", 1)
            if pfx in self.terms and not local.startswith("//"):
                return self.terms[pfx]["@id"] + local
            if _ABS.match(value):
                return value
        if self.vocab is not None and for_type:
            return self.vocab + value
        if _ABS.match(value):
            return value
        if self.vocab is not None:
            return self.vocab + value
        raise JsonLdUnsupported(f"cannot expand {value!r} (no term/@vocab)")

    def term_type(self, term: str) -> str | None:
        return self.terms.get(term, {}).get("@type")


class _JsonLdParser:
    def __init__(self):
        self.triples: list[tuple] = []
        self._bn = 0

    def _fresh(self) -> str:
        self._bn += 1
        return f"_:j{self._bn}"

    def _emit(self, s, p, kind, value, datatype, lang):
        self.triples.append((s, p, kind, value, datatype, lang))

    def parse(self, doc) -> list[tuple]:
        if isinstance(doc, list):
            for node in doc:
                self.node(node, _Context(None))
            return self.triples
        if not isinstance(doc, dict):
            raise JsonLdUnsupported("top level must be an object or array")
        ctx = _Context(doc.get("@context"))
        if "@graph" in doc:
            items = doc["@graph"]
            if not isinstance(items, list):
                items = [items]
            for node in items:
                self.node(node, ctx)
        else:
            self.node({k: v for k, v in doc.items() if k != "@context"}, ctx)
        return self.triples

    def node(self, obj: dict, ctx: _Context) -> tuple[str, str]:
        """Returns (kind, node id) for a node object."""
        if not isinstance(obj, dict):
            raise JsonLdUnsupported(f"node object expected, got {obj!r}")
        if "@context" in obj:
            ctx = _Context(obj["@context"])
            obj = {k: v for k, v in obj.items() if k != "@context"}
        nid = obj.get("@id")
        if nid is None:
            kind, node = "bnode", self._fresh()
        elif nid.startswith("_:"):
            kind, node = "bnode", nid
        else:
            kind, node = "iri", ctx.expand_iri(nid)
        for key, value in obj.items():
            if key == "@id":
                continue
            if key == "@type":
                for t in value if isinstance(value, list) else [value]:
                    self._emit(node, RDF_TYPE, "iri",
                               ctx.expand_iri(t, for_type=True), None, "")
                continue
            if key.startswith("@"):
                raise JsonLdUnsupported(f"keyword {key!r} not supported")
            p = ctx.expand_iri(key)
            ttype = ctx.term_type(key)
            for v in value if isinstance(value, list) else [value]:
                self.value(node, p, v, ttype, ctx)
        return kind, node

    def value(self, s: str, p: str, v, term_type: str | None, ctx: _Context):
        if isinstance(v, dict) and "@list" in v:
            items = v["@list"]
            if not items:
                self._emit(s, p, "iri", RDF_NS + "nil", None, "")
                return
            heads = [self._fresh() for _ in items]
            self._emit(s, p, "bnode", heads[0], None, "")
            for i, item in enumerate(items):
                self.value(heads[i], RDF_NS + "first", item, term_type, ctx)
                if i + 1 < len(heads):
                    self._emit(heads[i], RDF_NS + "rest", "bnode", heads[i + 1], None, "")
                else:
                    self._emit(heads[i], RDF_NS + "rest", "iri", RDF_NS + "nil", None, "")
            return
        if isinstance(v, dict) and "@value" in v:
            lex = v["@value"]
            lang = v.get("@language", "")
            dt = v.get("@type")
            if isinstance(lex, bool):
                lex, dt = ("true" if lex else "false"), dt or XSD + "boolean"
            elif isinstance(lex, int):
                lex, dt = str(lex), dt or XSD + "integer"
            elif isinstance(lex, float):
                lex, dt = repr(lex), dt or XSD + "double"
            if lang:
                self._emit(s, p, "literal", lex, RDF_LANG_STRING, lang.lower())
            else:
                self._emit(s, p, "literal", lex,
                           ctx.expand_iri(dt) if dt else XSD_STRING, "")
            return
        if isinstance(v, dict):
            okind, onode = self.node(v, ctx)
            self._emit(s, p, okind, onode, None, "")
            return
        if isinstance(v, bool):
            self._emit(s, p, "literal", "true" if v else "false",
                       XSD + "boolean", "")
            return
        if isinstance(v, int):
            self._emit(s, p, "literal", str(v), XSD + "integer", "")
            return
        if isinstance(v, float):
            self._emit(s, p, "literal", repr(v), XSD + "double", "")
            return
        if isinstance(v, str):
            if term_type == "@id":
                if v.startswith("_:"):
                    self._emit(s, p, "bnode", v, None, "")
                else:
                    self._emit(s, p, "iri", ctx.expand_iri(v), None, "")
            elif term_type is not None:
                self._emit(s, p, "literal", v, ctx.expand_iri(term_type), "")
            else:
                self._emit(s, p, "literal", v, XSD_STRING, "")
            return
        raise JsonLdUnsupported(f"value {v!r}")


def parse_jsonld(text: str) -> list[tuple]:
    """Parse JSON-LD text into (s, p, o_kind, o_value, o_datatype, o_lang)
    tuples (driver-side, bounded input)."""
    return _JsonLdParser().parse(json.loads(text))


def read_jsonld_local(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as fh:
        rows = parse_jsonld(fh.read())
    if not rows:
        return spark.createDataFrame([], TRIPLES_DDL)
    return spark.createDataFrame(rows, TRIPLES_DDL)
