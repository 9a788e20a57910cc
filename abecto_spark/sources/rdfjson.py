"""Driver-side RDF/JSON reader — one of the reference sniffer's
languages (`util/Models.java:66-67`, ``Lang.RDFJSON``). RDF/JSON (W3C
note) is the strict triple-centric JSON serialization, distinct from
JSON-LD:

.. code-block:: json

    { "http://example.org/s": {
        "http://example.org/p": [
          { "type": "uri", "value": "http://example.org/o" },
          { "type": "literal", "value": "hi", "lang": "en" } ] } }

Subject keys are IRIs or ``_:label`` blank nodes; each predicate maps to
an array of value objects with ``type`` ∈ {uri, literal, bnode},
``value``, and optional ``datatype``/``lang``. Unsupported shapes raise
``RdfJsonUnsupported`` loudly.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_LANG_STRING, XSD_STRING

TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)


class RdfJsonUnsupported(ValueError):
    pass


def parse_rdfjson(text: str) -> list[tuple]:
    """Parse RDF/JSON text into (s, p, o_kind, o_value, o_datatype,
    o_lang) tuples."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise RdfJsonUnsupported(f"not JSON: {e}") from e
    if not isinstance(doc, dict):
        raise RdfJsonUnsupported("top level must be an object of subjects")
    rows: list[tuple] = []
    for s, preds in doc.items():
        if not isinstance(preds, dict):
            raise RdfJsonUnsupported(f"subject {s!r} must map to an object")
        for p, values in preds.items():
            if not isinstance(values, list):
                raise RdfJsonUnsupported(
                    f"predicate {p!r} must map to an array of value objects"
                )
            for v in values:
                if not isinstance(v, dict) or "type" not in v or "value" not in v:
                    raise RdfJsonUnsupported(
                        f"bad value object under {s!r} {p!r}: {v!r}"
                    )
                kind = v["type"]
                if kind == "uri":
                    rows.append((s, p, "iri", v["value"], None, ""))
                elif kind == "bnode":
                    b = v["value"]
                    rows.append(
                        (s, p, "bnode", b if b.startswith("_:") else f"_:{b}",
                         None, "")
                    )
                elif kind == "literal":
                    lang = v.get("lang", "")
                    dt = v.get("datatype") or (
                        RDF_LANG_STRING if lang else XSD_STRING
                    )
                    rows.append((s, p, "literal", v["value"], dt, lang))
                else:
                    raise RdfJsonUnsupported(f"value type {kind!r}")
    if not rows and doc:
        raise RdfJsonUnsupported("no triples found")
    return rows


def read_rdfjson_local(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8-sig") as fh:
        rows = parse_rdfjson(fh.read())
    if not rows:
        return spark.createDataFrame([], TRIPLES_DDL)
    return spark.createDataFrame(rows, TRIPLES_DDL)
