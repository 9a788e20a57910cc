"""Driver-side RDF-Thrift (Jena "RDF Binary") reader/writer — the last
language of the reference sniffer (`util/Models.java:66-67`,
``Lang.RDFTHRIFT``) that previously only raised a conversion error.

The wire format is public knowledge twice over:

* the **Thrift Compact Protocol** (Apache Thrift
  ``doc/specs/thrift-compact-protocol.md``): structs are sequences of
  field headers ``(delta << 4) | compact-type`` (field-id delta 1–15;
  delta 0 ⇒ zigzag-varint field id follows), terminated by a 0x00 stop
  byte; strings are varint-length + UTF-8; i16/i32/i64 are
  zigzag varints; doubles are 8 little-endian bytes; booleans ride in
  the type nibble.
* **Jena's ``BinaryRDF.thrift`` schema**: a stream is back-to-back
  ``RDF_StreamRow`` unions (1: RDF_PrefixDecl, 2: RDF_Triple,
  3: RDF_Quad) with no extra framing; ``RDF_Term`` is a union of
  1: RDF_IRI{1: iri}, 2: RDF_BNode{1: label},
  3: RDF_Literal{1: lex, 2: langtag, 3: datatype, 4: dtPrefix},
  4: RDF_PrefixName{1: prefix, 2: localName}, 5–9: pattern/RDF-star
  terms (rejected loudly here), 10: i64 valInteger, 11: double
  valDouble, 12: RDF_Decimal{1: i64 value, 2: i32 scale}.

The decoder is schema-driven but *skip-tolerant*: unknown field ids are
skipped by type (forward compatibility, as thrift requires), while an
``RDF_Term`` variant outside the subset above raises
``RdfThriftUnsupported`` loudly. Like the other driver-side parsers
(Turtle/TriG/RDF-XML/JSON-LD/TriX/RDF-JSON), this is the
plan/config/fixture path; bulk cluster ingestion stays on the
distributed N-Triples reader (sources/rdf.py).
"""

from __future__ import annotations

import struct as _struct
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_LANG_STRING, XSD, XSD_STRING

QUADS_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string, graph string"
)

XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_DECIMAL = XSD + "decimal"

# thrift compact-type codes
_T_BOOL_TRUE, _T_BOOL_FALSE, _T_I8, _T_I16, _T_I32, _T_I64 = 1, 2, 3, 4, 5, 6
_T_DOUBLE, _T_STRING, _T_LIST, _T_SET, _T_MAP, _T_STRUCT = 7, 8, 9, 10, 11, 12


class RdfThriftUnsupported(ValueError):
    pass


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def _byte(self) -> int:
        if self.pos >= len(self.buf):
            raise RdfThriftUnsupported("truncated thrift stream")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def _varint(self) -> int:
        out = shift = 0
        while True:
            b = self._byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise RdfThriftUnsupported("varint too long")

    def _zigzag(self) -> int:
        n = self._varint()
        return (n >> 1) ^ -(n & 1)

    def _string(self) -> str:
        ln = self._varint()
        if self.pos + ln > len(self.buf):
            raise RdfThriftUnsupported("truncated string")
        s = self.buf[self.pos : self.pos + ln].decode("utf-8")
        self.pos += ln
        return s

    def _value(self, ctype: int):
        if ctype in (_T_BOOL_TRUE, _T_BOOL_FALSE):
            return ctype == _T_BOOL_TRUE
        if ctype == _T_I8:
            b = self._byte()
            return b - 256 if b >= 128 else b
        if ctype in (_T_I16, _T_I32, _T_I64):
            return self._zigzag()
        if ctype == _T_DOUBLE:
            if self.pos + 8 > len(self.buf):
                raise RdfThriftUnsupported("truncated double")
            v = _struct.unpack("<d", self.buf[self.pos : self.pos + 8])[0]
            self.pos += 8
            return v
        if ctype == _T_STRING:
            return self._string()
        if ctype == _T_STRUCT:
            return self.read_struct()
        if ctype in (_T_LIST, _T_SET):
            head = self._byte()
            size, etype = head >> 4, head & 0x0F
            if size == 15:
                size = self._varint()
            return [self._value(etype) for _ in range(size)]
        if ctype == _T_MAP:
            size = self._varint()
            if size == 0:
                return {}
            kv = self._byte()
            kt, vt = kv >> 4, kv & 0x0F
            return {self._value(kt): self._value(vt) for _ in range(size)}
        raise RdfThriftUnsupported(f"thrift compact type {ctype}")

    def read_struct(self) -> dict[int, tuple[int, object]]:
        """One struct as {field_id: (compact_type, value)}."""
        fields: dict[int, tuple[int, object]] = {}
        last = 0
        while True:
            head = self._byte()
            if head == 0:
                return fields
            ctype = head & 0x0F
            delta = head >> 4
            fid = last + delta if delta else self._zigzag()
            last = fid
            fields[fid] = (ctype, self._value(ctype))


def _sole(fields: dict, what: str) -> tuple[int, int, object]:
    if len(fields) != 1:
        raise RdfThriftUnsupported(
            f"{what} union must set exactly one field, got {sorted(fields)}"
        )
    fid, (ctype, val) = next(iter(fields.items()))
    return fid, ctype, val


def _req_str(fields: dict, fid: int, what: str) -> str:
    if fid not in fields or fields[fid][0] != _T_STRING:
        raise RdfThriftUnsupported(f"{what}: missing string field {fid}")
    return fields[fid][1]


def _opt_str(fields: dict, fid: int) -> str | None:
    got = fields.get(fid)
    return got[1] if got and got[0] == _T_STRING else None


def _resolve_prefixed(fields: dict, prefixes: dict[str, str]) -> str:
    pfx = _req_str(fields, 1, "RDF_PrefixName")
    local = _req_str(fields, 2, "RDF_PrefixName")
    if pfx not in prefixes:
        raise RdfThriftUnsupported(f"undeclared prefix {pfx!r} in stream")
    return prefixes[pfx] + local


def _decimal_lex(value: int, scale: int) -> str:
    return str(Decimal(value).scaleb(-scale))


def _term(fields: dict, prefixes: dict[str, str], pos: str) -> tuple:
    """RDF_Term union → (kind, value, datatype, lang)."""
    fid, ctype, val = _sole(fields, "RDF_Term")
    if fid == 1:  # RDF_IRI
        return ("iri", _req_str(val, 1, "RDF_IRI"), None, "")
    if fid == 2:  # RDF_BNode
        label = _req_str(val, 1, "RDF_BNode")
        return ("bnode", label if label.startswith("_:") else f"_:{label}",
                None, "")
    if fid == 3:  # RDF_Literal
        lex = _req_str(val, 1, "RDF_Literal")
        lang = _opt_str(val, 2) or ""
        dt = _opt_str(val, 3)
        if 4 in val and val[4][0] == _T_STRUCT:  # dtPrefix
            dt = _resolve_prefixed(val[4][1], prefixes)
        if lang:
            return ("literal", lex, RDF_LANG_STRING, lang)
        return ("literal", lex, dt or XSD_STRING, "")
    if fid == 4:  # RDF_PrefixName → IRI
        return ("iri", _resolve_prefixed(val, prefixes), None, "")
    if fid == 10 and ctype == _T_I64:  # valInteger
        return ("literal", str(val), XSD_INTEGER, "")
    if fid == 11 and ctype == _T_DOUBLE:  # valDouble
        return ("literal", repr(val), XSD_DOUBLE, "")
    if fid == 12:  # valDecimal
        if 1 not in val or 2 not in val:
            raise RdfThriftUnsupported("RDF_Decimal needs value and scale")
        return ("literal", _decimal_lex(val[1][1], val[2][1]), XSD_DECIMAL, "")
    raise RdfThriftUnsupported(
        f"RDF_Term variant {fid} (pattern/RDF-star terms) in {pos} position"
    )


def _node(fields: dict, prefixes: dict[str, str], pos: str) -> str:
    kind, value, _dt, _lang = _term(fields, prefixes, pos)
    if kind == "literal":
        raise RdfThriftUnsupported(f"literal in {pos} position")
    return value


def parse_rdfthrift(buf: bytes) -> list[tuple]:
    """Parse an RDF-Thrift byte stream into
    (s, p, o_kind, o_value, o_datatype, o_lang, graph) tuples."""
    rd = _Reader(buf)
    prefixes: dict[str, str] = {}
    rows: list[tuple] = []
    while not rd.eof():
        row = rd.read_struct()
        fid, ctype, val = _sole(row, "RDF_StreamRow")
        if ctype != _T_STRUCT:
            raise RdfThriftUnsupported(f"RDF_StreamRow field {fid} not a struct")
        if fid == 1:  # RDF_PrefixDecl
            prefixes[_req_str(val, 1, "RDF_PrefixDecl")] = _req_str(
                val, 2, "RDF_PrefixDecl"
            )
            continue
        if fid in (2, 3):  # RDF_Triple / RDF_Quad
            for need in (1, 2, 3):
                if need not in val or val[need][0] != _T_STRUCT:
                    raise RdfThriftUnsupported("triple/quad missing S/P/O")
            s = _node(val[1][1], prefixes, "subject")
            p_kind, p_val, _, _ = _term(val[2][1], prefixes, "predicate")
            if p_kind != "iri":
                raise RdfThriftUnsupported("predicate must be an IRI")
            o_kind, o_value, o_dt, o_lang = _term(val[3][1], prefixes, "object")
            graph = None
            if fid == 3 and 4 in val and val[4][0] == _T_STRUCT:
                graph = _node(val[4][1], prefixes, "graph")
            rows.append((s, p_val, o_kind, o_value, o_dt, o_lang, graph))
            continue
        raise RdfThriftUnsupported(f"RDF_StreamRow variant {fid}")
    return rows


def read_rdfthrift_local(spark: SparkSession, path: str) -> DataFrame:
    with open(path, "rb") as fh:
        rows = parse_rdfthrift(fh.read())
    if not rows:
        return spark.createDataFrame([], QUADS_DDL)
    return spark.createDataFrame(rows, QUADS_DDL)


# ---------------------------------------------------------------------------
# writer (round-trip tests + the export CLI's quad formats)


class _Writer:
    def __init__(self):
        self.buf = bytearray()

    def _varint(self, n: int) -> None:
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                self.buf.append(b | 0x80)
            else:
                self.buf.append(b)
                return

    def _zigzag(self, n: int) -> None:
        self._varint((n << 1) ^ (n >> 63))

    def string(self, s: str) -> None:
        raw = s.encode("utf-8")
        self._varint(len(raw))
        self.buf += raw

    def field(self, fid: int, ctype: int, last: int) -> int:
        delta = fid - last
        if 1 <= delta <= 15:
            self.buf.append((delta << 4) | ctype)
        else:
            self.buf.append(ctype)
            self._zigzag(fid)
        return fid

    def stop(self) -> None:
        self.buf.append(0)


def _w_string_struct(w: _Writer, *items: tuple[int, str]) -> None:
    last = 0
    for fid, s in items:
        last = w.field(fid, _T_STRING, last)
        w.string(s)
    w.stop()


def _w_term(w: _Writer, kind: str, value: str, dt: str | None, lang: str) -> None:
    last = 0
    if kind == "iri":
        last = w.field(1, _T_STRUCT, last)
        _w_string_struct(w, (1, value))
    elif kind == "bnode":
        last = w.field(2, _T_STRUCT, last)
        _w_string_struct(w, (1, value[2:] if value.startswith("_:") else value))
    elif kind == "literal":
        last = w.field(3, _T_STRUCT, last)
        if lang:
            _w_string_struct(w, (1, value), (2, lang))
        elif dt and dt != XSD_STRING:
            _w_string_struct(w, (1, value), (3, dt))
        else:  # simple string: datatype omitted, like Jena's writer
            _w_string_struct(w, (1, value))
    else:
        raise RdfThriftUnsupported(f"cannot write term kind {kind!r}")
    w.stop()


def write_rdfthrift(rows) -> bytes:
    """(s, p, o_kind, o_value, o_datatype, o_lang[, graph]) tuples →
    RDF-Thrift bytes (RDF_Triple rows; RDF_Quad when a graph is set)."""
    w = _Writer()
    for row in rows:
        s, p, o_kind, o_value, o_dt, o_lang = row[:6]
        graph = row[6] if len(row) > 6 else None
        w.field(3 if graph else 2, _T_STRUCT, 0)  # RDF_StreamRow variant
        last = 0
        s_kind = "bnode" if s.startswith("_:") else "iri"
        last = w.field(1, _T_STRUCT, last)
        _w_term(w, s_kind, s, None, "")
        last = w.field(2, _T_STRUCT, last)
        _w_term(w, "iri", p, None, "")
        last = w.field(3, _T_STRUCT, last)
        _w_term(w, o_kind, o_value, o_dt, o_lang or "")
        if graph:
            g_kind = "bnode" if graph.startswith("_:") else "iri"
            last = w.field(4, _T_STRUCT, last)
            _w_term(w, g_kind, graph, None, "")
        w.stop()  # triple/quad struct
        w.stop()  # stream-row union
    return bytes(w.buf)
