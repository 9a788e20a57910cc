"""RDF-Thrift (Jena RDF Binary) reader/writer: thrift compact-protocol
round-trips, in-stream prefix declarations, value-term variants, skip
tolerance, and the formats.py dispatch (`Models.java:66-67` parity)."""

from __future__ import annotations

import pytest

from abecto_spark.model import RDF_LANG_STRING, XSD, XSD_STRING
from abecto_spark.sources.rdfthrift import (
    RdfThriftUnsupported,
    _T_DOUBLE,
    _T_I32,
    _T_I64,
    _T_STRUCT,
    _Writer,
    _w_string_struct,
    parse_rdfthrift,
    write_rdfthrift,
)

EX = "http://example.org/"


def test_roundtrip_triples_and_quads():
    rows = [
        (EX + "s", EX + "p", "iri", EX + "o", None, "", None),
        ("_:b0", EX + "p", "bnode", "_:b1", None, "", None),
        (EX + "s", EX + "label", "literal", "héllo ☃", XSD_STRING, "", None),
        (EX + "s", EX + "label", "literal", "hi", RDF_LANG_STRING, "en",
         None),
        (EX + "s", EX + "age", "literal", "42", XSD + "integer", "", None),
        (EX + "s", EX + "p", "iri", EX + "o2", None, "", EX + "g1"),
    ]
    got = parse_rdfthrift(write_rdfthrift(rows))
    assert got == rows
    # a long string forces multi-byte varint lengths
    long_row = [(EX + "s", EX + "p", "literal", "x" * 5000, XSD_STRING, "",
                 None)]
    assert parse_rdfthrift(write_rdfthrift(long_row)) == long_row


def test_prefix_decl_and_prefix_name():
    w = _Writer()
    # RDF_StreamRow field 1: RDF_PrefixDecl {1: "ex", 2: EX}
    w.field(1, _T_STRUCT, 0)
    _w_string_struct(w, (1, "ex"), (2, EX))
    w.stop()
    # RDF_StreamRow field 2: triple with prefixName subject/predicate
    w.field(2, _T_STRUCT, 0)
    last = 0
    for pos in (1, 2):
        last = w.field(pos, _T_STRUCT, last)
        w.field(4, _T_STRUCT, 0)  # RDF_Term variant 4: RDF_PrefixName
        _w_string_struct(w, (1, "ex"), (2, "s" if pos == 1 else "p"))
        w.stop()
    last = w.field(3, _T_STRUCT, last)
    w.field(1, _T_STRUCT, 0)  # RDF_Term variant 1: RDF_IRI
    _w_string_struct(w, (1, EX + "o"))
    w.stop()
    w.stop()  # triple
    w.stop()  # stream row
    assert parse_rdfthrift(bytes(w.buf)) == [
        (EX + "s", EX + "p", "iri", EX + "o", None, "", None)
    ]
    # undeclared prefix is loud
    assert "undeclared prefix" in _err(bytes(w.buf)[len(_decl_bytes()):])


def _decl_bytes() -> bytes:
    w = _Writer()
    w.field(1, _T_STRUCT, 0)
    _w_string_struct(w, (1, "ex"), (2, EX))
    w.stop()
    return bytes(w.buf)


def _err(buf: bytes) -> str:
    with pytest.raises(RdfThriftUnsupported) as e:
        parse_rdfthrift(buf)
    return str(e.value)


def _term_triple(emit_object) -> bytes:
    """A triple <s> <p> X with the object written by ``emit_object``."""
    w = _Writer()
    w.field(2, _T_STRUCT, 0)
    last = 0
    for pos, iri in ((1, EX + "s"), (2, EX + "p")):
        last = w.field(pos, _T_STRUCT, last)
        w.field(1, _T_STRUCT, 0)
        _w_string_struct(w, (1, iri))
        w.stop()
    last = w.field(3, _T_STRUCT, last)
    emit_object(w)
    w.stop()
    w.stop()
    return bytes(w.buf)


def test_value_term_variants():
    def val_integer(w):
        w.field(10, _T_I64, 0)
        w._zigzag(-7)
        w.stop()

    def val_double(w):
        w.field(11, _T_DOUBLE, 0)
        import struct as s

        w.buf += s.pack("<d", 2.5)
        w.stop()

    def val_decimal(w):
        w.field(12, _T_STRUCT, 0)
        last = 0
        last = w.field(1, _T_I64, last)
        w._zigzag(12345)
        last = w.field(2, _T_I32, last)
        w._zigzag(2)
        w.stop()
        w.stop()

    assert parse_rdfthrift(_term_triple(val_integer))[0][3:6] == (
        "-7", XSD + "integer", "")
    assert parse_rdfthrift(_term_triple(val_double))[0][3:6] == (
        "2.5", XSD + "double", "")
    assert parse_rdfthrift(_term_triple(val_decimal))[0][3:6] == (
        "123.45", XSD + "decimal", "")


def test_unknown_field_skipped_and_exotic_terms_loud():
    # literal with an extra unknown string field (id 9) — skipped
    def literal_extra(w):
        w.field(3, _T_STRUCT, 0)
        last = 0
        last = w.field(1, 8, last)
        w.string("v")
        last = w.field(9, 8, last)
        w.string("future-field")
        w.stop()
        w.stop()

    assert parse_rdfthrift(_term_triple(literal_extra))[0][3:6] == (
        "v", XSD_STRING, "")

    # RDF_Term variant 6 (RDF_ANY) is a pattern term — loud
    def any_term(w):
        w.field(6, _T_STRUCT, 0)
        w.stop()  # empty ANY struct
        w.stop()

    assert "variant 6" in _err(_term_triple(any_term))


def test_formats_dispatch(spark, tmp_path):
    from abecto_spark.sources.formats import read_rdf_local, sniff_format

    rows = [
        (EX + "s", EX + "p", "iri", EX + "o", None, "", None),
        (EX + "s", EX + "n", "literal", "1", XSD + "integer", "", None),
    ]
    path = tmp_path / "data.trdf"
    path.write_bytes(write_rdfthrift(rows))
    assert sniff_format(str(path)) == "rdfthrift"
    got = read_rdf_local(spark, str(path))
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        r[:6] for r in rows
    )
