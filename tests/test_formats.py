"""Multi-format RDF ingestion (`util/Models.java:66-95` analog): RDF/XML
(verified against the reference's bundled 42k-line OM-2 ontology,
`Abecto.java:246-249`), JSON-LD subset, format sniffing, and blank-node
property-list Turtle feeding the WrongValue metadata channel verbatim
(`Metadata.java:47-112`)."""

from __future__ import annotations

import os

import pytest

from abecto_spark.sources.formats import read_rdf_local, sniff_format
from abecto_spark.sources.jsonld import JsonLdUnsupported, parse_jsonld
from abecto_spark.sources.rdfxml import RdfXmlUnsupported, parse_rdfxml

OM = ("/root/reference/abecto-core/src/main/resources/de/uni_jena/cs/fusion/"
      "abecto/vocabulary/om-2.0.rdf")
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


# ---------------------------------------------------------------------------
# RDF/XML


@pytest.mark.skipif(not os.path.isfile(OM), reason="reference OM-2 not available")
def test_rdfxml_parses_reference_om2_ontology():
    rows = parse_rdfxml(open(OM, encoding="utf-8-sig").read())
    assert len(rows) == 30340  # full-file regression pin
    om = "http://www.ontology-of-units-of-measure.org/resource/om-2"
    labels = {(v, lg) for s, p, k, v, dt, lg in rows
              if s == om and p.endswith("rdf-schema#label")}
    assert (u"Ontology of units of Measure (OM)", "en") in labels
    assert any(lg == "ja" for _v, lg in labels)
    # DOCTYPE-entity datatypes expanded; parseType=Collection materialized
    assert any(dt == XSD + "float" and v == "1e-24" for *_x, v, dt, _l in
               [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows])
    assert sum(1 for r in rows if r[1] == RDF_NS + "first") == 934
    assert any(r[1] == RDF_NS + "_1" for r in rows)  # rdf:li containers


def test_rdfxml_core_constructs():
    rows = parse_rdfxml(
        """<?xml version="1.0"?>
        <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="http://x/" xml:base="http://base/">
          <ex:Thing rdf:about="a" ex:attr="av">
            <ex:ref rdf:resource="b"/>
            <ex:lit xml:lang="EN">hello</ex:lit>
            <ex:num rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">7</ex:num>
            <ex:nested><ex:Other/></ex:nested>
            <ex:props rdf:parseType="Resource"><ex:k>v</ex:k></ex:props>
            <ex:xml rdf:parseType="Literal"><b>bold</b></ex:xml>
          </ex:Thing>
          <ex:Other rdf:ID="frag"/>
        </rdf:RDF>"""
    )
    d = {(s, p): (k, v, dt, lg) for s, p, k, v, dt, lg in rows}
    A = "http://base/a"
    assert d[(A, RDF_NS + "type")][1] == "http://x/Thing"
    assert d[(A, "http://x/attr")][:2] == ("literal", "av")
    assert d[(A, "http://x/ref")] == ("iri", "http://base/b", None, "")
    assert d[(A, "http://x/lit")][1:] == ("hello", RDF_NS + "langString", "en")
    assert d[(A, "http://x/num")][1:3] == ("7", XSD + "integer")
    nested = d[(A, "http://x/nested")]
    assert nested[0] == "bnode"
    assert d[(nested[1], RDF_NS + "type")][1] == "http://x/Other"
    assert d[("http://base/#frag", RDF_NS + "type")][1] == "http://x/Other"
    props = d[(A, "http://x/props")]
    assert props[0] == "bnode" and d[(props[1], "http://x/k")][1] == "v"
    assert d[(A, "http://x/xml")][1:3] == ("<b>bold</b>", RDF_NS + "XMLLiteral")


def test_rdfxml_unsupported_is_loud():
    with pytest.raises(RdfXmlUnsupported):
        parse_rdfxml(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
            '<rdf:Description rdf:about="http://x/a">'
            '<x xmlns="http://x/" rdf:parseType="Weird"/>'
            "</rdf:Description></rdf:RDF>"
        )


# ---------------------------------------------------------------------------
# JSON-LD


def test_jsonld_core_constructs():
    rows = parse_jsonld(
        """
        {
          "@context": {
            "ex": "http://x/",
            "name": "http://x/name",
            "knows": {"@id": "http://x/knows", "@type": "@id"},
            "age": {"@id": "http://x/age",
                    "@type": "http://www.w3.org/2001/XMLSchema#integer"}
          },
          "@graph": [
            {"@id": "ex:alice", "@type": "ex:Person", "name": "Alice",
             "knows": "ex:bob", "age": "30",
             "ex:note": {"@value": "hi", "@language": "en"},
             "ex:tags": {"@list": ["a", "b"]},
             "ex:friend": {"@type": "ex:Person", "name": "Anon"}},
            {"@id": "ex:bob", "name": ["Bob", "Bobby"], "ex:score": 1.5,
             "ex:active": true, "ex:n": 3}
          ]
        }
        """
    )
    trips = {(s, p, k, v, dt, lg) for s, p, k, v, dt, lg in rows}
    A, B = "http://x/alice", "http://x/bob"
    assert (A, RDF_NS + "type", "iri", "http://x/Person", None, "") in trips
    assert (A, "http://x/name", "literal", "Alice", XSD + "string", "") in trips
    assert (A, "http://x/knows", "iri", B, None, "") in trips
    assert (A, "http://x/age", "literal", "30", XSD + "integer", "") in trips
    assert (A, "http://x/note", "literal", "hi", RDF_NS + "langString", "en") in trips
    firsts = [v for s, p, k, v, dt, lg in rows if p == RDF_NS + "first"]
    assert firsts == ["a", "b"]
    # anonymous nested node typed + named
    anon = [v for s, p, k, v, *_ in rows if s == A and p == "http://x/friend"]
    assert anon and anon[0].startswith("_:")
    assert (B, "http://x/score", "literal", "1.5", XSD + "double", "") in trips
    assert (B, "http://x/active", "literal", "true", XSD + "boolean", "") in trips
    assert (B, "http://x/n", "literal", "3", XSD + "integer", "") in trips
    assert {"Bob", "Bobby"} == {
        v for s, p, k, v, *_ in rows if s == B and p == "http://x/name"
    }


def test_jsonld_unsupported_is_loud():
    with pytest.raises(JsonLdUnsupported):
        parse_jsonld('{"@context": "http://remote/ctx", "@id": "http://x/a"}')
    with pytest.raises(JsonLdUnsupported):
        parse_jsonld('{"@id": "http://x/a", "@reverse": {}}')


# ---------------------------------------------------------------------------
# sniffing + dispatch


def test_sniff_format(tmp_path):
    cases = {
        "a.nt": ("<http://x/s> <http://x/p> <http://x/o> .\n", "ntriples"),
        "b.ttl": ("@prefix ex: <http://x/> . ex:s ex:p ex:o .", "turtle"),
        "c.trig": ("GRAPH <http://g> { <http://x/s> <http://x/p> 1 }", "trig"),
        "d.rdf": ('<?xml version="1.0"?><rdf:RDF '
                  'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"/>',
                  "rdfxml"),
        "e.jsonld": ('{"@id": "http://x/a"}', "jsonld"),
    }
    for fname, (content, fmt) in cases.items():
        f = tmp_path / fname
        f.write_text(content)
        assert sniff_format(str(f)) == fmt
        # content sniffing without the extension hint
        g = tmp_path / (fname.split(".")[0] + ".data")
        g.write_text(content)
        assert sniff_format(str(g)) == fmt, fname


def test_sniff_turtle_blank_node_subject_not_jsonld(tmp_path):
    """Turtle statements may start with an anonymous blank node ('[] a
    ex:T' / '[ ex:p 1 ] ex:q 2'); only JSON-looking arrays sniff as
    JSON-LD."""
    cases = {
        "t1.data": ("[] a <http://x/Thing> .\n", "turtle"),
        "t2.data": ("[ <http://x/p> 1 ] <http://x/q> 2 .\n", "turtle"),
        "j1.data": ('[{"@id": "http://x/a"}]', "jsonld"),
        "j2.data": ("[]", "jsonld"),
    }
    for fname, (content, fmt) in cases.items():
        f = tmp_path / fname
        f.write_text(content)
        assert sniff_format(str(f)) == fmt, fname


def test_jsonld_context_term_cycle_is_loud():
    import json

    for ctx in ({"a": "a"}, {"a": "b", "b": "a"}):
        with pytest.raises(JsonLdUnsupported, match="cyclic"):
            parse_jsonld(json.dumps(
                {"@context": ctx, "@id": "http://x/s", "a": "v"}
            ))


def test_read_rdf_local_dispatch(spark, tmp_path):
    nt = tmp_path / "x.nt"
    nt.write_text('<http://x/s> <http://x/p> "v" .\n')
    xml = tmp_path / "x.rdf"
    xml.write_text(
        '<?xml version="1.0"?><rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://x/">'
        '<rdf:Description rdf:about="http://x/s"><ex:p>v</ex:p>'
        "</rdf:Description></rdf:RDF>"
    )
    jld = tmp_path / "x.jsonld"
    jld.write_text('{"@id": "http://x/s", "http://x/p": "v"}')
    rows = [
        tuple(r) for p in (nt, xml, jld)
        for r in read_rdf_local(spark, str(p)).collect()
    ]
    assert all(r[0] == "http://x/s" and r[3] == "v" for r in rows)
    assert len(rows) == 3


# ---------------------------------------------------------------------------
# reference-style WrongValue annotation Turtle (blank-node bodies) feeding
# suppression directly — round-2 missing #3


def test_wrong_value_turtle_blank_nodes_suppress_finding(spark, tmp_path):
    from pyspark.sql import functions as F

    from abecto_spark.operators.metadata import wrong_values_from_metadata
    from abecto_spark.operators.property_cmp import property_comparison
    from abecto_spark.sources.turtle import read_turtle_local

    ttl = tmp_path / "ann.ttl"
    ttl.write_text(
        """
        @prefix av: <http://w3id.org/abecto/vocabulary#> .
        @prefix oa: <http://www.w3.org/ns/oa#> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        [] a oa:Annotation ;
           oa:hasTarget <http://x/r1> ;
           oa:hasBody [ a av:WrongValue ;
                        av:affectedAspect <http://x/aspect> ;
                        av:affectedValue "99"^^xsd:integer ;
                        av:affectedVariableName "qty" ] .
        """
    )
    wv = wrong_values_from_metadata(read_turtle_local(spark, str(ttl)), "d2")
    assert [tuple(r) for r in wv.collect()] == [("d2", "http://x/r1", "qty", "99")]

    ddl = ("dataset string, resource string, variable string, o_kind string,"
           " o_value string, o_datatype string, o_lang string")
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    values = spark.createDataFrame(
        [("d1", "http://x/r1", "qty", "literal", "1", xsd_int, ""),
         ("d2", "http://x/r1", "qty", "literal", "99", xsd_int, "")], ddl
    )
    members = values.select("dataset", "resource").distinct()
    canonical = members.select(
        "resource", F.lit("http://x/r1").alias("canonical_id")
    ).distinct()

    _, without = property_comparison(
        spark, values, members, canonical, "a", ["qty"]
    )
    _, with_wv = property_comparison(
        spark, values, members, canonical, "a", ["qty"], wrong_values=wv
    )
    devs_before = without.where(
        "kind = 'deviation' AND compared_to_value = '99'"
    ).count()
    devs_after = with_wv.where(
        "kind = 'deviation' AND compared_to_value = '99'"
    ).count()
    assert devs_before > 0 and devs_after == 0


# ---------------------------------------------------------------------------
# TriX (`util/Models.java:66-95`, Lang.TRIX)


def test_trix_roundtrip_tutorial_graph(spark, tmp_path):
    """The tutorial graph's shapes in TriX: named + default graphs, all
    four term element kinds, language tags."""
    from abecto_spark.sources.trix import parse_trix, read_trix_local

    doc = """<?xml version="1.0"?>
    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph>
        <uri>http://example.org/dataset1</uri>
        <triple>
          <uri>http://example.org/a/alice</uri>
          <uri>http://www.w3.org/2000/01/rdf-schema#label</uri>
          <plainLiteral>Alice</plainLiteral>
        </triple>
        <triple>
          <uri>http://example.org/a/alice</uri>
          <uri>http://example.org/a/pnr</uri>
          <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">45678</typedLiteral>
        </triple>
        <triple>
          <uri>http://example.org/a/alice</uri>
          <uri>http://example.org/a/note</uri>
          <plainLiteral xml:lang="en">the boss</plainLiteral>
        </triple>
      </graph>
      <graph>
        <triple>
          <id>b0</id>
          <uri>http://example.org/a/boss</uri>
          <uri>http://example.org/a/alice</uri>
        </triple>
      </graph>
    </TriX>
    """
    rows = parse_trix(doc)
    assert ("http://example.org/dataset1", "http://example.org/a/alice",
            "http://www.w3.org/2000/01/rdf-schema#label", "literal",
            "Alice", "http://www.w3.org/2001/XMLSchema#string", "") in rows
    assert ("http://example.org/dataset1", "http://example.org/a/alice",
            "http://example.org/a/pnr", "literal", "45678",
            "http://www.w3.org/2001/XMLSchema#integer", "") in rows
    langs = {r[6] for r in rows}
    assert "en" in langs
    # the default-graph blank-node triple
    assert ("", "_:b0", "http://example.org/a/boss", "iri",
            "http://example.org/a/alice", None, "") in rows

    f = tmp_path / "g.trix"
    f.write_text(doc)
    df = read_trix_local(spark, str(f))
    assert df.count() == 4
    # sniffed dispatch (extension and content) through read_rdf_local
    assert sniff_format(str(f)) == "trix"
    g = tmp_path / "g.data"
    g.write_text(doc)
    assert sniff_format(str(g)) == "trix"
    triples = read_rdf_local(spark, str(g))
    assert triples.count() == 4 and "graph" not in triples.columns


def test_trix_unsupported_is_loud():
    from abecto_spark.sources.trix import TrixUnsupported, parse_trix

    for doc, msg in [
        ("<notTriX/>", "namespace"),
        ('<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">'
         "<graph><triple><uri>http://x</uri></triple></graph></TriX>",
         "term elements"),
        ('<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">'
         "<graph><triple>"
         "<plainLiteral>x</plainLiteral><uri>http://p</uri><uri>http://o</uri>"
         "</triple></graph></TriX>", "literal subject"),
        ('<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">'
         "<graph><triple>"
         "<uri>http://s</uri><uri>http://p</uri>"
         "<typedLiteral>x</typedLiteral>"
         "</triple></graph></TriX>", "datatype"),
        ("not xml at all", "well-formed"),
    ]:
        with pytest.raises(TrixUnsupported, match=msg):
            parse_trix(doc)


# ---------------------------------------------------------------------------
# RDF/JSON (`util/Models.java:66-67`, Lang.RDFJSON)


def test_rdfjson_roundtrip_and_dispatch(spark, tmp_path):
    from abecto_spark.sources.rdfjson import RdfJsonUnsupported, parse_rdfjson

    doc = """{
      "http://x/s": {
        "http://x/p": [
          {"type": "uri", "value": "http://x/o"},
          {"type": "literal", "value": "hi", "lang": "en"},
          {"type": "literal", "value": "7",
           "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
          {"type": "bnode", "value": "b0"}
        ]
      },
      "_:b0": {
        "http://x/q": [ {"type": "literal", "value": "plain"} ]
      }
    }"""
    rows = set(parse_rdfjson(doc))
    assert ("http://x/s", "http://x/p", "iri", "http://x/o", None, "") in rows
    assert ("http://x/s", "http://x/p", "literal", "hi",
            RDF_NS + "langString", "en") in rows
    assert ("http://x/s", "http://x/p", "literal", "7",
            XSD + "integer", "") in rows
    assert ("http://x/s", "http://x/p", "bnode", "_:b0", None, "") in rows
    assert ("_:b0", "http://x/q", "literal", "plain",
            XSD + "string", "") in rows

    f = tmp_path / "d.rj"
    f.write_text(doc)
    assert sniff_format(str(f)) == "rdfjson"
    assert read_rdf_local(spark, str(f)).count() == 5

    # brute-force: an RDF/JSON body served with no usable format hint
    from abecto_spark.sources.formats import parse_rdf_text

    assert len(parse_rdf_text(doc)) == 5

    for bad in ['["not", "rdf-json"]', '{"s": "x"}',
                '{"s": {"p": [{"value": "no type"}]}}',
                '{"s": {"p": [{"type": "weird", "value": "x"}]}}']:
        with pytest.raises(RdfJsonUnsupported):
            parse_rdfjson(bad)


def test_thrift_reads_and_garbage_fails_loudly(spark, tmp_path):
    """RDF-Thrift gained a real reader in round 5: both extensions
    dispatch to it; garbage bytes fail with a thrift error, not a
    confusing Turtle error."""
    from abecto_spark.sources.rdfthrift import (
        RdfThriftUnsupported,
        write_rdfthrift,
    )

    rows = [("http://e/s", "http://e/p", "iri", "http://e/o", None, "",
             None)]
    for fname in ("x.rt", "x.trdf"):
        f = tmp_path / fname
        f.write_bytes(write_rdfthrift(rows))
        assert [tuple(r) for r in read_rdf_local(spark, str(f)).collect()] \
            == [rows[0][:6]]
        f.write_bytes(b"\x82binary-garbage")
        with pytest.raises(RdfThriftUnsupported):
            read_rdf_local(spark, str(f))


SHACLC_FIXTURE = """
BASE <http://example.com/ns>
IMPORTS <http://example.com/person-ontology>
PREFIX ex: <http://example.com/ns#>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>

shape ex:PersonShape -> ex:Person {
    targetNode=ex:Alice .
    ex:ssn xsd:string [0..1] pattern="^[0-9]+$" .
    ex:worksFor @ex:CompanyShape [0..*] .
    ^ex:manages ex:Person [1..*] .
    ex:age xsd:integer minInclusive=0 .
    ex:account IRI .
}
"""


def test_shaclc_reader_roundtrip(spark, tmp_path):
    """SHACL-C fixture → the standard SHACL triples Jena's reader emits
    for the same shapes — compared against the equivalent Turtle, with
    blank-node labels canonicalized by (shape, path) since labels are
    parser-private."""
    from abecto_spark.sources.shaclc import parse_shaclc
    from abecto_spark.sources.turtle import parse_turtle

    rows = parse_shaclc(SHACLC_FIXTURE)
    turtle_equiv = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.com/ns#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix owl: <http://www.w3.org/2002/07/owl#> .
    <http://example.com/ns> a owl:Ontology ;
        owl:imports <http://example.com/person-ontology> .
    ex:PersonShape a sh:NodeShape ;
        sh:targetClass ex:Person ;
        sh:targetNode ex:Alice ;
        sh:property [ sh:path ex:ssn ; sh:datatype xsd:string ;
                      sh:maxCount 1 ; sh:pattern "^[0-9]+$" ] ;
        sh:property [ sh:path ex:worksFor ; sh:node ex:CompanyShape ] ;
        sh:property [ sh:path [ sh:inversePath ex:manages ] ;
                      sh:class ex:Person ; sh:minCount 1 ] ;
        sh:property [ sh:path ex:age ; sh:datatype xsd:integer ;
                      sh:minInclusive 0 ] ;
        sh:property [ sh:path ex:account ; sh:nodeKind sh:IRI ] .
    """
    expected = parse_turtle(turtle_equiv)

    def canon(triples):
        """Rewrite bnode labels to a canonical form keyed by the
        sh:path object the property node points at."""
        SH = "http://www.w3.org/ns/shacl#"
        label = {}
        # path via plain IRI
        for s, p, k, v, dt, lg in triples:
            if p == SH + "path" and k == "iri":
                label[s] = "b:" + v
        # inverse paths: the inner bnode then the outer property node
        for s, p, k, v, dt, lg in triples:
            if p == SH + "inversePath":
                label[s] = "inv:" + v
        for s, p, k, v, dt, lg in triples:
            if p == SH + "path" and k == "bnode":
                label[s] = "b:" + label.get(v, v)
        def ren(t, kind=None):
            return label.get(t, t)
        out = set()
        for s, p, k, v, dt, lg in triples:
            v2 = label.get(v, v) if k == "bnode" else v
            # normalize integer decimals ("0" vs 0) and datatype nulls
            out.add((label.get(s, s), p, k, v2, dt or "", lg or ""))
        return out

    got, want = canon(rows), canon(expected)
    assert got == want


def test_shaclc_dispatch_and_loud_corners(spark, tmp_path):
    from abecto_spark.sources.shaclc import ShaclcUnsupported, parse_shaclc

    f = tmp_path / "shapes.shaclc"
    f.write_text(SHACLC_FIXTURE)
    df = read_rdf_local(spark, str(f))
    assert df.count() == len(parse_shaclc(SHACLC_FIXTURE))
    with pytest.raises(ShaclcUnsupported):
        parse_shaclc("shape ex:S { }")  # undeclared prefix
    with pytest.raises(ShaclcUnsupported):
        parse_shaclc("PREFIX ex: <http://e/> shape ex:S { ex:p (nested) . }")


def test_parse_trig_accepts_nquads_graph_label(spark):
    """application/n-quads is advertised in the Accept header and routed
    to the TriG parser, which must accept the 4-term statement shape
    (`<s> <p> <o> <g> .`) — ADVICE r4 (medium)."""
    from abecto_spark.sources.formats import parse_rdf_text
    from abecto_spark.sources.turtle import parse_trig

    nq = (
        "<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g> .\n"
        '<http://ex/s> <http://ex/q> "lit" _:g2 .\n'
        "<http://ex/s> <http://ex/r> <http://ex/o2> .\n"
    )
    quads = parse_trig(nq)
    assert [(q[0], q[1], q[2]) for q in quads] == [
        ("http://ex/g", "http://ex/s", "http://ex/p"),
        ("_:g2", "http://ex/s", "http://ex/q"),
        ("", "http://ex/s", "http://ex/r"),  # default graph
    ]
    # the content-negotiation path (fmt hint from the content type)
    rows = parse_rdf_text(nq, "trig")
    assert len(rows) == 3 and all(len(r) == 6 for r in rows)
    # plain Turtle statements still reject junk after the object list
    with pytest.raises(Exception):
        parse_trig("<http://ex/s> <http://ex/p> <http://ex/o> 42 .")


def test_writers_roundtrip_hostile_literals(spark, tmp_path):
    """Escaping torture: quotes, backslashes, newlines/tabs/CRs, unicode,
    and grammar-colliding content ('^^', '@en', triple quotes) round-trip
    bit-identically through BOTH quad writers and back through the
    parsers — the wrong-answer class escaping bugs live in."""
    import glob

    from abecto_spark.sources.rdf import write_nquads, write_trig_local

    LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    XS = "http://www.w3.org/2001/XMLSchema#string"
    hostile = [
        '"', "\\", "\n", "\t", "\r", "'", "é", "日本", 'a"b\\c', '""',
        "\\n", "x\ny", "", "<>", "{}", "^^", "@en", '"""', 'end"',
        '\\"', "a\rb", "tab\there",
    ]
    rows = []
    for i, h in enumerate(hostile):
        rows.append((f"http://x/s{i}", "http://x/p", "literal", h, XS,
                     "", "http://x/g"))
        rows.append((f"http://x/s{i}", "http://x/q", "literal", h, LS,
                     "en", "http://x/g"))
    ddl = ("s string, p string, o_kind string, o_value string,"
           " o_datatype string, o_lang string, graph string")
    df = spark.createDataFrame(rows, ddl)
    sel = ["s", "p", "o_kind", "o_value", "o_datatype", "o_lang"]

    def norm(rows6):
        return sorted(
            (r["s"], r["p"], r["o_kind"], r["o_value"],
             r["o_datatype"] or "", r["o_lang"] or "")
            for r in rows6
        )

    src = norm(df.select(*sel).collect())

    nq_dir = str(tmp_path / "nq")
    write_nquads(df, nq_dir)
    joined = str(tmp_path / "all.nq")
    with open(joined, "w", encoding="utf-8") as fh:
        for p in sorted(glob.glob(nq_dir + "/part*")):
            if os.path.isfile(p):
                fh.write(open(p, encoding="utf-8").read())
    assert norm(read_rdf_local(spark, joined).select(*sel).collect()) == src

    trig = str(tmp_path / "out.trig")
    write_trig_local(df, trig)
    assert norm(read_rdf_local(spark, trig).select(*sel).collect()) == src
