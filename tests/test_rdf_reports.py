"""N-Triples source round-trip + report exports
(FileSourceProcessor analog, `FileSourceProcessor.java:31-55`;
export templates `Abecto.java:258-281`)."""

import glob
import os

from pyspark.sql import functions as F

from abecto_spark.plans.reports import (
    export_deviations_csv,
    mapping_review,
    measurements_markdown,
)
from abecto_spark.sources.rdf import (
    read_ntriples,
    read_ntriples_rejects,
    write_ntriples,
)

NT = """\
<http://ex.org/a> <http://ex.org/p> <http://ex.org/b> .
_:b0 <http://ex.org/p> "plain" .
<http://ex.org/a> <http://ex.org/label> "caf\\u00e9 \\"x\\""@en .
<http://ex.org/a> <http://ex.org/n> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
# a comment line

not a triple at all
<http://ex.org/a> <http://ex.org/q> "tab\\there" .
"""


def test_ntriples_parse(spark, tmp_path):
    p = tmp_path / "in.nt"
    p.write_text(NT)
    df = read_ntriples(spark, str(p))
    rows = {(r.s, r.p, r.o_kind, r.o_value, r.o_datatype, r.o_lang) for r in df.collect()}
    assert (
        "http://ex.org/a", "http://ex.org/p", "iri", "http://ex.org/b", None, "",
    ) in rows
    assert (
        "_:b0", "http://ex.org/p", "literal", "plain",
        "http://www.w3.org/2001/XMLSchema#string", "",
    ) in rows
    assert (
        "http://ex.org/a", "http://ex.org/n", "literal", "42",
        "http://www.w3.org/2001/XMLSchema#integer", "",
    ) in rows
    lang_rows = [r for r in rows if r[5] == "en"]
    assert len(lang_rows) == 1 and 'caf' in lang_rows[0][3] and '"x"' in lang_rows[0][3]
    tab = [r for r in rows if r[1] == "http://ex.org/q"]
    assert tab[0][3] == "tab\there"
    assert len(rows) == 5
    rejects = read_ntriples_rejects(spark, str(p))
    assert rejects.count() == 1  # only the malformed line; comment/blank skipped


def test_ntriples_roundtrip(spark, tmp_path):
    src = tmp_path / "in.nt"
    src.write_text(NT)
    df = read_ntriples(spark, str(src))
    out = str(tmp_path / "out_nt")
    write_ntriples(df.drop("graph"), out)
    back = read_ntriples(spark, out)
    a = {tuple(r) for r in df.drop("graph").collect()}
    b = {tuple(r) for r in back.drop("graph").collect()}
    assert a == b


def test_reports(spark, tmp_path):
    findings = spark.createDataFrame(
        [
            ("deviation", "person", "boss", "d1", "r1", "alice", "d2", "r2", "alise", None),
            ("value_omission", "person", "pnr", "d1", "r1", None, "d2", "r2", "7", None),
        ],
        "kind string, aspect string, variable string, affected_dataset string,"
        "affected_resource string, affected_value string, compared_to_dataset string,"
        "compared_to_resource string, compared_to_value string, comment string",
    )
    out = str(tmp_path / "dev_csv")
    export_deviations_csv(findings, out)
    text = "".join(open(f).read() for f in glob.glob(os.path.join(out, "*.csv")))
    assert "alice" in text and "alise" in text and "pnr" not in text

    measures = spark.createDataFrame(
        [("count", "d1", ["d2"], "5")],
        "measure string, dataset string, compared_to array<string>, value string",
    )
    md = measurements_markdown(measures)
    assert "| count | d1 | d2 | 5 |" in md

    edges = spark.createDataFrame([("r1", "r2")], "src string, dst string")
    values = spark.createDataFrame(
        [("d1", "r1", "label", "literal", "alice", None, ""),
         ("d2", "r2", "label", "literal", "alise", None, "")],
        "dataset string, resource string, variable string, o_kind string,"
        "o_value string, o_datatype string, o_lang string",
    )
    mr = mapping_review(edges, values, "label").collect()
    assert len(mr) == 1 and mr[0].src_label == "alice" and mr[0].dst_label == "alise"


def test_ntriples_nasty_escapes_roundtrip(spark, tmp_path):
    """Literal backslash+letter sequences and CR/TAB must survive
    write → read unchanged (escape-order and CR-escaping regressions)."""
    from abecto_spark.sources.rdf import read_ntriples, write_ntriples

    nasty = [
        "back\\nslash-n",   # literal backslash followed by 'n'
        "tab\there",
        "cr\rhere",
        "quote\"bs\\mix\\\\double",
        "nl\nin value",
    ]
    rows = [
        ("http://ex.org/s", "http://ex.org/p", "literal", v,
         "http://www.w3.org/2001/XMLSchema#string", "")
        for v in nasty
    ]
    df = spark.createDataFrame(
        rows, "s string, p string, o_kind string, o_value string,"
              "o_datatype string, o_lang string"
    )
    out = str(tmp_path / "nasty_nt")
    write_ntriples(df, out)
    back = read_ntriples(spark, out)
    assert {r.o_value for r in back.collect()} == set(nasty)


FINDINGS_DDL = (
    "kind string, aspect string, variable string, affected_dataset string,"
    " affected_resource string, affected_value string,"
    " compared_to_dataset string, compared_to_resource string,"
    " compared_to_value string, comment string"
)


def _sample_findings(spark):
    rows = [
        ("deviation", "person", "pnr", "d1", "http://a/alice", "45678",
         "d3", "http://c/P001", "12345", None),
        ("deviation", "person", "boss", "d1", "http://a/alice", "http://a/bob",
         "d2", "http://b/alice", "http://b/alice", None),
        ("value_omission", "person", "pnr", "d2", "http://b/alice", None,
         "d3", "http://c/P001", "12345", None),
    ]
    return spark.createDataFrame(rows, FINDINGS_DDL)


def test_deviations_markdown(spark):
    from abecto_spark.plans.reports import deviations_markdown

    md = deviations_markdown(_sample_findings(spark))
    assert "## Dataset: d1" in md
    assert "### Aspect: person" in md
    assert "| Resource | Variable Name | Value |" in md
    assert "| http://a/alice | pnr | 45678 | 12345 | http://c/P001 | d3 |" in md
    # the snippet is a paste-ready wrong_values row for the compared value
    assert '`("d3", "http://c/P001", "pnr", "12345")`' in md
    # omissions are not part of the deviations report: only the two
    # deviation data rows are present
    assert md.count("\n| http://") == 2


def test_wd_mismatch_finder(spark):
    from abecto_spark.plans.reports import wd_mismatch_finder

    wd = "http://www.wikidata.org/entity/"
    rows = [
        ("deviation", "person", "pnr", "wikidata", wd + "Q42", wd + "Q7",
         "ext", "http://x/douglas", "42", None),
        ("value_omission", "person", "pnr", "wikidata", wd + "Q1", None,
         "ext", "http://x/one", "one", None),
        ("deviation", "person", "pnr", "ext", "http://x/douglas", "42",
         "wikidata", wd + "Q42", "43", None),  # wrong side: excluded
    ]
    f = spark.createDataFrame(rows, FINDINGS_DDL)
    out = {
        (r["item_id"], r["property_id"], r["wikidata_value"],
         r["external_value"], r["external_url"], r["type"])
        for r in wd_mismatch_finder(f, "wikidata", {"pnr": "P123"}).collect()
    }
    assert out == {
        ("Q42", "P123", "Q7", "42", "http://x/douglas", "statement"),
        ("Q1", "P123", "", "one", "http://x/one", "statement"),
    }


def test_nquads_roundtrip(spark, tmp_path):
    from abecto_spark.sources.rdf import write_nquads

    rows = [
        ("http://ex.org/a", "http://ex.org/p", "iri", "http://ex.org/b",
         None, "", "http://ex.org/g1"),
        ("_:b0", "http://ex.org/p", "literal", 'he said "hi"\n\tbye',
         "http://www.w3.org/2001/XMLSchema#string", "", "http://ex.org/g2"),
        ("http://ex.org/a", "http://ex.org/l", "literal", "chat",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr",
         "http://ex.org/g1"),
        ("http://ex.org/d", "http://ex.org/p", "bnode", "_:x", None, "", None),
    ]
    ddl = ("s string, p string, o_kind string, o_value string,"
           " o_datatype string, o_lang string, graph string")
    quads = spark.createDataFrame(rows, ddl)
    out = str(tmp_path / "out_nq")
    write_nquads(quads, out)
    back = read_ntriples(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_writers_treat_empty_string_graph_as_default(spark, tmp_path):
    """parse_trig/read_trig_local mark default-graph quads with graph ==
    '' while plan frames use NULL; both must serialize as plain triples,
    never as an invalid '<>' label."""
    from abecto_spark.sources.rdf import write_nquads, write_trig_local

    rows = [
        ("http://ex.org/a", "http://ex.org/p", "iri", "http://ex.org/b",
         None, "", ""),
        ("http://ex.org/c", "http://ex.org/p", "iri", "http://ex.org/d",
         None, "", None),
    ]
    ddl = ("s string, p string, o_kind string, o_value string,"
           " o_datatype string, o_lang string, graph string")
    quads = spark.createDataFrame(rows, ddl)
    out = str(tmp_path / "nq")
    write_nquads(quads, out)
    import glob

    text = "".join(open(p).read() for p in glob.glob(out + "/part-*"))
    assert "<>" not in text
    back = {tuple(r) for r in read_ntriples(spark, out).collect()}
    assert back == {tuple(r[:6]) + (None,) for r in rows}
    trig = str(tmp_path / "d.trig")
    write_trig_local(quads, trig)
    t = open(trig).read()
    assert "<>" not in t and "{" not in t  # all default-graph statements


def test_trig_local_roundtrip(spark, tmp_path):
    from abecto_spark.sources.rdf import write_trig_local
    from abecto_spark.sources.turtle import read_trig_local

    rows = [
        ("http://ex.org/a", "http://ex.org/p", "iri", "http://ex.org/b",
         None, "", "http://ex.org/g1"),
        ("http://ex.org/a", "http://ex.org/n", "literal", "42",
         "http://www.w3.org/2001/XMLSchema#integer", "", "http://ex.org/g2"),
        ("http://ex.org/c", "http://ex.org/l", "literal", "x y",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en",
         "http://ex.org/g2"),
        ("http://ex.org/d", "http://ex.org/p", "iri", "http://ex.org/e",
         None, "", None),  # default graph
    ]
    ddl = ("s string, p string, o_kind string, o_value string,"
           " o_datatype string, o_lang string, graph string")
    quads = spark.createDataFrame(rows, ddl)
    path = str(tmp_path / "dump.trig")
    write_trig_local(quads, path)
    back = read_trig_local(spark, path)  # (graph, s, p, kind, value, dt, lang)
    got = sorted(
        (r["s"], r["p"], r["o_kind"], r["o_value"], r["o_datatype"],
         r["o_lang"], r["graph"] if r["graph"] != "" else None)
        for r in back.collect()
    )
    assert got == sorted(rows)
