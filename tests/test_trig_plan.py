"""TriG plan-file surface: the extended Turtle/TriG parser (named graphs,
@base, blank-node property lists, collections), the av:Plan vocabulary →
plan-dict mapper, and the CLI — fed the reference's ACTUAL
`tutorial-configuration.trig` (`Abecto.java:64-155`, `AbectoTest.java:32-40`)
with the same result assertions as the dict-driven tutorial e2e."""

from __future__ import annotations

import os
from decimal import Decimal

import pytest

from abecto_spark.plans.driver import run_plan
from abecto_spark.plans.trig_plan import PlanFileError, load_trig_plan
from abecto_spark.sources.turtle import (
    RDF_NS,
    TurtleUnsupported,
    parse_trig,
    parse_turtle,
)

RES = "/root/reference/abecto-core/src/test/resources"
TRIG = f"{RES}/tutorial-configuration.trig"
EX = "http://example.org/"
A, B, C = EX + "a/", EX + "b/", EX + "c/"
D1, D2, D3 = (EX + f"dataset{i}" for i in (1, 2, 3))
XSD = "http://www.w3.org/2001/XMLSchema#"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(TRIG), reason="reference fixtures not available"
)


# ---------------------------------------------------------------------------
# parser units


def test_bnode_property_list_and_base():
    rows = parse_turtle(
        """
        @base <http://x.org/> .
        @prefix ex: <http://x.org/v#> .
        <s> ex:p [ ex:k "path" ; ex:v "a", "b" ] .
        """
    )
    d = {(s, p): (k, v) for s, p, k, v, *_ in rows}
    bnode = d[("http://x.org/s", "http://x.org/v#p")][1]
    assert d[("http://x.org/s", "http://x.org/v#p")][0] == "bnode"
    assert d[(bnode, "http://x.org/v#k")] == ("literal", "path")
    vals = {v for s, p, k, v, *_ in rows if s == bnode and p.endswith("#v")}
    assert vals == {"a", "b"}


def test_anonymous_subject_and_nested_bnodes():
    rows = parse_turtle(
        """
        @prefix ex: <http://x.org/> .
        [] a ex:Thing ; ex:p [ ex:q 1 ] .
        """
    )
    types = [(s, v) for s, p, k, v, *_ in rows if p.endswith("type")]
    assert len(types) == 1 and types[0][0].startswith("_:")
    nested = [v for s, p, k, v, *_ in rows if p == "http://x.org/q"]
    assert nested == ["1"]


def test_collections():
    rows = parse_turtle(
        "@prefix ex: <http://x.org/> . ex:s ex:p (ex:a ex:b) . ex:t ex:q () ."
    )
    firsts = [v for s, p, k, v, *_ in rows if p == RDF_NS + "first"]
    assert firsts == ["http://x.org/a", "http://x.org/b"]
    rests = [(k, v) for s, p, k, v, *_ in rows if p == RDF_NS + "rest"]
    assert ("iri", RDF_NS + "nil") in rests
    empty = [(k, v) for s, p, k, v, *_ in rows if s == "http://x.org/t"]
    assert empty == [("iri", RDF_NS + "nil")]


def test_trig_named_graphs_and_shorthand():
    quads = parse_trig(
        """
        @prefix ex: <http://x.org/> .
        ex:s ex:p ex:o .
        GRAPH ex:g1 { ex:a ex:p ex:b . ex:c ex:p ex:d }
        ex:g2 { ex:e ex:p ex:f . }
        { ex:x ex:p ex:y }
        """
    )
    by_graph = {}
    for g, s, *_ in quads:
        by_graph.setdefault(g, []).append(s)
    assert sorted(by_graph[""]) == ["http://x.org/s", "http://x.org/x"]
    assert sorted(by_graph["http://x.org/g1"]) == ["http://x.org/a", "http://x.org/c"]
    assert by_graph["http://x.org/g2"] == ["http://x.org/e"]


def test_pname_trailing_dot_is_statement_terminator():
    # `ex:o.` must tokenize as pname + '.', not swallow the dot (ADVICE)
    rows = parse_turtle("@prefix ex: <http://x.org/> . ex:s ex:p ex:o.")
    assert rows == [
        ("http://x.org/s", "http://x.org/p", "iri", "http://x.org/o", None, "")
    ]


def test_triple_quoted_and_numeric_literals():
    rows = parse_turtle(
        '@prefix ex: <http://x.org/> .\n'
        'ex:s ex:q """line1\nline2 "quoted" end""" ; ex:n 9e-1 ; ex:i 42 .'
    )
    d = {p.rsplit("/", 1)[-1]: (v, dt) for s, p, k, v, dt, _ in rows}
    assert d["q"][0] == 'line1\nline2 "quoted" end'
    assert d["n"] == ("9e-1", XSD + "double")
    assert d["i"] == ("42", XSD + "integer")


def test_unsupported_still_loud():
    with pytest.raises(TurtleUnsupported):
        parse_turtle("<s> <p> <o> ; ,")


# ---------------------------------------------------------------------------
# plan vocabulary mapping + e2e on the reference's own plan file


def test_load_trig_plan_structure():
    plan = load_trig_plan(TRIG)
    aspects = plan["aspects"]
    assert list(aspects) == [EX + "aspectPerson"]
    assert aspects[EX + "aspectPerson"]["key_var"] == "person"
    assert sorted(aspects[EX + "aspectPerson"]["patterns"]) == [D1, D2, D3]
    steps = {s["id"]: s for s in plan["steps"]}
    jw = steps[EX + "jaroWinklerMapping"]
    assert jw["processor"] == "jw_mapping"
    assert jw["params"]["threshold"] == 0.9
    assert jw["params"]["case_sensitive"] is False
    assert jw["params"]["variables"] == ["label"]
    # named graph routed into the step as inline metadata rows
    assert jw["params"]["predefined_meta_rows"] == [
        [B + "william", "http://w3id.org/abecto/vocabulary#correspondsNotToResource",
         "iri", C + "P004", None, ""]
    ]
    src1 = steps[EX + "source1"]
    assert [os.path.basename(p) for p in src1["params"]["path"]] == [
        "tutorial-source1part1.ttl", "tutorial-source1part2.ttl"
    ]
    assert all(os.path.isabs(p) for p in src1["params"]["path"])


def test_load_trig_plan_errors(tmp_path):
    f = tmp_path / "two_plans.trig"
    f.write_text(
        "@prefix av: <http://w3id.org/abecto/vocabulary#> .\n"
        "<p1> a av:Plan . <p2> a av:Plan .\n"
    )
    with pytest.raises(PlanFileError, match="exactly one av:Plan"):
        load_trig_plan(str(f))
    assert load_trig_plan(str(f), plan_iri="p1")["steps"] == []
    with pytest.raises(PlanFileError, match="not found"):
        load_trig_plan(str(f), plan_iri="nope")


@pytest.fixture(scope="module")
def trig_result(spark):
    return run_plan(spark, load_trig_plan(TRIG))


def test_trig_plan_clusters(spark, trig_result):
    from pyspark.sql import functions as F

    groups = (
        trig_result.canonical.groupBy("canonical_id")
        .agg(F.sort_array(F.collect_set("resource")).alias("members"))
        .collect()
    )
    clusters = {tuple(r["members"]) for r in groups if len(r["members"]) > 1}
    assert clusters == {
        (A + "alice", B + "alice", C + "P001"),
        (B + "charlie", C + "P002"),
    }


def test_trig_plan_measures_and_findings(spark, trig_result):
    mm = {
        (r["measure"], r["dataset"], tuple(r["compared_to"])): Decimal(r["value"])
        for r in trig_result.measures.where("variable IS NULL").collect()
    }
    assert mm[("count", D1, ())] == 2
    assert mm[("count", D2, ())] == 3
    assert mm[("count", D3, ())] == 4
    assert mm[("marCompletenessThomas08", D1, (D2, D3))] == Decimal(
        "0.3076923076923077"
    )
    devs = {
        (r["variable"], r["affected_dataset"], r["affected_value"],
         r["compared_to_dataset"], r["compared_to_value"])
        for r in trig_result.findings.where("kind = 'deviation'").collect()
    }
    assert ("pnr", D1, "45678", D3, "12345") in devs
    omissions = {
        (r["affected_dataset"], r["compared_to_resource"])
        for r in trig_result.findings.where("kind = 'resource_omission'").collect()
    }
    # the manualMappings graph's exclusion kept william/P004 apart
    assert (D3, B + "william") in omissions
    assert (D2, C + "P004") in omissions


# ---------------------------------------------------------------------------
# CLI


def test_cli_end_to_end(spark, tmp_path):
    from abecto_spark.cli import main

    out = tmp_path / "out"
    dev_csv = tmp_path / "deviations_csv"
    meas_md = tmp_path / "measurements.md"
    code = main([
        TRIG,
        "--out", str(out),
        "-E", f"deviations={dev_csv}",
        "-E", f"measurementsMarkdown={meas_md}",
        "--failOnDeviation", "--failOnResourceOmission",
    ])
    assert code == 2 + 8  # deviations and resource omissions both present
    assert (out / "measures").is_dir() and (out / "findings").is_dir()
    md = meas_md.read_text()
    assert "marCompletenessThomas08" in md
    import glob

    csv_text = "".join(
        open(p).read() for p in glob.glob(str(dev_csv / "part-*"))
    )
    assert "45678" in csv_text and "12345" in csv_text


def test_cli_load_only_reexports_without_execution(spark, tmp_path):
    """--loadOnly (`Abecto.java:91-92`): exports and fail-on checks run
    against the previously saved --out store without re-executing the
    plan — same CSV bytes, same exit bits."""
    import glob

    from abecto_spark.cli import main

    out = tmp_path / "out"
    first_csv = tmp_path / "dev1"
    code = main([
        TRIG, "--out", str(out), "-E", f"deviations={first_csv}",
        "--failOnDeviation",
    ])
    assert code == 2

    second_csv = tmp_path / "dev2"
    meas_md = tmp_path / "measurements.md"
    code2 = main([
        TRIG, "--loadOnly", "--out", str(out),
        "-E", f"deviations={second_csv}",
        "-E", f"measurementsMarkdown={meas_md}",
        "--failOnDeviation", "--failOnResourceOmission",
    ])
    assert code2 == 2 + 8

    def csv_rows(d):
        return sorted(
            line
            for p in glob.glob(str(d / "part-*"))
            for line in open(p).read().splitlines()
            if line
        )

    assert csv_rows(first_csv) == csv_rows(second_csv)
    assert "marCompletenessThomas08" in meas_md.read_text()

    # loadOnly guards: --out required; primary-graph surfaces refuse
    with pytest.raises(SystemExit, match="--out"):
        main([TRIG, "--loadOnly"])
    with pytest.raises(SystemExit, match="primary graphs"):
        main([
            TRIG, "--loadOnly", "--out", str(out),
            "--trig", str(tmp_path / "x.trig"),
        ])


def test_cli_report_on_filters_exit_bits(spark, tmp_path):
    from abecto_spark.cli import main

    # dataset1 is affected by deviations; restricting to it must drop the
    # exit bit for a finding kind it does not carry
    code = main([TRIG, "--reportOn", D1, "--failOnDeviation"])
    assert code == 2


def test_cli_fail_on_wrong_value_bit(spark, tmp_path):
    """--failOnWrongValue (bit 16, `Abecto.java:225-227`): a
    PropertyComparison step whose av:predefinedMetaDataGraph carries an
    av:WrongValue annotation sets the bit; the matching deviation is
    suppressed on the annotated side."""
    from abecto_spark.cli import main

    (tmp_path / "b.nt").write_text(
        f'<{EX}b/n1> <{EX}label> "Widget" .\n'
        f'<{EX}b/n1> <{EX}num> "1" .\n'
        f'<{EX}b/n2> <{EX}label> "Gadget" .\n'
        f'<{EX}b/n2> <{EX}num> "2" .\n'
    )
    (tmp_path / "c.nt").write_text(
        f'<{EX}c/n1> <{EX}label> "Widget" .\n'
        f'<{EX}c/n1> <{EX}num> "1" .\n'
        f'<{EX}c/n2> <{EX}label> "Gadget" .\n'
        f'<{EX}c/n2> <{EX}num> "99" .\n'
    )
    pattern = (
        f"SELECT ?k ?label ?num WHERE {{ ?k <{EX}label> ?label ;"
        f" <{EX}num> ?num }}"
    )
    plan = f"""
    @base <{EX}> .
    @prefix av: <http://w3id.org/abecto/vocabulary#> .
    @prefix oa: <http://www.w3.org/ns/oa#> .
    @prefix p-plan: <http://purl.org/net/p-plan#> .
    @prefix abecto: <java:de.uni_jena.cs.fusion.abecto.processor.> .

    <plan> a av:Plan .
    <sb> a av:Step ; p-plan:isStepOfPlan <plan> ;
        av:processorClass abecto:FileSourceProcessor ;
        av:hasParameter [av:key "path" ; av:value "b.nt" ] ;
        av:associatedDataset <db> .
    <sc> a av:Step ; p-plan:isStepOfPlan <plan> ;
        av:processorClass abecto:FileSourceProcessor ;
        av:hasParameter [av:key "path" ; av:value "c.nt" ] ;
        av:associatedDataset <dc> .
    <aspectThing> a av:Aspect ; av:keyVariableName "k" .
    [] a av:AspectPattern ; av:ofAspect <aspectThing> ;
        av:associatedDataset <db> ; av:definingQuery \"\"\"{pattern}\"\"\" .
    [] a av:AspectPattern ; av:ofAspect <aspectThing> ;
        av:associatedDataset <dc> ; av:definingQuery \"\"\"{pattern}\"\"\" .
    GRAPH <wrongValues> {{
        [] oa:hasTarget <c/n2> ;
           oa:hasBody [ a av:WrongValue ;
                        av:affectedAspect <aspectThing> ;
                        av:affectedValue "99" ;
                        av:affectedVariableName "num" ] .
    }}
    <jw> a av:Step ; p-plan:isStepOfPlan <plan> ;
        av:processorClass abecto:JaroWinklerMappingProcessor ;
        p-plan:isPrecededBy <sb>, <sc> ;
        av:hasParameter
            [av:key "threshold" ; av:value 9e-1 ] ,
            [av:key "aspect" ; av:value <aspectThing> ] ,
            [av:key "variables" ; av:value "label" ] .
    <prop> a av:Step ; p-plan:isStepOfPlan <plan> ;
        av:processorClass abecto:PropertyComparisonProcessor ;
        p-plan:isPrecededBy <jw> ;
        av:predefinedMetaDataGraph <wrongValues> ;
        av:hasParameter
            [av:key "aspect" ; av:value <aspectThing> ] ,
            [av:key "variables" ; av:value "num" ] .
    """
    plan_file = tmp_path / "plan.trig"
    plan_file.write_text(plan)
    assert main([str(plan_file), "--failOnWrongValue"]) == 16
    # the annotated dataset carries no bit when reporting is restricted
    # to a dataset without wrong values... the annotation names dc/n2,
    # so --reportOn db must drop the bit
    assert main([str(plan_file), "--reportOn", EX + "db",
                 "--failOnWrongValue"]) == 0
    # the "2 vs 99" deviation seen from db is suppressed (99 is a known
    # wrong value), the mirror direction survives → bit 2 still fires
    assert main([str(plan_file), "--failOnDeviation"]) == 2
    # --loadOnly round-trip: wrong_values persist in the --out store, so
    # bit 16 (and its --reportOn restriction) survive re-export without
    # re-execution
    out = tmp_path / "out"
    assert main([str(plan_file), "--out", str(out),
                 "--failOnWrongValue"]) == 16
    assert main([str(plan_file), "--loadOnly", "--out", str(out),
                 "--failOnWrongValue"]) == 16
    assert main([str(plan_file), "--loadOnly", "--out", str(out),
                 "--reportOn", EX + "db", "--failOnWrongValue"]) == 0


def test_cli_bad_export_template(spark):
    from abecto_spark.cli import main

    with pytest.raises(SystemExit):
        main([TRIG, "-E", "nope=/tmp/x"])


def test_cli_trig_and_nquads_dump(spark, tmp_path):
    """--trig / --nquads dataset dumps (`Abecto.java:166-173`): the TriG
    file groups statements into one named graph per dataset and reads
    back through the TriG parser; the N-Quads directory reads back
    through the distributed parser with the same quads."""
    from abecto_spark.cli import main
    from abecto_spark.sources.rdf import read_ntriples
    from abecto_spark.sources.turtle import read_trig_local

    trig_out = tmp_path / "dump.trig"
    nq_out = tmp_path / "dump_nq"
    code = main([TRIG, "--trig", str(trig_out), "--nquads", str(nq_out)])
    assert code == 0
    trig_back = read_trig_local(spark, str(trig_out))
    nq_back = read_ntriples(spark, str(nq_out))
    graphs = {r["graph"] for r in trig_back.select("graph").distinct().collect()}
    assert len(graphs) == 3  # one named graph per tutorial dataset
    a = sorted(
        (r["graph"], r["s"], r["p"], r["o_kind"], r["o_value"])
        for r in trig_back.collect()
    )
    b = sorted(
        (r["graph"], r["s"], r["p"], r["o_kind"], r["o_value"])
        for r in nq_back.collect()
    )
    assert a == b and len(a) > 20


def test_cli_mapping_review_and_wd_mismatch_exports(spark, tmp_path):
    from abecto_spark.cli import main

    review = tmp_path / "review_csv"
    wd = tmp_path / "wd_csv"
    code = main([
        TRIG,
        "-E", f"mappingReview={review}",
        "--reviewLabel", "http://www.w3.org/2000/01/rdf-schema#label",
        "-E", f"wdMismatchFinder={wd}",
        "--wdDataset", D1,
        "--wdProperty", "pnr=P1234",
    ])
    assert code == 0
    import glob

    review_text = "".join(
        open(p).read() for p in glob.glob(str(review / "part-*"))
    )
    # corresponding tutorial people appear side-by-side with labels;
    # the vetoed william<->P004 pair (predefined incorrespondence) must
    # not appear
    assert f"{A}alice,Alice,{B}alice,Alice" in review_text
    assert "Charlie" in review_text
    assert "william" not in review_text and "P004" not in review_text
    wd_text = "".join(open(p).read() for p in glob.glob(str(wd / "part-*")))
    # dataset1's pnr deviation surfaces as a mismatch row for P1234
    assert "P1234" in wd_text and "45678" in wd_text


def test_cli_export_missing_config_is_loud(spark, tmp_path):
    from abecto_spark.cli import main

    with pytest.raises(SystemExit, match="reviewLabel"):
        main([TRIG, "-E", f"mappingReview={tmp_path / 'r'}"])
    with pytest.raises(SystemExit, match="wdDataset"):
        main([TRIG, "-E", f"wdMismatchFinder={tmp_path / 'w'}"])
