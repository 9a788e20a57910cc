"""Generic plan-DAG driver e2e — the reference's tutorial scenario
(`tutorial-configuration.trig` + `tutorial-source*.ttl`, run by
`AbectoTest.java:32-40`) executed from a declarative plan dict through
run_plan: Turtle ingestion → SPARQL aspect extraction → JW mapping with a
predefined correspondsNotToResource exclusion → population + property
comparison — consuming the reference's actual fixture files."""

from __future__ import annotations

import os
from decimal import Decimal

import pytest

from abecto_spark.plans.driver import PlanError, run_plan
from abecto_spark.sources.checkpoint import SnapshotStore
from abecto_spark.sources.turtle import parse_turtle, read_turtle_local

RES = "/root/reference/abecto-core/src/test/resources"
A, B, C = "http://example.org/a/", "http://example.org/b/", "http://example.org/c/"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not available"
)


def _tutorial_plan():
    return {
        "aspects": {
            "person": {
                "key_var": "person",
                "patterns": {
                    "d1": f"""
                        SELECT ?person ?label ?pnr ?boss WHERE {{
                            ?person <{RDFS_LABEL}> ?label ;
                                <{A}pnr> ?pnr ;
                                <{A}boss> ?boss .
                        }}""",
                    "d2": f"""
                        SELECT ?person ?label ?boss WHERE {{
                            ?person <{RDFS_LABEL}> ?label .
                            OPTIONAL {{ ?person <{B}boss> ?boss }}
                        }}""",
                    "d3": f"""
                        SELECT ?person ?label ?pnr WHERE {{
                            ?person <{RDFS_LABEL}> ?label ;
                                <{C}pnr> ?pnr .
                        }}""",
                },
            }
        },
        "steps": [
            {"id": "source1", "processor": "file_source", "dataset": "d1",
             "params": {"path": [f"{RES}/tutorial-source1part1.ttl",
                                 f"{RES}/tutorial-source1part2.ttl"]}},
            {"id": "source2", "processor": "file_source", "dataset": "d2",
             "params": {"path": f"{RES}/tutorial-source2.ttl"}},
            {"id": "source3", "processor": "file_source", "dataset": "d3",
             "params": {"path": f"{RES}/tutorial-source3.ttl"}},
            {"id": "jw", "processor": "jw_mapping",
             "inputs": ["source1", "source2", "source3"],
             "params": {"aspect": "person", "variables": ["label"],
                        "threshold": 0.9, "case_sensitive": False,
                        "incorrespondences": [[B + "william", C + "P004"]]}},
            {"id": "propertyComparison", "processor": "property_comparison",
             "inputs": ["jw"],
             "params": {"aspect": "person",
                        "variables": ["boss", "label", "pnr"]}},
            {"id": "completeness", "processor": "population_comparison",
             "inputs": ["jw"], "params": {"aspects": ["person"]}},
        ],
    }


def test_turtle_reader_on_reference_fixtures(spark):
    rows = parse_turtle(open(f"{RES}/tutorial-source1part1.ttl").read())
    d = {(s, p): (k, v, dt) for s, p, k, v, dt, _lang in rows}
    assert d[(A + "alice", RDFS_LABEL)] == (
        "literal", "Alice", "http://www.w3.org/2001/XMLSchema#string")
    assert d[(A + "alice", A + "pnr")] == (
        "literal", "45678", "http://www.w3.org/2001/XMLSchema#integer")
    assert d[(A + "alice", A + "boss")] == ("iri", A + "bob", None)
    df = read_turtle_local(spark, f"{RES}/tutorial-source2.ttl")
    assert df.count() == len(parse_turtle(open(f"{RES}/tutorial-source2.ttl").read()))


@pytest.fixture(scope="module")
def tutorial_result(spark):
    return run_plan(spark, _tutorial_plan())


def test_plan_clusters(spark, tutorial_result):
    from pyspark.sql import functions as F

    groups = (
        tutorial_result.canonical.groupBy("canonical_id")
        .agg(F.sort_array(F.collect_set("resource")).alias("members"))
        .collect()
    )
    clusters = {tuple(r["members"]) for r in groups if len(r["members"]) > 1}
    assert clusters == {
        (A + "alice", B + "alice", C + "P001"),
        (B + "charlie", C + "P002"),
    }


def test_plan_population_measures(spark, tutorial_result):
    mm = {
        (r["measure"], r["dataset"], tuple(r["compared_to"])): Decimal(r["value"])
        for r in tutorial_result.measures.where("variable IS NULL").collect()
    }
    assert mm[("count", "d1", ())] == 2
    assert mm[("count", "d2", ())] == 3
    assert mm[("count", "d3", ())] == 4
    assert mm[("absoluteCoverage", "d2", ("d3",))] == 2
    assert mm[("marCompletenessThomas08", "d1", ("d2", "d3"))] == Decimal(
        "0.3076923076923077"
    )
    omissions = {
        (r["affected_dataset"], r["compared_to_resource"])
        for r in tutorial_result.findings.collect()
        if r["kind"] == "resource_omission"
    }
    assert ("d3", B + "william") in omissions  # exclusion kept them apart
    assert ("d2", C + "P004") in omissions


def test_plan_property_findings(spark, tutorial_result):
    findings = tutorial_result.findings.where(
        "kind IN ('deviation', 'value_omission')"
    ).collect()
    devs = {
        (r["variable"], r["affected_dataset"], r["affected_value"],
         r["compared_to_dataset"], r["compared_to_value"])
        for r in findings if r["kind"] == "deviation"
    }
    assert ("pnr", "d1", "45678", "d3", "12345") in devs
    assert ("boss", "d1", A + "bob", "d2", B + "alice") in devs
    assert not any(r["variable"] == "label" for r in findings)
    mm = {
        (r["measure"], r["variable"], r["dataset"], tuple(r["compared_to"])):
            Decimal(r["value"])
        for r in tutorial_result.measures.where("variable IS NOT NULL").collect()
    }
    assert mm[("count", "pnr", "d1", ())] == 2
    assert mm[("absoluteCoverage", "label", "d2", ("d3",))] == 2
    assert ("count", "pnr", "d2", ()) not in mm  # pnr not covered by d2


def test_plan_resume_snapshots(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "plan_store"))
    plan = _tutorial_plan()
    r1 = run_plan(spark, plan, store=store, resume=True)
    n1 = r1.canonical.count()
    assert set(r1.manifests) == {"source1", "source2", "source3"}
    # second run reuses the source snapshots (manifests read, not rewritten)
    r2 = run_plan(spark, plan, store=store, resume=True)
    assert r2.canonical.count() == n1
    assert r2.manifests["source2"] == r1.manifests["source2"]
    # parameter change invalidates the chained token
    plan["steps"][1]["params"]["path"] = f"{RES}/tutorial-source3.ttl"
    assert not store.has("source2", _token_of(plan, "source2"))


def _token_of(plan, step_id):
    from abecto_spark.plans.driver import _step_token, _topo_order

    tokens = {}
    for step in _topo_order(list(plan["steps"])):
        tokens[step["id"]] = _step_token(
            step, [tokens[i] for i in step.get("inputs", [])]
        )
    return tokens[step_id]


def test_plan_errors(spark):
    with pytest.raises(PlanError):
        run_plan(spark, {"steps": [{"id": "x", "processor": "nope"}]})
    with pytest.raises(PlanError):
        run_plan(spark, {"steps": [
            {"id": "a", "processor": "file_source", "inputs": ["b"]},
            {"id": "b", "processor": "file_source", "inputs": ["a"]},
        ]})


def test_plan_forward_rules_step(spark):
    """Transform steps derive triples without duplicating the base relation
    (exceptAll, not a null-keyed anti-join)."""
    EX = "http://example.org/"
    rows = [
        (EX + "s1", EX + "loc", "iri", EX + "n1", None, ""),
        (EX + "n1", EX + "loc", "iri", EX + "r1", None, ""),
        (EX + "s1", EX + "lab", "literal", "one",
         "http://www.w3.org/2001/XMLSchema#string", ""),
    ]
    plan = {
        "aspects": {},
        "steps": [
            {"id": "src", "processor": "file_source", "dataset": "d1",
             "params": {"rows": rows}},
            {"id": "tc", "processor": "forward_rules", "dataset": "d1",
             "inputs": ["src"],
             "params": {"rules":
                        f"[(?a <{EX}loc> ?b) (?b <{EX}loc> ?c) -> (?a <{EX}loc> ?c)]"}},
        ],
    }
    res = run_plan(spark, plan)
    prim = res.primary["d1"]
    assert prim.count() == 4  # 3 base + 1 derived, nothing re-added
    locs = {(r["s"], r["o_value"]) for r in prim.where("p LIKE '%loc'").collect()}
    assert (EX + "s1", EX + "r1") in locs
