"""Metadata-graph ingestion tests (`Metadata.java:199-228` WrongValue
annotations; predefined correspondence statements as in the tutorial's
manualMappings graph)."""

from __future__ import annotations

from abecto_spark.operators.metadata import (
    AV,
    OA,
    correspondences_from_metadata,
    wrong_values_from_metadata,
)

EX = "http://example.org/"
TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def test_wrong_values_from_metadata(spark):
    rows = [
        ("_:ann1", OA + "hasTarget", "iri", EX + "r1", None, None),
        ("_:ann1", OA + "hasBody", "bnode", "_:b1", None, None),
        ("_:b1", RDF_TYPE, "iri", AV + "WrongValue", None, None),
        ("_:b1", AV + "affectedAspect", "iri", EX + "aspect1", None, None),
        ("_:b1", AV + "affectedValue", "literal", "bogus", XSD_STRING, ""),
        ("_:b1", AV + "affectedVariableName", "literal", "label", XSD_STRING, ""),
        # annotation of a different aspect — filtered by the aspect arg
        ("_:ann2", OA + "hasTarget", "iri", EX + "r2", None, None),
        ("_:ann2", OA + "hasBody", "bnode", "_:b2", None, None),
        ("_:b2", RDF_TYPE, "iri", AV + "WrongValue", None, None),
        ("_:b2", AV + "affectedAspect", "iri", EX + "other", None, None),
        ("_:b2", AV + "affectedValue", "literal", "x", XSD_STRING, ""),
        ("_:b2", AV + "affectedVariableName", "literal", "label", XSD_STRING, ""),
    ]
    t = spark.createDataFrame(rows, TRIPLES_DDL)
    all_wv = {tuple(r) for r in wrong_values_from_metadata(t, "d1").collect()}
    assert all_wv == {
        ("d1", EX + "r1", "label", "bogus"),
        ("d1", EX + "r2", "label", "x"),
    }
    one = {tuple(r) for r in
           wrong_values_from_metadata(t, "d1", aspect=EX + "aspect1").collect()}
    assert one == {("d1", EX + "r1", "label", "bogus")}


def test_correspondences_from_metadata(spark):
    rows = [
        (EX + "a", AV + "correspondsToResource", "iri", EX + "b", None, None),
        (EX + "x", AV + "correspondsNotToResource", "iri", EX + "y", None, None),
        (EX + "a", EX + "other", "iri", EX + "z", None, None),
        (EX + "a", AV + "correspondsToResource", "literal", "junk", None, None),
    ]
    t = spark.createDataFrame(rows, TRIPLES_DDL)
    corr, incorr = correspondences_from_metadata(t)
    assert {tuple(r) for r in corr.collect()} == {(EX + "a", EX + "b")}
    assert {tuple(r) for r in incorr.collect()} == {(EX + "x", EX + "y")}


def test_plan_driver_wrong_values_and_meta(spark, tmp_path):
    """Plan-level wiring: predefined meta file vetoes a link; a wrong-value
    metadata file suppresses the matching deviation finding."""
    from abecto_spark.plans.driver import run_plan

    meta = "\n".join([
        f"<{EX}b/n1> <{AV}correspondsNotToResource> <{EX}c/n1> .",
    ])
    (tmp_path / "meta.nt").write_text(meta + "\n")
    wv = "\n".join([
        f"_:a <{OA}hasTarget> <{EX}c/n2> .",
        f"_:a <{OA}hasBody> _:b .",
        f"_:b <{RDF_TYPE}> <{AV}WrongValue> .",
        f"_:b <{AV}affectedAspect> <{EX}thing> .",
        f'_:b <{AV}affectedValue> "99" .',
        f'_:b <{AV}affectedVariableName> "num" .',
    ])
    (tmp_path / "wv.nt").write_text(wv + "\n")

    def rows(ns):
        return [
            (f"{EX}{ns}/n1", EX + "label", "literal", "Widget", XSD_STRING, ""),
            (f"{EX}{ns}/n1", EX + "num", "literal", "1", XSD_STRING, ""),
            (f"{EX}{ns}/n2", EX + "label", "literal", "Gadget", XSD_STRING, ""),
            (f"{EX}{ns}/n2", EX + "num", "literal", "2" if ns == "b" else "99",
             XSD_STRING, ""),
        ]

    pattern = (
        f"SELECT ?k ?label ?num WHERE {{ ?k <{EX}label> ?label ;"
        f" <{EX}num> ?num }}"
    )
    plan = {
        "aspects": {"thing": {"key_var": "k",
                              "patterns": {"db": pattern, "dc": pattern}}},
        "steps": [
            {"id": "sb", "processor": "file_source", "dataset": "db",
             "params": {"rows": rows("b")}},
            {"id": "sc", "processor": "file_source", "dataset": "dc",
             "params": {"rows": rows("c")}},
            {"id": "jw", "processor": "jw_mapping", "inputs": ["sb", "sc"],
             "params": {"aspect": "thing", "variables": ["label"],
                        "threshold": 0.95,
                        "predefined_meta_path": str(tmp_path / "meta.nt")}},
            {"id": "prop", "processor": "property_comparison", "inputs": ["jw"],
             "params": {"aspect": "thing", "variables": ["num"],
                        "wrong_values_meta": {"dc": str(tmp_path / "wv.nt")}}},
        ],
    }
    res = run_plan(spark, plan)
    # the meta file vetoed the n1 link
    clusters = {
        tuple(sorted((r["resource"], r["canonical_id"])))
        for r in res.canonical.collect()
    }
    assert not any(EX + "b/n1" in c and EX + "c/n1" in c for c in clusters)
    devs = {
        (r["affected_dataset"], r["affected_value"], r["compared_to_value"])
        for r in res.findings.collect() if r["kind"] == "deviation"
    }
    # n2 deviation "2 vs 99" suppressed in db's view (99 is known wrong),
    # the mirrored direction survives
    assert ("db", "2", "99") not in devs
    assert ("dc", "99", "2") in devs
    # ingested wrong values ride on the result for --failOnWrongValue
    assert {tuple(r) for r in res.wrong_values.collect()} == {
        ("dc", EX + "c/n2", "num", "99"),
    }
