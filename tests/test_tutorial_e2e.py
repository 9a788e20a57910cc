"""End-to-end tutorial scenario (the reference's AbectoTest:
`tutorial-configuration.trig` over tutorial-source{1part1,1part2,2,3}.ttl):
3 person datasets → JW mapping (label, 0.9, case-insensitive) with the
predefined correspondsNotToResource exclusion → population + property
comparison. Expectations derived from the fixture data and the reference's
documented semantics (README.md tutorial walkthrough).
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from abecto_spark.model import XSD_INTEGER, XSD_STRING
from abecto_spark.operators.closure import MappingGraph
from abecto_spark.operators.jw_mapping import jw_mapping
from abecto_spark.operators.population import population_comparison
from abecto_spark.operators.property_cmp import property_comparison

A, B, C = "http://example.org/a/", "http://example.org/b/", "http://example.org/c/"
VALUES_DDL = (
    "dataset string, resource string, variable string, o_kind string,"
    " o_value string, o_datatype string, o_lang string"
)


def _tutorial_values(spark):
    rows = [
        # dataset1: label+pnr+boss required by the aspect pattern
        ("d1", A + "alice", "label", "literal", "Alice", XSD_STRING, ""),
        ("d1", A + "alice", "pnr", "literal", "45678", XSD_INTEGER, ""),
        ("d1", A + "alice", "boss", "iri", A + "bob", None, ""),
        ("d1", A + "bill", "label", "literal", "Bill", XSD_STRING, ""),
        ("d1", A + "bill", "pnr", "literal", "67890", XSD_INTEGER, ""),
        ("d1", A + "bill", "boss", "iri", A + "alice", None, ""),
        # dataset2: label required, boss optional, no pnr
        ("d2", B + "alice", "label", "literal", "Alice", XSD_STRING, ""),
        ("d2", B + "alice", "boss", "iri", B + "alice", None, ""),
        ("d2", B + "william", "label", "literal", "William", XSD_STRING, ""),
        ("d2", B + "william", "boss", "literal", "Alice", XSD_STRING, ""),
        ("d2", B + "charlie", "label", "literal", "Charlie", XSD_STRING, ""),
        # dataset3: label+pnr
        ("d3", C + "P001", "label", "literal", "Alice", XSD_STRING, ""),
        ("d3", C + "P001", "pnr", "literal", "12345", XSD_INTEGER, ""),
        ("d3", C + "P002", "label", "literal", "Charlie", XSD_STRING, ""),
        ("d3", C + "P002", "pnr", "literal", "45678", XSD_INTEGER, ""),
        ("d3", C + "P003", "label", "literal", "Dave", XSD_STRING, ""),
        ("d3", C + "P003", "pnr", "literal", "98765", XSD_INTEGER, ""),
        ("d3", C + "P004", "label", "literal", "Williams", XSD_STRING, ""),
        ("d3", C + "P004", "pnr", "literal", "10000", XSD_INTEGER, ""),
    ]
    return spark.createDataFrame(rows, VALUES_DDL)


@pytest.fixture(scope="module")
def tutorial(spark):
    values = _tutorial_values(spark)
    members = values.select("dataset", "resource").distinct()
    g = MappingGraph(spark)
    g.add_incorrespondences(
        spark.createDataFrame([(B + "william", C + "P004")], "src string, dst string")
    )
    edges = jw_mapping(values, ["label"], 0.90, case_sensitive=False, block="cross")
    g.add_correspondences(edges)
    return values, members, g


def test_tutorial_clusters(spark, tutorial):
    _, _, g = tutorial
    clusters = {
        tuple(sorted(r["members"]))
        for r in g.groups().collect()
        if len(r["members"]) > 1
    }
    assert clusters == {
        (A + "alice", B + "alice", C + "P001"),
        (B + "charlie", C + "P002"),
    }


def test_tutorial_population(spark, tutorial):
    values, members, g = tutorial
    m, f = population_comparison(spark, members, g.canonical(), "person",
                                 datasets=["d1", "d2", "d3"])
    mm = {
        (r["measure"], r["dataset"], tuple(r["compared_to"])): Decimal(r["value"])
        for r in m.collect()
    }
    assert mm[("count", "d1", ())] == 2
    assert mm[("count", "d2", ())] == 3
    assert mm[("count", "d3", ())] == 4
    assert mm[("absoluteCoverage", "d1", ("d2",))] == 1
    assert mm[("absoluteCoverage", "d1", ("d3",))] == 1
    assert mm[("absoluteCoverage", "d2", ("d3",))] == 2
    assert mm[("absoluteCoveredness", "d1", ("d2", "d3"))] == 1
    assert mm[("absoluteCoveredness", "d2", ("d1", "d3"))] == 2
    assert mm[("absoluteCoveredness", "d3", ("d1", "d2"))] == 2
    # est population = (2*3 + 2*4 + 3*4) / 4 = 6.5
    assert mm[("marCompletenessThomas08", "d1", ("d2", "d3"))] == Decimal(
        "0.3076923076923077"
    )
    assert mm[("marCompletenessThomas08", "d3", ("d1", "d2"))] == Decimal(
        "0.6153846153846154"
    )
    omissions = {
        (r["affected_dataset"], r["compared_to_resource"])
        for r in f.collect()
        if r["kind"] == "resource_omission"
    }
    # william excluded from P004's cluster -> both reported missing elsewhere
    assert ("d3", B + "william") in omissions
    assert ("d2", C + "P004") in omissions
    assert ("d1", B + "charlie") in omissions


def test_tutorial_property_comparison(spark, tutorial):
    values, members, g = tutorial
    coverage = {
        "label": ["d1", "d2", "d3"],
        "pnr": ["d1", "d3"],
        "boss": ["d1", "d2"],
    }
    m, f = property_comparison(
        spark, values, members, g.canonical(), "person",
        ["label", "pnr", "boss"], coverage=coverage, datasets=["d1", "d2", "d3"],
    )
    findings = f.collect()
    devs = {
        (r["variable"], r["affected_dataset"], r["affected_value"],
         r["compared_to_dataset"], r["compared_to_value"])
        for r in findings if r["kind"] == "deviation"
    }
    # pnr deviation between a:alice (45678) and c:P001 (12345), both ways
    assert ("pnr", "d1", "45678", "d3", "12345") in devs
    assert ("pnr", "d3", "12345", "d1", "45678") in devs
    # boss deviation between a:alice (a:bob) and b:alice (b:alice)
    assert ("boss", "d1", A + "bob", "d2", B + "alice") in devs
    assert ("boss", "d2", B + "alice", "d1", A + "bob") in devs
    # no label findings (all cluster labels equal)
    assert not any(r["variable"] == "label" for r in findings)

    mm = {
        (r["measure"], r["variable"], r["dataset"], tuple(r["compared_to"])): Decimal(
            r["value"]
        )
        for r in m.collect()
    }
    assert mm[("count", "pnr", "d1", ())] == 2
    assert mm[("count", "pnr", "d3", ())] == 4
    assert mm[("absoluteCoverage", "pnr", "d1", ("d3",))] == 0  # same value,
    # different entities: 45678 never matches within a cluster
    assert mm[("absoluteCoverage", "label", "d1", ("d2",))] == 1
    assert mm[("absoluteCoverage", "label", "d2", ("d3",))] == 2
    assert ("count", "pnr", "d2", ()) not in mm  # pnr not covered by d2
