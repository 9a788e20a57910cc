"""Population comparison golden: the exact 3-dataset fixture of the
reference's PopulationComparisonProcessorTest
(`processor/PopulationComparisonProcessorTest.java:49-288`, FIXTURES.md F8).
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from abecto_spark.operators.closure import MappingGraph
from abecto_spark.operators.population import population_comparison


ASPECT_MEMBERS = {
    # aspect -> dataset -> members (from inputPrimaryModel1..3, :51-71)
    "aspect1": {
        "d1": ["s111", "s112", "s113", "s114"],
        "d2": ["s211", "s212"],
        "d3": ["s315"],
    },
    "aspect2": {
        "d1": ["s121", "s122", "s123", "s124"],
        "d2": ["s221", "s2211", "s222"],
        "d3": ["s325"],
    },
    "aspect3": {"d1": ["s131"], "d2": ["s232"], "d3": ["s333"]},
}
EDGES = [
    ("s111", "s211"),
    ("s112", "s212"),
    ("s121", "s221"),
    ("s121", "s2211"),
    ("s122", "s222"),
    ("s221", "s2211"),
]


@pytest.fixture(scope="module")
def results(spark):
    g = MappingGraph(spark)
    g.add_correspondences(spark.createDataFrame(EDGES, "src string, dst string"))
    canonical = g.canonical()
    out = {}
    for aspect, by_ds in ASPECT_MEMBERS.items():
        members = spark.createDataFrame(
            [(d, r) for d, rs in by_ds.items() for r in rs],
            "dataset string, resource string",
        )
        m, f = population_comparison(
            spark, members, canonical, aspect, datasets=["d1", "d2", "d3"]
        )
        out[aspect] = (
            {
                (r["measure"], r["dataset"], tuple(r["compared_to"])): Decimal(r["value"])
                for r in m.collect()
            },
            f.collect(),
        )
    return out


def _m(results, aspect, measure, dataset, compared_to):
    return results[aspect][0][(measure, dataset, tuple(compared_to))]


def test_absolute_coverage(results):
    # :105-146
    assert _m(results, "aspect1", "absoluteCoverage", "d1", ["d2"]) == 2
    assert _m(results, "aspect2", "absoluteCoverage", "d1", ["d2"]) == 2
    assert _m(results, "aspect3", "absoluteCoverage", "d1", ["d2"]) == 0
    assert _m(results, "aspect1", "absoluteCoverage", "d2", ["d1"]) == 2
    for a in ("aspect1", "aspect2", "aspect3"):
        assert _m(results, a, "absoluteCoverage", "d1", ["d3"]) == 0
        assert _m(results, a, "absoluteCoverage", "d3", ["d1"]) == 0
        assert _m(results, a, "absoluteCoverage", "d2", ["d3"]) == 0
        assert _m(results, a, "absoluteCoverage", "d3", ["d2"]) == 0


def test_relative_coverage(results):
    # :149-191
    assert _m(results, "aspect1", "relativeCoverage", "d1", ["d2"]) == 1
    assert _m(results, "aspect2", "relativeCoverage", "d1", ["d2"]) == 1
    assert _m(results, "aspect1", "relativeCoverage", "d2", ["d1"]) == Decimal("0.5")
    assert _m(results, "aspect2", "relativeCoverage", "d2", ["d1"]) == Decimal("0.5")
    assert _m(results, "aspect1", "relativeCoverage", "d1", ["d3"]) == 0
    assert _m(results, "aspect3", "relativeCoverage", "d3", ["d2"]) == 0


def test_counts(results):
    # :241-262
    expect = {
        ("aspect1", "d1"): 4, ("aspect1", "d2"): 2, ("aspect1", "d3"): 1,
        ("aspect2", "d1"): 4, ("aspect2", "d2"): 2, ("aspect2", "d3"): 1,
        ("aspect3", "d1"): 1, ("aspect3", "d2"): 1, ("aspect3", "d3"): 1,
    }
    for (a, d), v in expect.items():
        assert _m(results, a, "deduplicatedCount", d, []) == v, (a, d)


def test_completeness(results):
    # :265-287 — scale-16 mark-and-recapture decimals
    assert _m(results, "aspect1", "marCompletenessThomas08", "d1", ["d2", "d3"]) == Decimal(
        "0.5714285714285714"
    )
    assert _m(results, "aspect2", "marCompletenessThomas08", "d2", ["d1", "d3"]) == Decimal(
        "0.2857142857142857"
    )
    assert _m(results, "aspect1", "marCompletenessThomas08", "d3", ["d1", "d2"]) == Decimal(
        "0.1428571428571429"
    )
    # absent for aspect3 (zero total overlap)
    assert not any(
        k[0] == "marCompletenessThomas08" for k in results["aspect3"][0]
    )


def test_omissions(results):
    # :194-230 — counts per affected dataset across aspects
    per_ds = {"d1": 0, "d2": 0, "d3": 0}
    om = set()
    for a in ASPECT_MEMBERS:
        for r in results[a][1]:
            if r["kind"] == "resource_omission":
                per_ds[r["affected_dataset"]] += 1
                om.add(
                    (a, r["affected_dataset"], r["compared_to_dataset"], r["compared_to_resource"])
                )
    assert per_ds == {"d1": 4, "d2": 8, "d3": 15}
    assert ("aspect3", "d1", "d2", "s232") in om
    assert ("aspect1", "d2", "d1", "s113") in om
    assert ("aspect2", "d3", "d2", "s2211") in om


def test_duplicates(results):
    # :233-238
    dups = [
        (r["affected_dataset"], r["affected_resource"], r["compared_to_resource"])
        for a in ASPECT_MEMBERS
        for r in results[a][1]
        if r["kind"] == "resource_duplicate"
    ]
    assert sorted(dups) == [("d2", "s221", "s2211"), ("d2", "s2211", "s221")]
