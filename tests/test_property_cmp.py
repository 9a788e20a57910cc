"""Property comparison goldens transcribed from the reference's
PropertyComparisonProcessorTest (FIXTURES.md F7): the duplicates × value
overlap matrix (`:354-660`), count semantics (`:1571-1620`), coveredness
corner cases (`:1621-1700`), IRI deviations/omissions (`:1930-1961`),
language exclusion (`:1459-1523`).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from abecto_spark.model import XSD_DOUBLE, XSD_INTEGER, XSD_STRING, RDF_LANG_STRING
from abecto_spark.operators.closure import MappingGraph
from abecto_spark.operators.property_cmp import property_comparison

VALUES_DDL = (
    "dataset string, resource string, variable string, o_kind string,"
    " o_value string, o_datatype string, o_lang string"
)
MEMBERS_DDL = "dataset string, resource string"


def _run(spark, value_rows, member_rows, edges, datasets=None, **kw):
    values = spark.createDataFrame(value_rows, VALUES_DDL)
    members = spark.createDataFrame(member_rows, MEMBERS_DDL)
    g = MappingGraph(spark)
    if edges:
        g.add_correspondences(spark.createDataFrame(edges, "src string, dst string"))
    m, f = property_comparison(
        spark, values, members, g.canonical(), "aspect1",
        kw.pop("variables", ["value"]), datasets=datasets, **kw
    )
    measures = {
        (r["measure"], r["variable"], r["dataset"], tuple(r["compared_to"])): Decimal(r["value"])
        for r in m.collect()
    }
    findings = f.collect()
    return measures, findings


def _scenario(spark, v_s1, v_s2, present_s2, v_s3, v_s4, present_s4):
    # mirrors prepareAndRunComparison (`:973-994`): subjects 1,2 in d1 and
    # 3,4 in d2; all four correspond; membership gated by the present flags
    rows, members = [], [("d1", "s1"), ("d2", "s3")]
    if present_s2:
        members.append(("d1", "s2"))
    if present_s4:
        members.append(("d2", "s4"))
    for v in v_s1:
        rows.append(("d1", "s1", "value", "literal", v, XSD_STRING, ""))
    for v in v_s2:
        rows.append(("d1", "s2", "value", "literal", v, XSD_STRING, ""))
    for v in v_s3:
        rows.append(("d2", "s3", "value", "literal", v, XSD_STRING, ""))
    for v in v_s4:
        rows.append(("d2", "s4", "value", "literal", v, XSD_STRING, ""))
    edges = [("s1", "s2"), ("s1", "s3"), ("s1", "s4")]
    return _run(spark, rows, members, edges, datasets=["d1", "d2"])


def _devs(findings):
    return {
        (r["affected_dataset"], r["affected_resource"], r["affected_value"],
         r["compared_to_dataset"], r["compared_to_resource"], r["compared_to_value"])
        for r in findings if r["kind"] == "deviation"
    }


def _oms(findings):
    return {
        (r["affected_dataset"], r["affected_resource"],
         r["compared_to_dataset"], r["compared_to_resource"], r["compared_to_value"])
        for r in findings if r["kind"] == "value_omission"
    }


def test_duplicates_all_values(spark):
    # `:354-456` — identical duplicated values: no findings, count 4/4,
    # dedup 2/2, coverage 2, relative 1/1, completeness 1/1
    m, f = _scenario(spark, ["value1", "value2"], ["value1", "value2"], True,
                     ["value1", "value2"], ["value1", "value2"], True)
    assert not f
    assert m[("count", "value", "d1", ())] == 4
    assert m[("count", "value", "d2", ())] == 4
    assert m[("deduplicatedCount", "value", "d1", ())] == 2
    assert m[("duplicateCount", "value", "d2", ())] == 2
    assert m[("absoluteCoverage", "value", "d1", ("d2",))] == 2
    assert m[("relativeCoverage", "value", "d1", ("d2",))] == 1
    assert m[("marCompletenessThomas08", "value", "d1", ("d2",))] == 1
    assert m[("marCompletenessThomas08", "value", "d2", ("d1",))] == 1


def test_duplicates_vs_single(spark):
    # `:458-559`
    m, f = _scenario(spark, ["value1"], ["value1"], True, ["value1"], [], False)
    assert not f
    assert m[("count", "value", "d1", ())] == 2
    assert m[("count", "value", "d2", ())] == 1
    assert m[("deduplicatedCount", "value", "d1", ())] == 1
    assert m[("absoluteCoverage", "value", "d1", ("d2",))] == 1
    assert m[("relativeCoverage", "value", "d2", ("d1",))] == 1


def test_duplicates_complementary_values(spark):
    # `:561-660` — same-dataset deviation + cross-dataset omissions
    m, f = _scenario(spark, ["value1"], ["value2"], True,
                     ["value1", "value2"], ["value1", "value2"], True)
    devs = _devs(f)
    assert ("d1", "s1", "value1", "d1", "s2", "value2") in devs
    assert ("d1", "s2", "value2", "d1", "s1", "value1") in devs
    assert len(devs) == 2
    oms = _oms(f)
    assert ("d1", "s1", "d2", "s3", "value2") in oms
    assert ("d1", "s1", "d2", "s4", "value2") in oms
    assert ("d1", "s2", "d2", "s3", "value1") in oms
    assert ("d1", "s2", "d2", "s4", "value1") in oms
    assert len(oms) == 4
    assert m[("count", "value", "d1", ())] == 2
    assert m[("deduplicatedCount", "value", "d1", ())] == 2
    assert m[("absoluteCoverage", "value", "d1", ("d2",))] == 2


def test_counts_value_duplicates_numeric_eq(spark):
    # countsOfDatasetWithValueDuplicates (`:1600-1609`): int 1, int 2,
    # double 1.0 -> count 3, duplicate 1, dedup 2 (cross-type numeric C-EQ)
    rows = [
        ("d1", "r1", "value", "literal", "1", XSD_INTEGER, ""),
        ("d1", "r1", "value", "literal", "2", XSD_INTEGER, ""),
        ("d1", "r1", "value", "literal", "1.0", XSD_DOUBLE, ""),
    ]
    m, _ = _run(spark, rows, [("d1", "r1")], [], datasets=["d1"])
    assert m[("count", "value", "d1", ())] == 3
    assert m[("duplicateCount", "value", "d1", ())] == 1
    assert m[("deduplicatedCount", "value", "d1", ())] == 2


def test_counts_resource_duplicates(spark):
    # countsOfDatasetWithResourceDuplicates (`:1611-1620`)
    rows = [
        ("d1", "r1", "value", "literal", "1", XSD_INTEGER, ""),
        ("d1", "r1", "value", "literal", "2", XSD_INTEGER, ""),
        ("d1", "r2", "value", "literal", "1", XSD_INTEGER, ""),
    ]
    m, _ = _run(spark, rows, [("d1", "r1"), ("d1", "r2")], [("r1", "r2")], datasets=["d1"])
    assert m[("count", "value", "d1", ())] == 3
    assert m[("duplicateCount", "value", "d1", ())] == 1
    assert m[("deduplicatedCount", "value", "d1", ())] == 2


def test_coveredness(spark):
    # coverednessOfDatasets (`:1663-1676`)
    rows = []
    members = []
    for d in ("d1", "d2", "d3"):
        members.append((d, f"{d}r1"))
        rows.append((d, f"{d}r1", "value", "literal", "1", XSD_INTEGER, ""))
        rows.append((d, f"{d}r1", "value", "literal", "2", XSD_INTEGER, ""))
    m, _ = _run(spark, rows, members, [("d1r1", "d2r1")], datasets=["d1", "d2", "d3"])
    assert m[("absoluteCoveredness", "value", "d1", ("d2", "d3"))] == 2
    assert m[("relativeCoveredness", "value", "d1", ("d2", "d3"))] == 1


def test_coveredness_no_correspondences(spark):
    # coverednessOfDatasetsWithoutCorrespondencies (`:1652-1661`)
    rows, members = [], []
    for d in ("d1", "d2", "d3"):
        members.append((d, f"{d}r1"))
        rows.append((d, f"{d}r1", "value", "literal", "1", XSD_INTEGER, ""))
    m, _ = _run(spark, rows, members, [], datasets=["d1", "d2", "d3"])
    assert m[("absoluteCoveredness", "value", "d1", ("d2", "d3"))] == 0
    assert m[("relativeCoveredness", "value", "d1", ("d2", "d3"))] == 0


def test_iri_deviation_and_omission(spark):
    # deviationOfIriValues / omissionOfIriValues (`:1930-1961`)
    rows = [
        ("d1", "r1", "value", "iri", "v12", None, ""),
        ("d1", "r1", "value", "iri", "v13", None, ""),
        ("d2", "r2", "value", "iri", "v22", None, ""),
        ("d2", "r2", "value", "iri", "v23", None, ""),
    ]
    members = [("d1", "r1"), ("d2", "r2")]
    m, f = _run(spark, rows, members, [("r1", "r2"), ("v12", "v22")], datasets=["d1", "d2"])
    devs = _devs(f)
    assert ("d1", "r1", "v13", "d2", "r2", "v23") in devs
    assert not any(x[2] == "v12" or x[5] == "v22" for x in devs)

    # omission variant: d2 lacks the second value
    rows2 = rows[:3]
    m2, f2 = _run(spark, rows2, members, [("r1", "r2"), ("v12", "v22")], datasets=["d1", "d2"])
    oms = _oms(f2)
    assert ("d2", "r2", "d1", "r1", "v13") in oms
    assert len(oms) == 1


def test_language_exclusion(spark):
    # `:1459-1523` — with pattern ("",) lang-tagged strings are excluded
    rows = [
        ("d1", "r1", "value", "literal", "plain", XSD_STRING, ""),
        ("d1", "r1", "value", "literal", "tagged", RDF_LANG_STRING, "en"),
        ("d2", "r2", "value", "literal", "plain", XSD_STRING, ""),
    ]
    members = [("d1", "r1"), ("d2", "r2")]
    m, f = _run(
        spark, rows, members, [("r1", "r2")], datasets=["d1", "d2"],
        language_filter_patterns=("",),
    )
    assert m[("count", "value", "d1", ())] == 1  # tagged value excluded
    assert m[("absoluteCoverage", "value", "d1", ("d2",))] == 1
    assert not f


def test_wrong_value_suppression(spark):
    # `:459-463` — findings whose compared value is annotated WrongValue
    # in the input metadata are suppressed
    rows = [
        ("d1", "r1", "value", "literal", "good", XSD_STRING, ""),
        ("d2", "r2", "value", "literal", "bad", XSD_STRING, ""),
    ]
    members = [("d1", "r1"), ("d2", "r2")]
    wrong = spark.createDataFrame(
        [("d2", "r2", "value", "bad")],
        "dataset string, resource string, variable string, o_value string",
    )
    values = spark.createDataFrame(rows, VALUES_DDL)
    mem = spark.createDataFrame(members, MEMBERS_DDL)
    g = MappingGraph(spark)
    g.add_correspondences(spark.createDataFrame([("r1", "r2")], "src string, dst string"))
    _, f = property_comparison(
        spark, values, mem, g.canonical(), "aspect1", ["value"],
        wrong_values=wrong, datasets=["d1", "d2"],
    )
    found = f.collect()
    # deviation "good vs bad" suppressed in d1's view (compared value is
    # known wrong), but the mirrored one (compared value "good") survives
    devs = _devs(found)
    assert ("d1", "r1", "good", "d2", "r2", "bad") not in devs
    assert ("d2", "r2", "bad", "d1", "r1", "good") in devs


def test_variable_coverage_gap(spark):
    # countsAtSingleDatasetWithVariable (`:1304-1410`): variable only
    # covered by d1 -> no count row for d2, no coverage rows at all
    rows = [("d1", "s1", "value", "literal", "value1", XSD_STRING, "")]
    members = [("d1", "s1"), ("d2", "s3")]  # presentR2D1/R2D2 = false
    m, f = _run(
        spark, rows, members,
        [("s1", "s2"), ("s1", "s3"), ("s1", "s4")],
        datasets=["d1", "d2"], coverage={"value": ["d1"]},
    )
    assert m[("count", "value", "d1", ())] == 1
    assert ("count", "value", "d2", ()) not in m
    assert not any(k[0] == "absoluteCoverage" for k in m)
    assert not f


def test_salted_pair_join_identical_findings(spark):
    # a 60-member cluster across 3 datasets with per-resource values;
    # pair_salt_cap=10 forces k=6 triangle tasks — findings must be
    # identical to the unsalted (single-task) join
    rows, members, edges = [], [], []
    for i in range(60):
        d = f"d{i % 3}"
        r = f"r{i:03d}"
        members.append((d, r))
        rows.append((d, r, "value", "literal", f"v{i % 7}", XSD_STRING, ""))
        if i:
            edges.append(("r000", r))
    base = dict(
        value_rows=rows, member_rows=members, edges=edges,
        datasets=["d0", "d1", "d2"],
    )
    _, f_salted = _run(spark, **base, pair_salt_cap=10)
    _, f_plain = _run(spark, **base, pair_salt_cap=10**9)

    def norm(fs):
        return sorted(
            (r["kind"], r["variable"], r["affected_dataset"], r["affected_resource"],
             r["affected_value"], r["compared_to_dataset"], r["compared_to_resource"],
             r["compared_to_value"])
            for r in fs
        )

    assert norm(f_salted) == norm(f_plain)
    assert len(f_salted) > 0


def test_mega_group_pair_join_bounded(spark):
    # one 3000-member hub cluster: the salted triangle join splits the
    # |group|^2 pair space across ceil(n/cap)^2/2 tasks instead of one
    # straggler; identical values => zero findings, but the full pair
    # stream is materialized by the anti-joins
    from abecto_spark.operators.property_cmp import _group_pairs

    n = 3000
    gmem = spark.range(n).select(
        F.lit("hub").alias("group_id"),
        F.concat(F.lit("d"), (F.col("id") % 2).cast("string")).alias("dataset"),
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("resource"),
        F.lit(True).alias("grouped"),
    )
    # every unordered pair exactly once: cross-dataset pairs in dataset
    # order, same-dataset pairs in resource order
    got = _group_pairs(gmem.drop("grouped"), pair_cap=500).count()
    assert got == n * (n - 1) // 2
