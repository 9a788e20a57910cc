"""FunctionalMapping, EquivalentValueMapping and UsePresentMapping goldens
(`processor/FunctionalMappingProcessorTest.java:41-143` / FIXTURES.md F5,
`processor/EquivalentValueMappingProcessorTest.java:72-218` / F9,
`processor/UsePresentMappingProcessorTest.java`).
"""

from __future__ import annotations

from abecto_spark.operators.closure import MappingGraph, connected_components
from abecto_spark.operators.eq_mapping import equivalent_value_mapping
from abecto_spark.operators.fn_mapping import functional_mapping
from abecto_spark.operators.present_mapping import use_present_mapping

XSD_STR = "http://www.w3.org/2001/XMLSchema#string"
VALUES_DDL = (
    "dataset string, resource string, variable string, o_kind string,"
    " o_value string, o_datatype string, o_lang string"
)


def _clusters_with(edges):
    cc = connected_components(edges)
    return {
        tuple(sorted(r[1]))
        for r in cc.groupBy("canonical_id").agg({"resource": "collect_set"}).collect()
    }


def test_functional_mapping(spark):
    # FunctionalMappingProcessorTest fixture: referring resources point via
    # `value` to referred resources; literal values -> Invalid Value issues
    def rows(ds, triples):
        return [
            (ds, f"r{s}", "value", kind, f"r{o}" if kind == "iri" else o, XSD_STR, "")
            for s, kind, o in triples
        ]

    referring = spark.createDataFrame(
        rows(
            "d1",
            [
                (111, "iri", 141), (112, "iri", 142), (113, "iri", 143),
                (121, "literal", "some literal"), (122, "literal", "some literal"),
                (123, "literal", "some literal"),
                (131, "iri", 151), (131, "iri", 161),
                (132, "iri", 152), (132, "iri", 162),
                (133, "iri", 153), (133, "iri", 163),
            ],
        )
        + rows(
            "d2",
            [
                (211, "iri", 241), (212, "iri", 242), (213, "iri", 243),
                (221, "literal", "some literal"), (222, "literal", "some literal"),
                (223, "literal", "some literal"),
                (231, "iri", 251), (231, "iri", 261),
                (232, "iri", 252), (232, "iri", 262),
                (233, "iri", 253), (233, "iri", 263),
            ],
        ),
        VALUES_DDL,
    )
    prior = spark.createDataFrame(
        [
            ("r111", "r211"), ("r121", "r212"), ("r131", "r213"),
            ("r112", "r221"), ("r122", "r222"), ("r132", "r223"),
            ("r113", "r231"), ("r123", "r232"), ("r133", "r233"),
        ],
        "src string, dst string",
    )
    g = MappingGraph(spark)
    g.add_correspondences(prior)
    edges, issues = functional_mapping(referring, "value", g.canonical(), aspect="aspect1")

    got = _clusters_with(edges)
    expect = {
        ("r141", "r241"),
        ("r151", "r161", "r243"),
        ("r152", "r162"),
        ("r143", "r251", "r261"),
        ("r252", "r262"),
        ("r153", "r163", "r253", "r263"),
    }
    assert expect <= got
    # no unexpected multi-clusters beyond expected + singletons
    assert {c for c in got if len(c) > 1} == expect

    iss = {(r["affected_dataset"], r["affected_resource"]) for r in issues.collect()}
    assert iss == {
        ("d1", "r121"), ("d1", "r122"), ("d1", "r123"),
        ("d2", "r221"), ("d2", "r222"), ("d2", "r223"),
    }


def test_equivalent_value_mapping(spark):
    # EquivalentValueMappingProcessorTest.java:73-218 condensed matrix
    some, other = "some literal", "other literal"
    rows = []

    def add(case, ds, var, kind, val):
        rows.append((f"d{ds}", f"case{case:02d}-dataset{ds}", var, kind, val, XSD_STR, ""))

    lit_cases = {
        1: ([some] * 3, [other] * 3, False),
        2: ([some] * 3, [some, other, other], False),
        3: ([some] * 3, [some, some, other], False),
        4: ([some] * 3, [some] * 3, True),
    }
    for c, (v1, v2, _) in lit_cases.items():
        for i, x in enumerate(v1):
            add(c, 1, f"variable{i+1}", "literal", x)
        for i, x in enumerate(v2):
            add(c, 2, f"variable{i+1}", "literal", x)
    res_cases = {
        5: (["some"] * 3, ["other"] * 3, False),
        6: (["some"] * 3, ["some", "other", "other"], False),
        8: (["some"] * 3, ["some"] * 3, True),
        10: (["some"] * 3, ["equivalent", "other", "other"], False),
        12: (["some"] * 3, ["equivalent"] * 3, True),
    }
    for c, (v1, v2, _) in res_cases.items():
        for i, x in enumerate(v1):
            add(c, 1, f"variable{i+1}", "iri", x)
        for i, x in enumerate(v2):
            add(c, 2, f"variable{i+1}", "iri", x)
    # case13: multi-valued, one equivalent value per variable suffices
    for i in range(3):
        add(13, 1, f"variable{i+1}", "literal", some)
        add(13, 2, f"variable{i+1}", "literal", other)
        add(13, 2, f"variable{i+1}", "literal", some)
    # case14: variable3 unbound on both sides -> never equivalent
    for i in range(2):
        add(14, 1, f"variable{i+1}", "iri", "some")
        add(14, 2, f"variable{i+1}", "iri", "equivalent")

    values = spark.createDataFrame(rows, VALUES_DDL)
    g = MappingGraph(spark)
    g.add_correspondences(
        spark.createDataFrame([("some", "equivalent")], "src string, dst string")
    )
    edges = equivalent_value_mapping(
        values, ["variable1", "variable2", "variable3"], g.canonical()
    )
    got = {tuple(sorted(r)) for r in edges.collect()}
    # the reference asserts correspondence per same-case pair
    # (`EquivalentValueMappingProcessorTest.java:204-217`); resources of
    # different cases with identical value tuples also correspond (the
    # processor indexes by value tuple, not by case)
    for c in (4, 8, 12, 13):
        assert (f"case{c:02d}-dataset1", f"case{c:02d}-dataset2") in got, c
    for c in (1, 2, 3, 5, 6, 7, 9, 10, 11, 14):
        assert (f"case{c:02d}-dataset1", f"case{c:02d}-dataset2") not in got, c


def test_use_present_mapping(spark):
    values = spark.createDataFrame(
        [
            ("d1", "a1", "link", "iri", "b1", None, ""),
            ("d1", "a2", "link", "literal", "oops", XSD_STR, ""),
            ("d1", "a3", "other", "iri", "b3", None, ""),
        ],
        VALUES_DDL,
    )
    edges, issues = use_present_mapping(values, "link", aspect="aspect1")
    assert {tuple(r) for r in edges.collect()} == {("a1", "b1")}
    assert {r["affected_resource"] for r in issues.collect()} == {"a2"}
