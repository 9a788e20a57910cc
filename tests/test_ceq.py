"""C-EQ canonicalization golden matrix transcribed from the reference's
`util/LiteralsTest.java:31-258` plus the lang-tag/time-skip behavior of
`PropertyComparisonProcessor.java:287-300`: two literals are equivalent iff
their value_eq_key matches (FIXTURES.md F6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from abecto_spark.functions.ceq import value_eq_key
from abecto_spark.model import (
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_INTEGER,
    XSD_STRING,
    RDF_LANG_STRING,
)

I, D, FL, DB = XSD_INTEGER, XSD_DECIMAL, XSD_FLOAT, XSD_DOUBLE

# (lex1, dt1, lang1, lex2, dt2, lang2, lang_skip, time_skip, equivalent)
MATRIX = [
    # numeric tower (`LiteralsTest.java:34-60`)
    ("-5", I, "", "-5", I, "", 0, 0, True),
    ("-5", I, "", "-5", D, "", 0, 0, True),
    ("-5", I, "", "-5", FL, "", 0, 0, True),
    ("-5", I, "", "-5", DB, "", 0, 0, True),
    ("-5.0", D, "", "-5.0", FL, "", 0, 0, True),
    ("-5.0", D, "", "-5", I, "", 0, 0, True),
    ("4.2E9", FL, "", "4.2e9", FL, "", 0, 0, True),
    ("0.0042", FL, "", "4.2e-3", FL, "", 0, 0, True),
    # float exactly representable -> equals double (`:59`)
    ("4.2E9", FL, "", "4.2E9", DB, "", 0, 0, True),
    # beyond float precision (`:157-158`, README's 0.1 trap)
    ("0.001", FL, "", "0.001e0", DB, "", 0, 0, False),
    ("0.1", D, "", "0.1", FL, "", 0, 0, False),
    # specials (`:63-87`)
    ("NaN", DB, "", "NaN", FL, "", 0, 0, True),
    ("INF", DB, "", "INF", FL, "", 0, 0, True),
    ("-INF", FL, "", "-INF", DB, "", 0, 0, True),
    ("INF", DB, "", "-INF", DB, "", 0, 0, False),
    ("true", XSD_BOOLEAN, "", "false", XSD_BOOLEAN, "", 0, 0, False),
    ("true", XSD_BOOLEAN, "", "1", XSD_BOOLEAN, "", 0, 0, True),
    # plain mismatches (`:90-98`)
    ("-4", I, "", "-5", I, "", 0, 0, False),
    ("-4.0", D, "", "-5.0", FL, "", 0, 0, False),
    # same-type literals (`:173-179`)
    ("value", XSD_STRING, "", "value", XSD_STRING, "", 0, 0, True),
    ("value1", XSD_STRING, "", "value2", XSD_STRING, "", 0, 0, False),
    # dates with allowTimeSkip (`:193-199`)
    ("2000-01-01", XSD_DATE, "", "2000-01-01T00:00:00", XSD_DATETIME, "", 0, 1, True),
    ("2000-01-01", XSD_DATE, "", "2000-01-01T17:00:00", XSD_DATETIME, "", 0, 1, True),
    ("2000-01-02", XSD_DATE, "", "2000-01-01T00:00:00", XSD_DATETIME, "", 0, 1, False),
    ("2000-01-01", XSD_DATE, "", "2000-01-01T17:00:00", XSD_DATETIME, "", 0, 0, False),
    # lang tags (`:215-225`) — equivalent only when lang-skip is on
    ("value", RDF_LANG_STRING, "en", "value", RDF_LANG_STRING, "en", 0, 0, True),
    ("value", RDF_LANG_STRING, "en", "value", RDF_LANG_STRING, "de", 0, 0, False),
    ("value", RDF_LANG_STRING, "en", "value", RDF_LANG_STRING, "de", 1, 0, True),
    ("value", RDF_LANG_STRING, "en", "value", XSD_STRING, "", 1, 0, True),
    ("value", RDF_LANG_STRING, "en", "value", XSD_STRING, "", 0, 0, False),
    ("value1", RDF_LANG_STRING, "en", "value2", RDF_LANG_STRING, "en", 1, 0, False),
    # string vs number never equivalent
    ("5", XSD_STRING, "", "5", I, "", 0, 0, False),
]


@pytest.mark.parametrize("lang_skip,time_skip", [(0, 0), (1, 0), (0, 1)])
def test_eq_matrix(spark, lang_skip, time_skip):
    rows = [
        (i, lex1, dt1, l1, lex2, dt2, l2, bool(eq))
        for i, (lex1, dt1, l1, lex2, dt2, l2, ls, ts, eq) in enumerate(MATRIX)
        if (ls, ts) == (lang_skip, time_skip)
    ]
    if not rows:
        pytest.skip("no cases for this flag combo")
    df = spark.createDataFrame(
        rows,
        "id int, lex1 string, dt1 string, lang1 string,"
        " lex2 string, dt2 string, lang2 string, expected boolean",
    )
    out = df.select(
        "id",
        "expected",
        value_eq_key(
            F.lit("literal"), F.col("lex1"), F.col("dt1"), F.col("lang1"),
            allow_lang_tag_skip=bool(lang_skip), allow_time_skip=bool(time_skip),
        ).alias("k1"),
        value_eq_key(
            F.lit("literal"), F.col("lex2"), F.col("dt2"), F.col("lang2"),
            allow_lang_tag_skip=bool(lang_skip), allow_time_skip=bool(time_skip),
        ).alias("k2"),
    ).collect()
    for r in out:
        case = MATRIX[r["id"]]
        assert (r["k1"] == r["k2"]) == r["expected"], (case, r["k1"], r["k2"])


def test_resource_keys_use_canonical(spark):
    df = spark.createDataFrame(
        [("iri", "http://x/a", None, None, "c1"), ("iri", "http://x/b", None, None, "c1"),
         ("iri", "http://x/c", None, None, None)],
        "o_kind string, o_value string, o_datatype string, o_lang string, canon string",
    )
    keys = [
        r[0]
        for r in df.select(
            value_eq_key(
                F.col("o_kind"), F.col("o_value"), F.col("o_datatype"),
                F.col("o_lang"), canonical_id=F.col("canon"),
            )
        ).collect()
    ]
    assert keys[0] == keys[1] == "res:c1"
    assert keys[2] == "res:http://x/c"
