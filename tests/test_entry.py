"""Driver-contract conformance: every queries() entry with an oracle must
match DuckDB on row count, sorted-column schema, and order-insensitive
values at sf0.01 — the same comparison the round driver runs.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = con.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0].lower() for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    sn = _normalize(srows, scols)
    on = _normalize(orows, ocols)
    mismatches = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b]
    assert not mismatches, f"{name}: first diff {sn[mismatches[0]]} vs {on[mismatches[0]]}"


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_rows_only_queries_run(spark):
    # queries without an oracle still must run and return a DataFrame
    oracles = set(entry_mod.oracle_sql())
    for name, q in entry_mod.queries().items():
        if name not in oracles:
            df = q(spark, SF_DIR)
            assert df.count() >= 0, name
