"""Gopher-style repetition signals (operators/repetition.py): exact
hand-computed values per signal, the line-duplication path the synthetic
parquet corpus cannot exercise (it has no newlines), and a DuckDB parity
replay of the driver oracle's definitions over newline-bearing docs."""

from __future__ import annotations

import duckdb
import pytest

from abecto_spark.operators.repetition import repetition_signals

DOCS = [
    # top bigram "a b" x3 (9 chars of 13); with dup_ngram=2 the
    # duplicated bigrams are "a b" x3 + "b a" x2 → 15/13
    (1, "a b a b a b c"),
    # all-unique bigrams tie at cnt=1/len=3 → lexicographically largest
    (2, "x y z"),
    # 4 non-empty lines, "l1" x3: dup_line_frac=(4-2)/4, line chars
    # 8, duplicated line chars 6
    (3, "l1\nl2\nl1\nl1\n"),
    (4, ""),
    # overlap-unaware coverage may exceed 1 by design (uncapped, as in
    # the Gopher definition): "w w" x5 → 15/11
    (5, "w w w w w w"),
]


@pytest.fixture(scope="module")
def signals(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = repetition_signals(df, top_ngram=2, dup_ngram=2).collect()
    return {r["doc_id"]: r for r in out}


def test_top_ngram_coverage(signals):
    assert signals[1]["top_ngram"] == "a b"
    assert signals[1]["top_ngram_char_frac"] == pytest.approx(9 / 13, abs=1e-6)
    # deterministic tie-break: (count, length, value) descending
    assert signals[2]["top_ngram"] == "y z"
    assert signals[5]["top_ngram_char_frac"] == pytest.approx(15 / 11, abs=1e-6)


def test_dup_ngram_coverage(signals):
    assert signals[1]["dup_ngram_char_frac"] == pytest.approx(15 / 13, abs=1e-6)
    assert signals[2]["dup_ngram_char_frac"] == 0.0


def test_dup_line_fractions(signals):
    assert signals[3]["dup_line_frac"] == 0.5
    assert signals[3]["dup_line_char_frac"] == 0.75
    assert signals[1]["dup_line_frac"] == 0.0  # single-line doc


def test_empty_document(signals):
    r = signals[4]
    assert r["top_ngram"] == ""
    assert (
        r["dup_line_frac"], r["dup_line_char_frac"],
        r["top_ngram_char_frac"], r["dup_ngram_char_frac"],
    ) == (0.0, 0.0, 0.0, 0.0)


def test_duckdb_parity_with_newlines(spark):
    """The driver oracle runs on the newline-free parquet corpus; this
    replays its exact SQL (dup_ngram=5) over docs WITH duplicated lines
    so the line-signal branch is oracle-verified too."""
    from abecto_spark.plans.entry_queries import ORACLES

    rows = [
        (1, "the cat sat\nthe dog ran\nthe cat sat\nthe cat sat"),
        (2, "a b c d e a b c d e a b c d e"),
        (3, "solo line"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in repetition_signals(df, top_ngram=2, dup_ngram=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows).replace("\n", "' || chr(10) || '")
        + ") AS v(doc_id, text)"
    )
    want = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["repetition_signals"]).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][2] == want[k][2], k  # top_ngram
        for g, w in zip(
            (got[k][0], got[k][1], got[k][3], got[k][4]),
            (want[k][0], want[k][1], want[k][3], want[k][4]),
        ):
            assert g == pytest.approx(w, abs=1e-6), k
