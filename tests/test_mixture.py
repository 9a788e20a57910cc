"""Deterministic mixture sampling (operators/mixture.py): partition-
layout independence (the property sampleBy lacks), approximate stratum
fractions, missing-stratum drop, and salt-driven redraws."""

from __future__ import annotations

from pyspark.sql import functions as F

from abecto_spark.operators.mixture import mixture_sample

FRACTIONS = {"a": 0.5, "b": 0.2}


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("lang"),
    )


def test_partition_layout_independence(spark):
    d = _corpus(spark)
    base = {
        r["doc_id"]
        for r in mixture_sample(d, "lang", FRACTIONS, "doc_id").collect()
    }
    shuffled = {
        r["doc_id"]
        for r in mixture_sample(
            d.repartition(17, "lang"), "lang", FRACTIONS, "doc_id"
        ).collect()
    }
    assert base == shuffled  # sampleBy(rand) would fail this
    again = {
        r["doc_id"]
        for r in mixture_sample(d, "lang", FRACTIONS, "doc_id").collect()
    }
    assert base == again


def test_fractions_and_missing_stratum(spark):
    d = _corpus(spark)
    out = mixture_sample(d, "lang", FRACTIONS, "doc_id")
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    per = 2000 / 3
    assert got.get("c", 0) == 0  # not in the mixture → dropped
    assert abs(got["a"] / per - 0.5) < 0.06
    assert abs(got["b"] / per - 0.2) < 0.06


def test_salt_redraws(spark):
    d = _corpus(spark)
    s0 = {
        r["doc_id"]
        for r in mixture_sample(d, "lang", FRACTIONS, "doc_id", salt=0).collect()
    }
    s1 = {
        r["doc_id"]
        for r in mixture_sample(d, "lang", FRACTIONS, "doc_id", salt=1).collect()
    }
    assert s0 != s1
    # both draws still hit the configured fraction
    assert abs(len(s0) - len(s1)) < 0.1 * len(s0)


# ---------------------------------------------------------------------------
# decontamination (operators/decontaminate.py)


def test_ngram_contamination(spark):
    from abecto_spark.operators.decontaminate import ngram_contamination

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four"),
         (3, "tiny")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares the two 3-grams of bench 1 (verbatim copy + tail)
            (10, "alpha beta gamma delta epsilon"),
            # shares exactly one 3-gram with bench 2
            (11, "zero one two three five"),
            # no overlap
            (12, "совершенно other words here entirely"),
            # shorter than n: cannot be flagged
            (13, "one two"),
        ],
        "doc_id long, text string",
    )
    out = ngram_contamination(corpus, bench, n=3)
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"] for r in out.collect()
    }
    assert got == {(10, 1): 2, (11, 2): 1}

    # documents shorter than n on the bench side are invisible too
    out2 = ngram_contamination(corpus, bench.where("doc_id = 3"), n=3)
    assert out2.count() == 0
