"""Tests for the round-5 training-data additions: BM25 retrieval,
unigram-LM quality scoring, sequence chunking/packing, and SemDeDup
embedding-cluster dedup.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from abecto_spark.operators.chunk import chunk_documents, pack_contiguous
from abecto_spark.operators.dedup import semdedup
from abecto_spark.operators.lm_quality import unigram_logprob
from abecto_spark.operators.search import bm25_topk


def _bm25_expected(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    out = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if not tf or not df[q]:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s:
            out[d] = round(s, 6)
    return out


def test_bm25_scores_match_reference_formula(spark):
    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry cherry"),
        (4, "durian elderberry fig"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_topk(df, "apple cherry", k=10).collect()}
    assert got == _bm25_expected(docs, ["apple", "cherry"])


def test_bm25_rank_is_deterministic_on_ties(spark):
    # two docs with identical token bags -> identical rounded scores;
    # the tie must break by doc_id ascending
    docs = [(10, "x y"), (2, "x y"), (5, "z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bm25_topk(df, "x", k=5).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [2, 10]
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].score == rows[1].score


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "   ")


def test_unigram_logprob_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # counts: a=2 b=2 c=1, total=5
    exp = {
        1: round((2 * math.log(5 / 2) + math.log(5 / 2)) / 3, 6),
        2: round((math.log(5 / 2) + math.log(5)) / 2, 6),
    }
    got = {r.doc_id: r.avg_nll for r in unigram_logprob(df).collect()}
    assert got == exp
    n = {r.doc_id: r.n_tokens for r in unigram_logprob(df).collect()}
    assert n == {1: 3, 2: 2}


def test_unigram_logprob_hot_split_is_invisible(spark):
    rows = [(i, f"the quick tok{i} the") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    all_hot = {(r.doc_id, r.avg_nll) for r in unigram_logprob(df, hot_k=1000).collect()}
    split = {(r.doc_id, r.avg_nll) for r in unigram_logprob(df, hot_k=1).collect()}
    assert all_hot == split


def test_chunk_documents_window_stride(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    out = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, window=4, stride=3).collect()
    }
    assert len(out) == 4  # offsets 0, 3, 6, 9; empty doc yields nothing
    assert out[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert out[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert out[(1, 3)] == ("t9", 1)


def test_chunk_documents_default_stride_and_case(spark):
    df = spark.createDataFrame([(1, "Alpha Beta Gamma")], "doc_id long, text string")
    rows = chunk_documents(df, window=2).orderBy("chunk_idx").collect()
    assert [(r.chunk_text, r.n_tokens) for r in rows] == [
        ("Alpha Beta", 2),
        ("Gamma", 1),
    ]


def test_pack_contiguous_bins(spark):
    rows = [(i, " ".join(["w"] * 4)) for i in range(1, 5)]  # 4 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.bin
        for r in pack_contiguous(df, budget=10, n_shards=1).collect()
    }
    # cum_before: 0, 4, 8, 12 -> bins 0, 0, 0, 1
    assert out == {1: 0, 2: 0, 3: 0, 4: 1}


def test_pack_contiguous_shards_are_portable_hash(spark):
    df = spark.createDataFrame([(7, "a b c")], "doc_id long, text string")
    r = pack_contiguous(df, budget=100, n_shards=8).collect()[0]
    assert r.shard == ((7 * 2654435761) % (1 << 32)) % 8
    assert r.n_tokens == 3 and r.bin == 0


def test_semdedup_drops_later_cluster_mates(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.01]),   # near-dup of 1 (same cell) -> dropped
        (3, [0.0, 1.0]),
        (4, [-0.01, 0.999]),  # near-dup of 3 (same cell) -> dropped
        (5, [0.6, 0.58]),     # alone in its neighborhood -> kept
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    kept = {r.vec_id for r in semdedup(df, cents, tau=0.99).collect()}
    assert kept == {1, 3, 5}


def test_semdedup_is_cluster_local_by_design(spark):
    # a >=tau pair split across two cells is NOT dropped: the operator
    # trades that recall for never comparing across cell boundaries —
    # the documented SemDeDup approximation
    df = spark.createDataFrame(
        [(1, [0.72, 0.70]), (2, [0.70, 0.72])],
        "vec_id long, embedding array<float>",
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    kept = {r.vec_id for r in semdedup(df, cents, tau=0.99).collect()}
    assert kept == {1, 2}


def test_chunk_reassembly_property(spark):
    """stride == window ⇒ concatenating a doc's chunks in order restores
    the exact token sequence — over 50 seeded-random documents."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(50):
        n = rng.randint(0, 37)
        rows.append((i, " ".join(f"w{rng.randint(0, 9)}x{j}" for j in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, window=7).orderBy("doc_id", "chunk_idx").collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.chunk_text)
    for i, text in rows:
        if text:
            assert " ".join(got[i]) == text, i
        else:
            assert i not in got


def test_pack_contiguous_matches_python_replay(spark):
    import random

    rng = random.Random(7)
    rows = [(i, " ".join(["t"] * rng.randint(0, 30))) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.shard, r.bin, r.n_tokens)
        for r in pack_contiguous(df, budget=40, n_shards=4).collect()
    }
    # python replay
    shards = {}
    for i, text in rows:
        s = ((i * 2654435761) % (1 << 32)) % 4
        shards.setdefault(s, []).append((i, len(text.split()) if text else 0))
    for s, docs in shards.items():
        cum = 0
        for i, n in sorted(docs):
            assert got[i] == (s, cum // 40, n), i
            cum += n


def test_mixture_upsample_multiplicities(spark):
    from abecto_spark.operators.mixture import mixture_upsample

    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_upsample(df, "lang", {"en": 2.25, "de": 0.5}, "doc_id", salt=1)
    got = {}
    for r in out.collect():
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    for i, lang in rows:
        w = {"en": 2.25, "de": 0.5}.get(lang, 0.0)
        u = (((i + 1) * 2654435761) % (1 << 32)) / float(1 << 32)
        exp = int(w) + (1 if u < w - int(w) else 0)
        assert got.get(i, 0) == exp, (i, lang)
    # copy column enumerates 1..n
    copies = {}
    for r in out.collect():
        copies.setdefault(r.doc_id, set()).add(r.copy)
    for i, c in copies.items():
        assert c == set(range(1, len(c) + 1))


def test_incremental_exact_dedup(spark):
    from abecto_spark.operators.dedup import incremental_exact_dedup

    seen_docs = spark.createDataFrame(
        [(1, "old news here today")], "doc_id long, text string"
    )
    from abecto_spark.functions.text import fingerprint

    seen = seen_docs.select(fingerprint(F.col("text")).alias("fingerprint"))
    batch = spark.createDataFrame(
        [
            (10, "old news here today"),      # already in the store -> dropped
            (11, "fresh content alpha"),       # admitted
            (12, "fresh content alpha"),       # in-batch dup of 11 -> dropped
            (13, "Fresh   CONTENT alpha"),     # token-normalized dup -> dropped
            (14, "other new thing"),           # admitted
        ],
        "doc_id long, text string",
    )
    out = incremental_exact_dedup(batch, seen)
    assert {r.doc_id for r in out.collect()} == {11, 14}
    assert "fingerprint" in out.columns


def test_corpus_stats_exact_percentiles(spark):
    from abecto_spark.operators.stats import corpus_stats

    rows = [("s1", " ".join(["w"] * n)) for n in [1, 2, 3, 4, 100]] + [
        ("s2", " ".join(["w"] * n)) for n in [10, 20]
    ]
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    out = {
        r.source: r
        for r in corpus_stats(df, ("source",), percentiles=(0.5, 0.9)).collect()
    }

    def q(vals, p):
        vals = sorted(vals)
        h = (len(vals) - 1) * p
        f = int(h)
        if f + 1 < len(vals):
            return round(vals[f] + (h - f) * (vals[f + 1] - vals[f]), 6)
        return round(float(vals[f]), 6)

    s1 = [1, 2, 3, 4, 100]
    assert out["s1"].n_docs == 5
    assert out["s1"].total_tokens == sum(s1)
    assert out["s1"].p50_tokens == q(s1, 0.5) == 3.0
    assert out["s1"].p90_tokens == q(s1, 0.9)
    assert out["s1"].max_tokens == 100
    assert out["s2"].p50_tokens == 15.0


def test_bigram_logprob_exact_values(spark):
    from abecto_spark.operators.lm_quality import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c"), (3, "solo")], "doc_id long, text string"
    )
    # unigrams: a=2 b=3 c=1 solo=1, total=7
    # bigrams: (a,b)=2 (b,a)=1 (b,c)=1; contexts: a=2 b=2
    nll_ab = -math.log(0.8 * 2 / 2 + 0.2 * 3 / 7)
    nll_ba = -math.log(0.8 * 1 / 2 + 0.2 * 2 / 7)
    nll_bc = -math.log(0.8 * 1 / 2 + 0.2 * 1 / 7)
    exp = {
        1: (3, round((2 * nll_ab + nll_ba) / 3, 6)),
        2: (1, round(nll_bc, 6)),
    }
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in bigram_logprob(df).collect()
    }
    assert got == exp  # doc 3 has one token -> no transitions -> absent


def test_bigram_logprob_hot_split_is_invisible(spark):
    from abecto_spark.operators.lm_quality import bigram_logprob

    rows = [(i, f"of the tok{i} of the") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wide = {
        (r.doc_id, r.n_bigrams, r.avg_nll)
        for r in bigram_logprob(df, hot_k=1000).collect()
    }
    split = {
        (r.doc_id, r.n_bigrams, r.avg_nll)
        for r in bigram_logprob(df, hot_k=1).collect()
    }
    assert wide == split and len(wide) == 30


def test_score_bigram_model_cross_corpus(spark, tmp_path):
    from abecto_spark.operators.lm_quality import (
        load_bigram_model,
        save_bigram_model,
        score_bigram_model,
        train_bigram_model,
    )

    ref = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c")], "doc_id long, text string"
    )
    # model: uni a=2 b=3 c=1 (total=6, vocab=3); bi (a,b)=2 (b,a)=1 (b,c)=1
    model = train_bigram_model(ref)
    save_bigram_model(model, str(tmp_path / "lm"))
    model = load_bigram_model(spark, str(tmp_path / "lm"))

    tgt = spark.createDataFrame(
        [(10, "a b z"), (11, "z q"), (12, "a b a b")],
        "doc_id long, text string",
    )
    p_ab = 0.8 * 2 / 2 + 0.2 * (3 + 1) / 10
    p_ba = 0.8 * 1 / 2 + 0.2 * (2 + 1) / 10
    p_unk = 0.2 * (0 + 1) / 10
    exp = {
        10: (2, 0.5, round((-math.log(p_ab) - math.log(p_unk)) / 2, 6)),
        11: (1, 1.0, round(-math.log(p_unk), 6)),
        12: (3, 0.0, round((2 * -math.log(p_ab) - math.log(p_ba)) / 3, 6)),
    }
    got = {
        r.doc_id: (r.n_bigrams, r.oov_rate, r.avg_nll)
        for r in score_bigram_model(tgt, model).collect()
    }
    assert got == exp


def test_score_bigram_model_hot_split_is_invisible(spark):
    from abecto_spark.operators.lm_quality import (
        score_bigram_model,
        train_bigram_model,
    )

    ref = spark.createDataFrame(
        [(i, f"of the ref{i} of the") for i in range(20)],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(i, f"of the new{i} of the") for i in range(25)],
        "doc_id long, text string",
    )
    model = train_bigram_model(ref)
    wide = {
        (r.doc_id, r.n_bigrams, r.oov_rate, r.avg_nll)
        for r in score_bigram_model(tgt, model, hot_k=1000).collect()
    }
    split = {
        (r.doc_id, r.n_bigrams, r.oov_rate, r.avg_nll)
        for r in score_bigram_model(tgt, model, hot_k=1).collect()
    }
    assert wide == split and len(wide) == 25


def test_dsir_weights_rank_target_like_docs_first(spark):
    from abecto_spark.operators.lm_quality import (
        dsir_select,
        dsir_weights,
        train_bigram_model,
    )

    target_docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 4) for i in range(10)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [(100, "alpha beta gamma delta alpha beta"),   # target-like
         (101, "zig zag quux flub zig zag quux"),       # raw-only
         (102, "alpha beta zig zag alpha beta zig")],   # mixed
        "doc_id long, text string",
    )
    tm = train_bigram_model(target_docs)
    bm = train_bigram_model(pool)
    w = {r.doc_id: r.dsir_weight for r in dsir_weights(pool, tm, bm).collect()}
    assert w[100] > w[102] > w[101]
    # selection takes the top-n by weight with deterministic ties
    top = [r.doc_id for r in dsir_select(pool, tm, bm, n=2).collect()]
    assert top == [100, 102]


def test_dsir_weight_is_score_difference(spark):
    from abecto_spark.operators.lm_quality import (
        dsir_weights,
        score_bigram_model,
        train_bigram_model,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "c c a b a")], "doc_id long, text string"
    )
    tm = train_bigram_model(docs.where("doc_id = 1"))
    bm = train_bigram_model(docs)
    st = {r.doc_id: r.avg_nll for r in score_bigram_model(docs, tm).collect()}
    sb = {r.doc_id: r.avg_nll for r in score_bigram_model(docs, bm).collect()}
    got = {r.doc_id: r.dsir_weight for r in dsir_weights(docs, tm, bm).collect()}
    for d in (1, 2):
        assert got[d] == sb[d] - st[d]


def _tfidf_expected(docs, min_df, top_n=None):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    tf = {(d, w): toks[d].count(w) for d in toks for w in set(toks[d])}
    df = {}
    for d, w in tf:
        df[w] = df.get(w, 0) + 1
    rows = {
        (d, w): (
            tf[(d, w)],
            df[w],
            round(tf[(d, w)] * (math.log((1.0 + n) / (1.0 + df[w])) + 1.0), 6),
        )
        for (d, w) in tf
        if df[w] >= min_df
    }
    if top_n is None:
        return rows
    keep = {}
    by_doc: dict = {}
    for (d, w), (t, f, s) in rows.items():
        by_doc.setdefault(d, []).append((w, t, f, s))
    for d, terms in by_doc.items():
        terms.sort(key=lambda x: (-x[3], x[0]))
        for w, t, f, s in terms[:top_n]:
            keep[(d, w)] = (t, f, s)
    return keep


def test_tfidf_matches_reference_formula(spark):
    from abecto_spark.operators.search import tfidf_terms

    docs = [
        ("a", "spark spark shuffle join"),
        ("b", "spark join window"),
        ("c", "window window merge sort"),
        ("d", "merge sort shuffle"),
    ]
    exp = _tfidf_expected(docs, min_df=2)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf_terms(df, min_df=2).collect()
    }
    assert got == exp
    # "spark" occurs in 2 docs with tf=2 in a: idf = ln(5/3)+1
    assert got[("a", "spark")] == (
        2, 2, round(2 * (math.log(5.0 / 3.0) + 1.0), 6)
    )


def test_tfidf_min_df_prunes_hapax_tail(spark):
    from abecto_spark.operators.search import tfidf_terms

    docs = [("a", "common rare1"), ("b", "common rare2")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    terms = {r["term"] for r in tfidf_terms(df, min_df=2).collect()}
    assert terms == {"common"}


def test_tfidf_top_terms_per_doc_truncates_deterministically(spark):
    from abecto_spark.operators.search import tfidf_terms

    docs = [
        ("a", "x x y y z w"),
        ("b", "x y z w"),
        ("c", "x y z w"),
    ]
    exp = _tfidf_expected(docs, min_df=1, top_n=2)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf_terms(df, min_df=1, top_terms_per_doc=2).collect()
    }
    assert got == exp
    # doc a keeps its two tf=2 terms; the tie among b/c's equal-weight
    # terms breaks alphabetically
    assert {w for (d, w) in got if d == "a"} == {"x", "y"}
    assert {w for (d, w) in got if d == "b"} == {"w", "x"}
