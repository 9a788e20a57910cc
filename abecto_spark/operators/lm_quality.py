"""Language-model quality proxy: corpus-unigram negative log-likelihood.

The CCNet-style cheap perplexity signal — documents whose tokens are
improbable under the corpus's own unigram distribution are boilerplate,
gibberish, or the wrong language; documents that score *too* probable
are repetitive filler. Computed without any external model:

  1. unigram counts: ``explode(tokens) → groupBy(token).count()`` (one
     map-side-combined shuffle keyed by token — the count table is
     |vocab| rows, ≪ corpus tokens);
  2. per-token NLL: ``-ln(count / total)`` with the one-row total
     attached as a broadcast cross join (never collected);
  3. per-document mean NLL over the exploded tokens.

The scale hazard in step 3 is the token-keyed join: Zipf's law puts a
constant fraction of ALL token rows on a handful of keys ("the" is ~5%
of English tokens), so a plain shuffle join sends those rows through
single tasks. The standard split is applied explicitly: the ``hot_k``
most frequent tokens (deterministic: count desc, token asc) join
map-side from a broadcast, and only the Zipf tail — whose per-key row
counts are bounded — takes the shuffle join. AQE skew splitting would
also cope, but the hot set is knowable and tiny, so the plan should not
depend on runtime rescue. Both paths produce identical rows; the
DuckDB oracle replays the unsplit equivalent.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens as _tokens

#: interpolation weight on the bigram term of ``bigram_logprob`` —
#: CCNet-style fixed mixture, not tuned per corpus (determinism).
BIGRAM_LAMBDA = 0.8


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_k: int = 64,
) -> DataFrame:
    """(doc_id, n_tokens, avg_nll) — mean per-token negative log
    likelihood (nats, rounded to 6 dp) under the corpus unigram model.
    Documents with no tokens are absent from the output."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))

    hot = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(hot_k)
    hot_part = tok.join(F.broadcast(hot), "token")
    cold_part = tok.join(F.broadcast(hot.select("token")), "token", "left_anti").join(
        counts, "token"
    )

    return (
        hot_part.unionByName(cold_part)
        .crossJoin(F.broadcast(total))
        .withColumn("nll", -F.log(F.col("cnt").cast("double") / F.col("total")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = BIGRAM_LAMBDA,
    hot_k: int = 64,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll) — mean negative log likelihood of the
    document's token transitions under an interpolated corpus bigram
    model, ``p(w2|w1) = lam * c(w1,w2)/c_ctx(w1) + (1-lam) * c(w2)/total``
    — the full CCNet-style perplexity filter (``unigram_logprob`` is its
    cheap first approximation). ``c_ctx(w1)`` is the bigram-context count
    (occurrences of ``w1`` that have a successor), so the conditional
    MLE term sums to 1 exactly. Documents with fewer than two tokens
    have no transitions and are absent from the output.

    Scale shape: the bigram list is built JVM-side per document (one
    ``transform`` over the token array — no self-join on positions),
    then immediately reduced to (doc, w1, w2, k) so each document
    contributes each transition once to the join stage. All model
    tables (bigram counts, context counts, unigram counts) are
    aggregates — |distinct bigrams| and |vocab| rows, not corpus
    tokens — and are joined with each other first into a single
    ``(w1, w2) → nll`` lookup. The one row-level join (doc transitions
    against that lookup) is Zipf-headed ("of the", "in the" carry a
    constant fraction of all transitions), so the ``hot_k`` most
    frequent bigrams join from a broadcast and only the bounded tail
    takes the shuffle, mirroring ``unigram_logprob``'s split.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    )
    # 0-based Spark array indexing: slice(toks, 1, n-1) pairs each token
    # with its successor without a positional self-join.
    bi = (
        toks.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    doc_bi = bi.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    c_bi = doc_bi.groupBy("w1", "w2").agg(F.sum("k").alias("cbi"))
    c_ctx = c_bi.groupBy("w1").agg(F.sum("cbi").alias("cctx"))
    uni = (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").alias("total"))
    nll_tab = (
        c_bi.join(c_ctx, "w1")
        .join(uni.withColumnRenamed("token", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            (
                -F.log(
                    F.lit(lam) * F.col("cbi").cast("double") / F.col("cctx")
                    + F.lit(1.0 - lam) * F.col("cnt").cast("double") / F.col("total")
                )
            ).alias("nll"),
        )
    )
    hot = (
        c_bi.orderBy(F.desc("cbi"), F.asc("w1"), F.asc("w2"))
        .limit(hot_k)
        .select("w1", "w2")
    )
    hot_nll = nll_tab.join(F.broadcast(hot), ["w1", "w2"])
    scored_hot = doc_bi.join(F.broadcast(hot_nll), ["w1", "w2"])
    scored_cold = doc_bi.join(F.broadcast(hot), ["w1", "w2"], "left_anti").join(
        nll_tab, ["w1", "w2"]
    )
    return (
        scored_hot.unionByName(scored_cold)
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(F.sum(F.col("k") * F.col("nll")) / F.sum("k"), 6).alias(
                "avg_nll"
            ),
        )
    )


class BigramModel(NamedTuple):
    """Persistable corpus bigram LM: aggregate-sized count tables only
    (|distinct bigrams| + |vocab| + 1 rows — never corpus tokens)."""

    bigram: DataFrame  # (w1, w2, cbi)
    context: DataFrame  # (w1, cctx)
    unigram: DataFrame  # (token, cnt)
    totals: DataFrame  # one row: (total, vocab)


def train_bigram_model(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> BigramModel:
    """Count tables for the CCNet-style cross-corpus workflow: train the
    LM on a trusted reference corpus (the role Wikipedia plays in CCNet)
    and score a target web corpus against it with
    ``score_bigram_model``. All four tables are aggregates, so the model
    is small enough to persist (``save_bigram_model``) and reuse across
    scoring runs without retraining."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    )
    bi = (
        toks.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    bigram = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cbi"))
    context = bigram.groupBy("w1").agg(F.sum("cbi").alias("cctx"))
    unigram = (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = unigram.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    return BigramModel(bigram, context, unigram, totals)


def save_bigram_model(model: BigramModel, path: str) -> None:
    for name in BigramModel._fields:
        getattr(model, name).write.mode("overwrite").parquet(f"{path}/{name}")


def load_bigram_model(spark, path: str) -> BigramModel:
    return BigramModel(
        *(spark.read.parquet(f"{path}/{name}") for name in BigramModel._fields)
    )


def score_bigram_model(
    docs: DataFrame,
    model: BigramModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = BIGRAM_LAMBDA,
    hot_k: int = 64,
) -> DataFrame:
    """(doc_id, n_bigrams, oov_rate, avg_nll) — score a target corpus
    against a (possibly different) reference model. Unlike the
    self-scoring ``bigram_logprob`` (whose exact MLE interpolation is
    the oracle-checked form), cross-corpus scoring must survive events
    the model never saw, so the unigram term is add-one smoothed over
    the model vocabulary plus one unknown slot::

        p(w2|w1) = lam * c(w1,w2)/c_ctx(w1)            [0 if unseen]
                 + (1-lam) * (c(w2)+1)/(total+vocab+1)

    ``oov_rate`` is the fraction of the document's transitions whose
    bigram the model never saw — high avg_nll with low oov_rate means
    improbable-but-known language (boilerplate, wrong register); high
    oov_rate flags domain shift or gibberish. Scale shape mirrors
    ``bigram_logprob``: the target reduces to (doc, w1, w2, k); its
    DISTINCT bigrams score against the aggregate-sized model tables via
    left joins (nulls → unseen → the smoothed floor); the one row-level
    join takes the target's ``hot_k`` most frequent bigrams from a
    broadcast and shuffles only the Zipf tail."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    )
    doc_bi = (
        toks.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, size(toks) - 1),"
                    " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    target_bi = doc_bi.groupBy("w1", "w2").agg(F.sum("k").alias("tk"))
    nll_tab = (
        target_bi.join(model.bigram, ["w1", "w2"], "left")
        .join(model.context, "w1", "left")
        .join(model.unigram.withColumnRenamed("token", "w2"), "w2", "left")
        .crossJoin(F.broadcast(model.totals))
        .select(
            "w1",
            "w2",
            "tk",
            (F.col("cbi").isNull()).alias("oov"),
            (
                -F.log(
                    F.lit(lam)
                    * F.coalesce(F.col("cbi").cast("double"), F.lit(0.0))
                    / F.coalesce(F.col("cctx").cast("double"), F.lit(1.0))
                    + F.lit(1.0 - lam)
                    * (F.coalesce(F.col("cnt").cast("double"), F.lit(0.0)) + 1.0)
                    / (F.col("total") + F.col("vocab") + 1.0).cast("double")
                )
            ).alias("nll"),
        )
    )
    hot = (
        nll_tab.orderBy(F.desc("tk"), F.asc("w1"), F.asc("w2"))
        .limit(hot_k)
        .select("w1", "w2", "oov", "nll")
    )
    scored_hot = doc_bi.join(F.broadcast(hot), ["w1", "w2"])
    scored_cold = doc_bi.join(
        F.broadcast(hot.select("w1", "w2")), ["w1", "w2"], "left_anti"
    ).join(nll_tab.select("w1", "w2", "oov", "nll"), ["w1", "w2"])
    return (
        scored_hot.unionByName(scored_cold)
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(
                F.sum(F.when(F.col("oov"), F.col("k")).otherwise(F.lit(0)))
                / F.sum("k"),
                6,
            ).alias("oov_rate"),
            F.round(F.sum(F.col("k") * F.col("nll")) / F.sum("k"), 6).alias(
                "avg_nll"
            ),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    cuts=(1 / 3, 2 / 3),
    labels=("head", "middle", "tail"),
) -> DataFrame:
    """(doc_id, lang, avg_nll, bucket) — CCNet's per-language perplexity
    terciles: within each language, the lowest-NLL third of documents is
    ``head`` (cleanest, kept outright in CCNet), the middle third
    ``middle``, the rest ``tail`` (dropped or down-weighted). Thresholds
    are per-language aggregates broadcast back (``stats.
    bucket_by_percentile``), with the NLL quantized to 3 decimals so the
    exact percentile's merge state stays bounded at corpus scale."""
    from .stats import bucket_by_percentile

    scores = unigram_logprob(docs, id_col, text_col)
    langs = docs.select(
        F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
    )
    return bucket_by_percentile(
        scores.join(langs, "doc_id"), "avg_nll", ("lang",), cuts, labels
    ).select("doc_id", "lang", "avg_nll", "bucket")


def dsir_weights(
    docs: DataFrame,
    target_model: BigramModel,
    base_model: BigramModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = BIGRAM_LAMBDA,
    hot_k: int = 64,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023):

        weight(d) = avg_nll_base(d) - avg_nll_target(d)
                  ≈ (1/|d|) · log p_target(d)/p_raw(d)

    — positive when the document looks more like the *target*
    distribution (the trusted corpus the target model was trained on)
    than like the raw pool the base model was trained on.  Both scores
    come from ``score_bigram_model`` (aggregate-sized model tables,
    hot-split bigram join); the weight is their difference of
    already-6dp-rounded per-bigram averages — a deterministic IEEE
    subtraction of engine-portable doubles, so no further rounding is
    applied.  Returns (doc_id, n_bigrams, dsir_weight).
    """
    st = score_bigram_model(
        docs, target_model, id_col=id_col, text_col=text_col,
        lam=lam, hot_k=hot_k,
    ).select("doc_id", F.col("avg_nll").alias("nll_target"))
    sb = score_bigram_model(
        docs, base_model, id_col=id_col, text_col=text_col,
        lam=lam, hot_k=hot_k,
    ).select("doc_id", "n_bigrams", F.col("avg_nll").alias("nll_base"))
    return sb.join(st, "doc_id").select(
        "doc_id",
        "n_bigrams",
        (F.col("nll_base") - F.col("nll_target")).alias("dsir_weight"),
    )


def dsir_select(
    docs: DataFrame,
    target_model: BigramModel,
    base_model: BigramModel,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = BIGRAM_LAMBDA,
    hot_k: int = 64,
) -> DataFrame:
    """Top-``n`` documents of the pool by DSIR weight (ties broken by
    doc_id, so the selection is deterministic).  The global top-n
    compiles to TakeOrderedAndProject — a per-partition heap merged
    once, no full-corpus sort shuffle — which is the scale path as long as
    ``n`` fits on one executor; for quota-sized selections use the
    salted two-phase pattern from ``operators/curate.py``.
    """
    w = dsir_weights(
        docs, target_model, base_model,
        id_col=id_col, text_col=text_col, lam=lam, hot_k=hot_k,
    )
    return w.orderBy(F.desc("dsir_weight"), F.asc("doc_id")).limit(n)
