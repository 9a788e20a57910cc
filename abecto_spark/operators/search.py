"""Keyword search over the document corpus: Okapi BM25 top-k.

The classic lexical-retrieval scorer a training-data pipeline needs for
targeted corpus probes (find documents about X, audit what a dedup pass
kept). Implemented as three Catalyst aggregates over one tokenization —
no inverted index is materialized because the query's term list is tiny
and known up front, so the "index probe" is a filter *before* the
explode (only matching tokens ever become rows):

  1. corpus stats (N, avgdl): one row, attached via broadcast cross
     join — never collected to the driver;
  2. per-(doc, term) term frequencies: filter the token array to the
     query terms, explode the survivors, groupBy — the exploded row
     count is bounded by occurrences of query terms, not corpus tokens;
  3. document frequencies per term: ≤ |terms| rows, broadcast back.

Scoring (Lucene's BM25 variant, non-negative IDF):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, t) = idf(t) · tf · (k1 + 1) / (tf + k1·(1 − b + b·dl/avgdl))

The final top-k orders by the score *rounded to 6 dp* with the doc id
as tie-break, so ranking is identical across engines regardless of
floating summation order; ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject (per-partition top-k, no global sort shuffle).
Rank is assigned on the ≤ k surviving rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens as _tokens


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score, rank) — BM25 top-k documents for ``query``
    (lowercased whitespace terms, duplicates ignored)."""
    terms = sorted(set(t for t in query.lower().split() if t))
    if not terms:
        raise ValueError("query has no terms")
    qarr = F.array(*[F.lit(t) for t in terms])

    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks"))

    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        base.select(
            "doc_id",
            "dl",
            F.explode(F.filter(F.col("toks"), lambda t: F.array_contains(qarr, t))).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )

    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )

    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def tfidf_terms(
    docs: DataFrame,
    min_df: int = 2,
    top_terms_per_doc: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse TF-IDF document vectors as exploded rows:
    (doc_id, term, tf, df, tfidf) for every (document, term) pair whose
    term occurs in at least ``min_df`` documents.  With
    ``top_terms_per_doc`` set, each document keeps only its N
    highest-weighted terms (ties broken by term) — the sparse-vector
    truncation that bounds per-document feature width; the window
    partitions on ``doc_id`` (high cardinality, scale-safe).

    Weighting is the smooth-idf variant (every engine agrees on it and
    it never divides by zero):

        idf(t)      = ln((1 + N) / (1 + df(t))) + 1
        tfidf(d, t) = tf(d, t) * idf(t)     (rounded to 6 dp)

    Scale shape: ONE tokenization + explode feeds both aggregates; term
    frequencies groupBy (doc, term) — high-cardinality key, map-side
    partial combine; document frequencies groupBy term over the already
    aggregated tf rows (never the raw token stream).  The df table is
    vocabulary-sized — unbounded at corpus scale — so it joins back on
    ``term`` as a plain shuffle join, NOT a broadcast (contrast
    ``bm25_topk``, whose df relation is bounded by the query's term
    list).  ``min_df`` is the vocabulary-control knob: raising it prunes
    the hapax tail, which at web scale is the bulk of the vocabulary.
    The corpus size N attaches as a 1-row broadcast.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    )
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= F.lit(min_df))
    )
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n_docs"))
                        / (F.lit(1.0) + F.col("df"))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    if top_terms_per_doc is None:
        return scored
    # order on the ROUNDED weight so the cut is engine-portable
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_terms_per_doc)
        .drop("_rn")
    )
