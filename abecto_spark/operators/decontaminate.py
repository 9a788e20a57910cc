"""Train/test decontamination: flag corpus documents that share any word
n-gram (default 13, the common benchmark-decontamination window) with a
benchmark document.

Scale shape: each side's documents are reduced to their DISTINCT
n-grams (``array_distinct`` before the explode bounds the blow-up at
repetitive docs), the benchmark side — tiny in practice — is broadcast,
and the join key is a 64-bit ``xxhash64`` prefilter with an exact
string-equality verification on the surviving pairs, so long 13-word
strings are never the shuffle/broadcast key. The result is exact (hash
collisions are eliminated by the verify), which keeps it replayable by
a plain string-join oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .repetition import _word_ngrams


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int, out: str):
    grams = F.array_distinct(_word_ngrams(tokens(F.col(text_col)), n))
    return df.select(
        F.col(id_col).alias(out), F.explode(grams).alias("gram")
    ).withColumn("h", F.xxhash64("gram"))


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, n_shared) for every corpus/benchmark pair
    sharing ≥1 distinct word ``n``-gram; ``n_shared`` counts the shared
    distinct n-grams. Documents shorter than ``n`` tokens cannot be
    flagged (no n-gram exists) — the standard blind spot of the method,
    callers screen tiny benchmark items separately."""
    c = _doc_grams(corpus, id_col, text_col, n, "doc_id")
    b = _doc_grams(benchmark, id_col, text_col, n, "bench_id")
    b = b.withColumnRenamed("gram", "bench_gram")
    if broadcast_benchmark:
        b = F.broadcast(b)
    hits = c.join(b, on="h", how="inner").where(
        F.col("gram") == F.col("bench_gram")
    )
    return hits.groupBy("doc_id", "bench_id").agg(
        F.count_distinct("gram").alias("n_shared")
    )
