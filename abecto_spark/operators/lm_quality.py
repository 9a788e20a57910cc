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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens as _tokens


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
