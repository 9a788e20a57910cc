"""Gopher-style repetition signals for corpus curation (Rae et al. 2021,
"Scaling Language Models", §A.1.1 repetition filters — public knowledge):

- ``dup_line_frac`` / ``dup_line_char_frac`` — fraction of lines (and of
  line characters) that are exact duplicates of another line in the same
  document,
- ``top_ngram_char_frac`` — characters covered by the single most
  frequent word n-gram (count × n-gram length / document length),
- ``dup_ngram_char_frac`` — characters in word n-grams occurring more
  than once (count × length summed over duplicated n-grams / document
  length; overlap-unaware, the standard cheap approximation).

Scale design: these are per-document statistics, so exploding n-grams
and shuffling the whole corpus to groupBy(doc_id, ngram) would move
~the corpus size through the network for data that is already colocated
in its own row. Instead each signal is a sorted-array run-length pass
inside one Catalyst ``aggregate`` higher-order function — zero shuffle,
one projection stage, whole-stage-codegen eligible. Per-document cost
is O(tokens · log tokens) for the array sort, bounded by document size
(not corpus size), so the plan is embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _word_ngrams(toks: Column, n: int) -> Column:
    """Overlapping word n-grams joined by a single space; empty array
    when the document has fewer than ``n`` tokens.

    Built as a ``zip_with`` chain against shifted copies of the token
    array (one zip per extra gram word) — measured ~10× cheaper than the
    naive per-position ``slice``+``concat_ws`` transform, which allocates
    an array slice per output element. ``zip_with`` pads the shorter
    (shifted) side with NULL and ``concat`` is null-propagating, so the
    trailing incomplete grams come out NULL and one filter drops them."""
    if n == 1:
        return toks
    ng = toks
    for k in range(1, n):
        shifted = F.slice(
            toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))
        )
        ng = F.zip_with(ng, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(ng, lambda x: x.isNotNull())


# run-length accumulator over a SORTED array: (prev element, current run
# length, best (count, length, value) so far, chars in duplicated runs)
_ACC = (
    "struct<prev:string,run:bigint,"
    "best:struct<cnt:bigint,len:int,val:string>,dup:bigint>"
)


def _runs(arr: Column) -> Column:
    """Fold a sorted array into ``(best run, duplicated chars)``: one
    linear pass; ties on the top run break by (count, length, value) so
    the result is deterministic and oracle-replayable."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.struct(
            F.lit(0).cast("bigint").alias("cnt"),
            F.lit(0).cast("int").alias("len"),
            F.lit("").alias("val"),
        ).alias("best"),
        F.lit(0).cast("bigint").alias("dup"),
    ).cast(_ACC)

    def close_run(acc):
        # fold the finished run (acc.prev × acc.run) into best/dup
        cand = F.struct(
            acc["run"].alias("cnt"),
            F.coalesce(F.length(acc["prev"]), F.lit(0)).alias("len"),
            F.coalesce(acc["prev"], F.lit("")).alias("val"),
        )
        best = F.when(
            acc["prev"].isNotNull() & (cand > acc["best"]), cand
        ).otherwise(acc["best"])
        dup = acc["dup"] + F.when(
            acc["prev"].isNotNull() & (acc["run"] > 1),
            acc["run"] * F.length(acc["prev"]),
        ).otherwise(F.lit(0))
        return best, dup

    def step(acc, x):
        same = acc["prev"].isNotNull() & (acc["prev"] == x)
        best, dup = close_run(acc)
        return F.when(
            same,
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["best"].alias("best"),
                acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("bigint").alias("run"),
                best.alias("best"),
                dup.alias("dup"),
            )
        ).cast(_ACC)

    def finish(acc):
        best, dup = close_run(acc)
        return F.struct(best.alias("best"), dup.alias("dup"))

    return F.aggregate(F.array_sort(arr), init, step, finish)


_DUP_ACC = "struct<prev:string,run:bigint,dup:bigint>"


def _dup_chars(arr: Column) -> Column:
    """Characters in duplicated elements (count × length summed over
    runs longer than 1) of a sorted array — the ``dup`` half of
    ``_runs`` without the best-run struct comparisons, for the signals
    that never need the top element."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("dup"),
    ).cast(_DUP_ACC)

    def close(acc):
        return acc["dup"] + F.when(
            acc["run"] > 1,
            acc["run"] * F.coalesce(F.length(acc["prev"]), F.lit(0)),
        ).otherwise(F.lit(0))

    def step(acc, x):
        same = acc["prev"].isNotNull() & (acc["prev"] == x)
        return F.when(
            same,
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("bigint").alias("run"),
                close(acc).alias("dup"),
            )
        ).cast(_DUP_ACC)

    return F.aggregate(F.array_sort(arr), init, step, close)


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngram: int = 2,
    dup_ngram: int = 5,
) -> DataFrame:
    """Per-document repetition signals, all computed in one shuffle-free
    projection. Returns ``(id, dup_line_frac, dup_line_char_frac,
    top_ngram, top_ngram_char_frac, dup_ngram_char_frac)`` with
    fractions rounded to 6 decimals (driver-oracle convention)."""
    text = F.col(text_col)
    toks = tokens(text)
    n_chars = F.length(text).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))

    lines = F.filter(F.split(text, r"\n"), lambda x: x != "")
    n_lines = F.size(lines).cast("double")
    line_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    ).cast("double")
    distinct_lines = F.size(F.array_distinct(lines)).cast("double")

    # two projections so Catalyst's CollapseProject keeps each non-cheap
    # run-length aggregate computed once instead of inlining it into
    # every output column that references it
    mid = df.select(
        F.col(id_col),
        n_chars.alias("__nc"),
        safe_chars.alias("__safe"),
        n_lines.alias("__nl"),
        line_chars.alias("__lc"),
        distinct_lines.alias("__dl"),
        _dup_chars(lines).alias("__line_dup"),
        _runs(_word_ngrams(toks, top_ngram)).alias("__top"),
        _dup_chars(_word_ngrams(toks, dup_ngram)).alias("__dup"),
    )
    return mid.select(
        F.col(id_col),
        F.round(
            (F.col("__nl") - F.col("__dl"))
            / F.greatest(F.col("__nl"), F.lit(1.0)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.col("__line_dup").cast("double")
            / F.greatest(F.col("__lc"), F.lit(1.0)),
            6,
        ).alias("dup_line_char_frac"),
        F.col("__top")["best"]["val"].alias("top_ngram"),
        F.round(
            (
                F.col("__top")["best"]["cnt"] * F.col("__top")["best"]["len"]
            ).cast("double")
            / F.col("__safe"),
            6,
        ).alias("top_ngram_char_frac"),
        F.round(
            F.col("__dup").cast("double") / F.col("__safe"), 6
        ).alias("dup_ngram_char_frac"),
    )
