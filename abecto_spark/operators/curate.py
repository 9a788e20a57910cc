"""Corpus curation — the composed training-data pass a 100 TB pipeline
runs before anything else touches the corpus: exact dedup, quality
floor, language identification, and per-language quota sampling. Each
stage is pure Catalyst (no Python in the hot path):

  1. content fingerprint (xxhash64 of the token-normalized text) →
     first-id-wins exact dedup (one window over the fingerprint);
  2. quality floor (``functions.text.quality_score`` heuristic);
  3. ``lang_id`` stopword-overlap language guess;
  4. per-language top-N by (quality desc, id) — the deterministic quota
     that keeps the curated set reproducible across partitionings.

At scale: the fingerprint window partitions on a high-cardinality
8-byte hash (never carries document text); the per-language quota is
**two-phase** because ``lang`` has only ~dozens of distinct values and
a single ``Window.partitionBy("lang")`` over the full corpus would
funnel every language's rows through one reducer task:

  - phase 1 salts the window key to ``(lang, pmod(xxhash64(id), S))``
    and keeps the top N per salt bucket — S bounded local sorts per
    language, each over ~1/S of that language's rows;
  - phase 2 runs the exact ``(quality desc, id)`` window on the
    survivors only (≤ N·S rows per language) to assign the true rank
    and cut at N.  The global per-language top N is necessarily a
    subset of the union of per-bucket top Ns, so the result — rows and
    ranks — is identical to the single-window plan.

``salt_buckets`` defaults to the session's default parallelism so the
phase-1 sorts spread across the cluster; set it ≈ cores-per-language
on a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, lang_id, quality_score


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.35,
    per_lang_top_n: int = 1000,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Returns (id, lang, quality, rank) for the curated documents —
    deduplicated, above the quality floor, ranked within their language,
    cut at ``per_lang_top_n``."""
    if salt_buckets is None:
        salt_buckets = max(8, docs.sparkSession.sparkContext.defaultParallelism)
    t = F.col(text_col)
    scored = docs.select(
        F.col(id_col),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang"),
        fingerprint(t).alias("fp"),
    )
    w_fp = Window.partitionBy("fp").orderBy(F.col(id_col))
    deduped = (
        scored.withColumn("_rn", F.row_number().over(w_fp))
        .where(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )
    kept = deduped.where(F.col("quality") >= quality_min)

    # phase 1: salted partial top-N — the only window that sees the full
    # corpus partitions on (lang, salt), never on lang alone
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    w_salted = Window.partitionBy("lang", "_salt").orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    survivors = (
        kept.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w_salted))
        .where(F.col("_rn") <= per_lang_top_n)
        .drop("_rn", "_salt")
    )

    # phase 2: exact rank over ≤ N·S survivors per language
    w_lang = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_lang).cast("long"))
        .where(F.col("rank") <= per_lang_top_n)
        .select(id_col, "lang", "quality", "rank")
    )
