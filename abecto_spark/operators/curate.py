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

At scale: two shuffles total (fingerprint window, language window),
both map-side-combinable windows over bounded key cardinalities; the
fingerprint key is a fixed 8-byte hash, so the dedup shuffle never
carries document text.
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
) -> DataFrame:
    """Returns (id, lang, quality, rank) for the curated documents —
    deduplicated, above the quality floor, ranked within their language,
    cut at ``per_lang_top_n``."""
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
    w_lang = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    return (
        kept.withColumn("rank", F.row_number().over(w_lang).cast("long"))
        .where(F.col("rank") <= per_lang_top_n)
        .select(id_col, "lang", "quality", "rank")
    )
