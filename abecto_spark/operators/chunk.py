"""Training-sequence preparation: fixed-window chunking and contiguous
token packing.

``chunk_documents`` splits every document's (case-preserving,
whitespace-delimited) token sequence into windows of ``window`` tokens
every ``stride`` tokens — the standard context-window slicer for LM
training and embedding indexing. Entirely row-local Catalyst
(``sequence`` → ``explode`` → ``slice``): zero shuffle at any corpus
size; the only data growth is the intended window/stride overlap
factor.

``pack_contiguous`` assigns documents to fixed token-budget bins for
sequence packing. True first-fit packing is a sequential scan and
cannot be distributed; the scalable rule used here is *contiguous*
packing within hash shards: documents are sharded by a portable
multiplicative hash of their id (NOT by a low-cardinality natural key —
the per-language quota window taught that lesson), ordered by id inside
the shard, and a document goes to bin ``floor(cum_tokens_before /
budget)``. One window shuffle keyed by (shard), with shard count chosen
by the caller to bound per-task rows; every step is integer arithmetic
an external oracle replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KNUTH_A = 2654435761
_M = 1 << 32


def _raw_tokens(text):
    # case-preserving: chunks feed training, so the text is not normalized
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens) — token windows of
    ``window`` tokens starting every ``stride`` (default: no overlap).
    The final window may be shorter; empty documents yield no rows."""
    if window < 1:
        raise ValueError("window must be >= 1")
    stride = window if stride is None else stride
    if stride < 1:
        raise ValueError("stride must be >= 1")

    base = docs.select(
        F.col(id_col).alias("doc_id"), _raw_tokens(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks"))
    chunks = base.where(F.col("n") > 0).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.col("n") - 1) / F.lit(stride)).cast("int"))
        ).alias("chunk_idx"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_idx") * stride + 1, window)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def pack_contiguous(
    docs: DataFrame,
    budget: int,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """(doc_id, shard, bin, n_tokens) — contiguous token packing:
    within each hash shard, documents in id order accumulate into bins
    of ``budget`` tokens (a document starts in the bin its running
    prefix sum falls into; oversized documents overflow their bin,
    matching practical packers that truncate downstream)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    shard = F.pmod(
        (F.col(id_col).cast("bigint") + F.lit(salt)) * F.lit(_KNUTH_A), F.lit(_M)
    ) % F.lit(n_shards)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shard.cast("int").alias("shard"),
        F.size(_raw_tokens(F.col(text_col))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.withColumn(
        "bin", F.floor(cum_before / F.lit(budget)).cast("int")
    ).select("doc_id", "shard", "bin", "n_tokens")
