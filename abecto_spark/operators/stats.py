"""Grouped corpus distribution statistics — the per-source / per-language
length and quality profile every training-data ops team watches.

Exact percentiles, not approximations: Spark's ``percentile`` aggregate
is a TypedImperativeAggregate over a value→count histogram, so it
partial-aggregates map-side and its per-group merge state is bounded by
the number of *distinct* values, not rows — for token/char lengths that
is at most a few hundred thousand entries per group at any corpus size,
which is why the exact form is safe here where it would not be for an
unbounded-cardinality metric (there, switch to ``approx_percentile``).
Interpolation is the standard linear rule, bit-identical to DuckDB's
``quantile_cont`` (verified in the driver oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count


def corpus_stats(
    docs: DataFrame,
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    percentiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One row per group: document count, total tokens, mean tokens, and
    the exact token-count percentiles (columns ``p50_tokens`` etc.,
    rounded to 6 dp). One map-side-combined shuffle keyed by the group
    columns; group count only bounds the *output*, not any task's input,
    because the percentile state is a mergeable histogram."""
    base = docs.select(
        *[F.col(c) for c in group_cols], token_count(F.col(text_col)).alias("_nt")
    )
    pcols = [
        F.round(F.expr(f"percentile(_nt, {p!r})"), 6).alias(
            f"p{str(p)[2:].ljust(2, '0')}_tokens"
        )
        for p in percentiles
    ]
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.round(F.avg("_nt"), 6).alias("avg_tokens"),
        *pcols,
        F.max("_nt").alias("max_tokens"),
    )


def top_ngrams(
    docs: DataFrame,
    group_cols: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 10,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Boilerplate mining: the ``k`` most frequent word ``n``-grams per
    group — (group..., ngram, count, n_docs, rank), ties broken by ngram
    text so the report is reproducible. The diagnostic that pairs with
    span dedup: the head of this table IS the boilerplate the dedup
    passes delete, and corpus reports (C4, Gopher) publish exactly this
    shape.

    Scale shape: n-grams are built JVM-side per document and immediately
    reduced to (group, doc, ngram, c) then (group, ngram, count, n_docs)
    — both aggregates map-side combine on high-cardinality keys, so the
    Zipf head partially aggregates in every task. The per-group top-k is
    **two-phase** (the ``curate_corpus`` quota pattern): group columns
    are low-cardinality, so a single ``Window.partitionBy(group)`` would
    sort every group's full distinct-ngram table in one reducer; instead
    phase 1 keeps the top k per (group, pmod(xxhash64(ngram), S)) salt
    bucket — S bounded local sorts — and phase 2 ranks exactly over the
    ≤ k·S survivors per group (the true top k is necessarily a subset of
    the union of per-bucket top ks). Documents shorter than ``n`` tokens
    contribute nothing."""
    from pyspark.sql import Window

    from ..functions.text import tokens as _tokens

    if salt_buckets is None:
        salt_buckets = max(8, docs.sparkSession.sparkContext.defaultParallelism)
    g = [F.col(c) for c in group_cols]
    toks = docs.select(
        *g, F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("toks")
    )
    grams = (
        toks.where(F.size("toks") >= n)
        .select(
            *group_cols,
            "_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n} + 1),"
                    f" i -> concat_ws(' ', slice(toks, i, {n})))"
                )
            ).alias("ngram"),
        )
    )
    per_doc = grams.groupBy(*group_cols, "_id", "ngram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    counts = per_doc.groupBy(*group_cols, "ngram").agg(
        F.sum("_c").alias("count"), F.count(F.lit(1)).alias("n_docs")
    )
    salt = F.pmod(F.xxhash64(F.col("ngram")), F.lit(salt_buckets))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(
        F.col("count").desc(), F.col("ngram")
    )
    survivors = (
        counts.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(
        F.col("count").desc(), F.col("ngram")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select(*group_cols, "ngram", "count", "n_docs", "rank")
    )


def bucket_by_percentile(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = ("lang",),
    cuts: Sequence[float] = (1 / 3, 2 / 3),
    labels: Sequence[str] = ("head", "middle", "tail"),
    quantize_dp: int = 3,
) -> DataFrame:
    """Assign each row a per-group percentile bucket of ``value_col``
    (``len(labels) == len(cuts) + 1``; row is in bucket i iff its value
    ≤ the group's ``cuts[i]`` quantile, last label otherwise). The
    CCNet-shape primitive: thresholds are an aggregate (|groups| ×
    len(cuts) rows) broadcast back — never a per-row rank.

    The exact-percentile-at-scale trick: the value is quantized to
    ``quantize_dp`` decimals FIRST (both for the threshold aggregation
    and the comparison), which bounds the mergeable percentile
    histogram's state at |value range| × 10^dp distinct entries — safe
    at any corpus size where the raw near-continuous value would grow
    the state linearly with rows — while keeping the result exactly
    reproducible (and DuckDB-replayable) where ``approx_percentile``
    would not be."""
    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(labels) == len(cuts) + 1")
    d = df.withColumn("_qv", F.round(F.col(value_col), quantize_dp))
    # thresholds are rounded well below the quantization step but above
    # double-ulp noise: linear-interpolation order of operations differs
    # across engines by ~1 ulp, and an unrounded threshold would flip a
    # boundary row's <= comparison
    aggs = [
        F.round(F.expr(f"percentile(_qv, {float(c)!r})"), quantize_dp + 6).alias(
            f"_t{i}"
        )
        for i, c in enumerate(cuts)
    ]
    thr = d.groupBy(*group_cols).agg(*aggs)
    out = d.join(F.broadcast(thr), list(group_cols))
    expr = F.when(F.col("_qv") <= F.col("_t0"), F.lit(labels[0]))
    for i in range(1, len(cuts)):
        expr = expr.when(F.col("_qv") <= F.col(f"_t{i}"), F.lit(labels[i]))
    expr = expr.otherwise(F.lit(labels[-1]))
    return out.withColumn("bucket", expr).drop(
        "_qv", *[f"_t{i}" for i in range(len(cuts))]
    )


def pmi_cooccurrence(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_items_per_group: int | None = 200,
) -> DataFrame:
    """Pointwise-mutual-information co-occurrence edges: for every pair
    of distinct items appearing together in a group (order, document,
    session), ``pmi = ln(p(a,b) / (p(a)·p(b)))`` with probabilities over
    the group universe — the classic statistical relation-extraction
    signal a KG-construction pass runs over baskets/co-mentions before
    typed linking.

    Returns (item_a, item_b, n_pairs, pmi) with item_a < item_b and
    n_pairs >= ``min_pair_count``; pmi rounded to 6 dp (engine-parity
    convention).

    Scale: presence is deduped per (group, item) first, so the pair
    fan-out is C(k, 2) per group where k = distinct items in the group
    — bounded by the basket size, not the corpus.  Pathological groups
    (a crawler session touching everything) are truncated to
    ``max_items_per_group`` items (kept deterministically by item order)
    BEFORE the self-join, the same super-hub cap as
    link_prediction_scores; pass None to disable.  All joins are
    equi-joins on the group key; counts partial-aggregate map-side.
    """
    from pyspark.sql import Window

    pres = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if max_items_per_group is not None:
        w = Window.partitionBy("g").orderBy("item")
        pres = (
            pres.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_items_per_group)
            .drop("_rn")
        )
    pres = pres.localCheckpoint()
    n_groups = pres.select("g").distinct().count()  # one driver scalar
    item_counts = pres.groupBy("item").agg(F.count("*").alias("n_item"))

    a, b = pres.alias("a"), pres.alias("b")
    pairs = (
        a.join(b, F.col("a.g") == F.col("b.g"))
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count("*").alias("n_pairs"))
        .where(F.col("n_pairs") >= min_pair_count)
    )
    pa = item_counts.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    pb = item_counts.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    n = float(n_groups)
    return (
        pairs.join(pa, "item_a")
        .join(pb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_pairs",
            F.round(
                F.log(
                    (F.col("n_pairs") / n)
                    / ((F.col("n_a") / n) * (F.col("n_b") / n))
                ),
                6,
            ).alias("pmi"),
        )
    )
