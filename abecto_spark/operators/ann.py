"""Similarity search over embedding columns.

  * brute_force_topk — exact cosine top-k per query via cross join; the
    dot product is a JVM-side ``aggregate(zip_with(...))`` fold (sequential
    left fold in double precision — bit-compatible with DuckDB's
    ``list_cosine_similarity`` for oracle checks).
  * lsh_topk — the scale path: random-hyperplane bucket join with
    multi-probe (hamming-1 neighbors), exact re-rank inside buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, b) -> a + b)"
_NORM_Q = "sqrt(aggregate(qv, 0D, (a, b) -> a + b * b))"
_NORM_C = "sqrt(aggregate(cv, 0D, (a, b) -> a + b * b))"


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k by cosine."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = q.crossJoin(c)
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.withColumn(
        "cosine", F.expr(_DOT) / (F.expr(_NORM_Q) * F.expr(_NORM_C))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _bucket_col(vec_col, planes: np.ndarray):
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        bits.append(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0])


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 11,
    dim: int | None = None,
    multiprobe: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket (plus hamming-1
    probes of the query bucket), re-ranked by exact cosine. Recall vs
    brute force is measured in tests; raise n_probes/planes to trade
    recall for cost. Scales as a plain shuffle join on bucket ids."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    c = c.withColumn("bucket", _bucket_col(F.col("cv"), planes))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    q = q.withColumn("bucket0", _bucket_col(F.col("qv"), planes))
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
    else:
        probes = F.array(F.col("bucket0"))
    q = q.select("query_id", "qv", F.explode(probes).alias("bucket"))

    scored = q.join(c, "bucket")
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.dropDuplicates(["query_id", "neighbor_id"]).withColumn(
        "cosine", F.expr(_DOT) / (F.expr(_NORM_Q) * F.expr(_NORM_C))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
