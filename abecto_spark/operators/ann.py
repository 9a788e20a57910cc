"""Similarity search over embedding columns.

  * brute_force_topk — exact cosine top-k per query via cross join; the
    dot product is a JVM-side ``aggregate(zip_with(...))`` fold (sequential
    left fold in double precision — bit-compatible with DuckDB's
    ``list_cosine_similarity`` for oracle checks).
  * lsh_topk — random-hyperplane bucket join with multi-probe (hamming-1
    neighbors) and multi-table amplification, exact re-rank inside
    buckets.
  * ivf_topk — inverted-file variant: spherical k-means centroids
    (trained driver-side on a bounded sample), corpus partitioned by
    nearest centroid JVM-side, queries probe the ``n_probe`` nearest
    cells; assignment is cosine-based and therefore scale-invariant.
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


def _with_matrix(df: DataFrame, matrix: np.ndarray, name: str) -> DataFrame:
    """Attach a plane/centroid matrix as a broadcast 1-row column instead
    of baking n×dim literals into the plan tree: at embedding scale
    (dim 768-1536, 18+ planes / 256+ cells) plan-literal matrices blow up
    plan size and codegen ("large task binary" warnings); a broadcast
    nested-loop join against one row keeps the plan O(1) in dim×rows."""
    mdf = df.sparkSession.createDataFrame(
        [([[float(v) for v in row] for row in matrix],)],
        f"{name} array<array<double>>",
    )
    return df.crossJoin(F.broadcast(mdf))


def _dot(vec_col, other):
    return F.aggregate(
        F.zip_with(vec_col, other, lambda x, y: x * y),
        F.lit(0.0),
        lambda a, b: a + b,
    )


def _bucket_col(vec_col, planes_col):
    """Sign-bit bucket id from a broadcast planes matrix column —
    whole-stage-codegen higher-order functions, no per-plane literals."""
    bits = F.transform(
        planes_col,
        lambda p, i: F.when(
            _dot(vec_col, p) > 0, F.pow(F.lit(2.0), i).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


def plan_lsh(corpus_size: int, target_bucket: int = 4096, n_planes_max: int = 24) -> int:
    """Plane count sized to the corpus: 2^planes buckets keep the
    *expected* bucket at ``target_bucket`` vectors, so per-query re-rank
    work is O((planes+1) * target_bucket) regardless of corpus size —
    10^9 vectors get 18 planes, not the fixed 8 that made every bucket
    ~N/256 (the round-1 scale bug). Capped because past ~2^24 buckets the
    bucket-id shuffle key space stops helping recall."""
    import math

    if corpus_size <= target_bucket:
        return 4
    return min(n_planes_max, max(4, math.ceil(math.log2(corpus_size / target_bucket))))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int | None = None,
    corpus_size: int | None = None,
    n_tables: int = 1,
    n_probes: int | None = None,
    bucket_cap: int | None = None,
    seed: int = 11,
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket (plus hamming-1
    probes of the query bucket), re-ranked by exact cosine inside the
    bucket join. Scales as a plain shuffle join on bucket ids.

    Sizing: pass ``n_planes`` directly or ``corpus_size`` (a count the
    caller already has) and the plane count is derived via ``plan_lsh`` so
    expected per-bucket work stays constant as the corpus grows. ``dim``
    must be supplied when the plan is built lazily — deriving it would
    force a driver-side ``first()`` inside plan construction, so that
    fallback is intentionally loud (ValueError) rather than implicit.

    Recall/cost knobs (see SCALE.md §ANN):
      * ``n_probes``   — hamming-1 probes of the query bucket
        (default: all ``n_planes``); more probes = higher recall, more
        candidate rows, linear cost.
      * ``n_tables``   — independent hash tables (different plane seeds),
        candidates unioned before re-rank; the classic recall amplifier
        for high-dim clustered corpora, multiplies candidate cost.
      * ``bucket_cap`` — hard per-(table, bucket) corpus cap (deterministic
        xxhash order). Bounds the worst-case straggler when the corpus is
        degenerate (many near-identical vectors hash together) at a
        measured recall cost; leave None to rely on AQE skew splitting,
        which preserves recall.
    """
    if n_planes is None:
        if corpus_size is None:
            raise ValueError("pass n_planes or corpus_size (see plan_lsh)")
        n_planes = plan_lsh(corpus_size)
    if dim is None:
        raise ValueError(
            "pass dim explicitly (array length is not in the schema; probing "
            "it would run a driver action during plan construction)"
        )
    if n_probes is None:
        n_probes = n_planes
    n_probes = min(n_probes, n_planes)

    c_base = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )

    tables = []
    for t in range(n_tables):
        rng = np.random.RandomState(seed + 7919 * t)
        planes = rng.randn(n_planes, dim)
        c = (
            _with_matrix(c_base, planes, "planes")
            .withColumn("bucket", _bucket_col(F.col("cv"), F.col("planes")))
            .drop("planes")
            .withColumn("table", F.lit(t))
        )
        if bucket_cap is not None:
            wcap = Window.partitionBy("bucket").orderBy(F.xxhash64("neighbor_id"))
            c = (
                c.withColumn("_r", F.row_number().over(wcap))
                .where(F.col("_r") <= bucket_cap)
                .drop("_r")
            )
        q = (
            _with_matrix(q_base, planes, "planes")
            .withColumn("bucket0", _bucket_col(F.col("qv"), F.col("planes")))
            .drop("planes")
        )
        probes = F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_probes)],
        )
        q = q.select(
            "query_id", "qv", F.explode(probes).alias("bucket"), F.lit(t).alias("table")
        )
        tables.append(q.join(c, ["table", "bucket"]))

    scored = tables[0]
    for more in tables[1:]:
        scored = scored.unionByName(more)
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


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 64,
    sample: int = 100_000,
    iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Spherical k-means centroids from a bounded corpus sample. This is
    the one deliberate driver-side action of the IVF path (training data
    is capped at ``sample`` rows); assignment/probing stay distributed.

    Sampling is by seeded xxhash64 order, not ``limit``: a bare limit
    takes the *first* partitions (biased on sorted/clustered corpora) and
    is not deterministic across partition layouts; hash-order + limit
    compiles to TakeOrderedAndProject (per-partition top-k, no full
    shuffle) and is a reproducible uniform sample."""
    rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample)
        .toPandas()[vec_col]
        .to_numpy()
    )
    x = _normalize_rows(np.array([np.asarray(r, dtype=np.float64) for r in rows]))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize_rows(cents)
    return cents


def _cell_col(vec_col, cents_col, top: int = 1):
    """Column: the ``top`` nearest centroid ids by cosine (JVM-side: the
    normalized centroid matrix arrives as a broadcast column, similarity
    is a zip_with fold, ranking via array sort on (score, id) structs)."""
    norm_v = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, b: a + b * b))
    scored = F.transform(
        cents_col,
        lambda c, i: F.struct(
            (-_dot(vec_col, c) / norm_v).alias("neg"),
            i.alias("cell"),
        ),
    )
    return F.slice(F.array_sort(scored), 1, top)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via inverted-file cells: corpus rows live in
    their nearest-centroid cell, queries probe the ``n_probe`` nearest
    cells, exact cosine re-rank inside the cell join. Cosine assignment
    is scale-invariant, so positively-scaled duplicates of a query are
    guaranteed to share its primary cell (the oracle-check hook).

    Scale shape: one shuffle join keyed by cell id; expected per-query
    re-rank work ≈ n_probe · N / n_cells, so size ``n_cells ≈ N /
    target_cell`` as the corpus grows (same sizing law as plan_lsh)."""
    c = (
        _with_matrix(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            ),
            cents, "cents",
        )
        .withColumn("cell", _cell_col(F.col("cv"), F.col("cents"), top=1)[0]["cell"])
        .drop("cents")
    )
    q = (
        _with_matrix(
            queries.select(
                F.col(id_col).alias("query_id"),
                _as_double(F.col(vec_col)).alias("qv"),
            ),
            cents, "cents",
        )
        .withColumn("cells", _cell_col(F.col("qv"), F.col("cents"), top=n_probe))
        .drop("cents")
        .select("query_id", "qv", F.explode(F.col("cells.cell")).alias("cell"))
    )
    scored = q.join(c, "cell")
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.withColumn(
        "cosine", F.expr(_DOT) / (F.expr(_NORM_Q) * F.expr(_NORM_C))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage-scale path
    for large embedding stores (4× smaller than float32, dot products
    stay integer SIMD on read): ``scale = max|x_i| / 127``, ``code_i =
    floor(x_i / scale + 0.5)`` (explicit half-up — ``round()`` tie rules
    differ across engines), all arithmetic in double so the oracle
    replays bit-identically. Returns (id, scale double, codes
    array<int>). Zero-vector rows quantize to scale 0 and all-zero
    codes. Row-local: no shuffle at any corpus size."""
    v = _as_double(F.col(vec_col))
    absmax = F.aggregate(
        v, F.lit(0.0), lambda a, b: F.greatest(a, F.abs(b))
    )
    scale = (absmax / F.lit(127.0)).alias("scale")
    codes = F.when(
        absmax == 0.0,
        F.transform(v, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x / (absmax / F.lit(127.0)) + F.lit(0.5)).cast(
                "int"
            ),
        )
    )
    return df.select(F.col(id_col), scale, codes.alias("codes"))
