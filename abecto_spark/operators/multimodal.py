"""Multimodal span handling: image/audio/video payloads travel as opaque
``binary`` columns with typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages.

The decode kernels themselves are STUBBED in this environment (no
image/audio libraries in the container): ``decode=`` accepts a callable so
a real deployment plugs in PIL/torchaudio/ffmpeg; the default
deterministic fake derives pseudo-features from the payload bytes so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested end to end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, kind string,"
    " feature array<float>, feat_dim int, decode_ok boolean"
)


def media_spans(docs: DataFrame) -> DataFrame:
    """Extract non-text spans from the interleaved docs table into the
    typed media table (payload fetch is deployment-specific; here the
    media_ref is carried as an opaque locator, payload left null)."""
    return (
        docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") != "text")
        .select(
            "doc_id",
            F.col("span_idx").cast("int"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.kind").alias("kind"),
            F.lit(None).cast("binary").alias("payload"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        )
    )


def _fake_decode(refs: pd.Series, payloads: pd.Series, dim: int) -> np.ndarray:
    """Deterministic pseudo-features from the locator/payload bytes —
    stands in for a real image/audio decoder in this container. The
    formula (first byte * 131 + byte length, stepped by 7 per dimension,
    mod 1000, scaled to [0, 1)) is deliberately plain-SQL-reproducible so
    the driver's DuckDB oracle can verify the whole mapInPandas plumbing
    end to end (entry_queries.q_multimodal_features)."""
    out = np.zeros((len(refs), dim), dtype=np.float32)
    steps = 7 * np.arange(dim, dtype=np.int64)
    for i, (ref, pl) in enumerate(zip(refs, payloads)):
        data = pl if pl is not None else (ref or "").encode()
        if len(data) == 0:
            continue
        base = int(data[0]) * 131 + len(data)
        out[i] = ((base + steps) % 1000).astype(np.float32) / 1000.0
    return out


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decode: Callable[[pd.Series, pd.Series, int], np.ndarray] | None = None,
) -> DataFrame:
    """Feature-extraction stage over media spans (Arrow batches). Pass a
    real ``decode`` in production; the default is the deterministic fake.

    Raises NotImplementedError at execution time if ``decode='strict'`` is
    requested — the marker for the unavailable real decoder path.
    """
    dec = decode or _fake_decode
    if dec == "strict":  # pragma: no cover - deployment marker

        def dec(refs, payloads, d):
            raise NotImplementedError(
                "real media decoding requires image/audio libs not present here"
            )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = dec(pdf["media_ref"], pdf["payload"], dim)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": list(feats),
                    "feat_dim": dim,
                    "decode_ok": True,
                }
            )

    # media payloads can be huge: repartition by doc so batches stay bounded
    return media.repartition("doc_id").mapInPandas(run, schema=FEATURE_SCHEMA)
