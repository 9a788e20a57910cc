"""Deterministic synthetic interleaved text+media document table
(FIXTURES.md F1, BASELINE.json input_hint):

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string, media_ref:string,
                             offset:int>>)

Every doc belongs to one of ``n_datasets`` sources and mentions exactly one
entity from a shared pool inside one text span, marked ``[[...]]`` (the
extraction rule of the pipeline). Mention surface forms carry deterministic
typo noise: true links stay above JW 0.9, distractors below. Pairwise
entity overlap between datasets mirrors the reference benchmark generator
(`abecto-benchmark/.../ComparisonBenchmarkDataSupplier.java:40-57`), and a
1% slice of entities receives a ~``hot_boost``× mention frequency to
exercise skew handling (salting/AQE).

Generation is fully distributed and seed-deterministic: every field is a
hash function of (seed, doc index) computed with vectorized pandas/numpy in
``mapInPandas`` — no driver-side loops, no Python RNG state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..model import DOCS_SCHEMA

_CONS = np.array(list("bcdfghklmnprstvz"))
_VOW = np.array(list("aeiou"))


def _entity_names(n_entities: int, seed: int) -> np.ndarray:
    """Deterministic pronounceable two-word canonical names."""
    rng = np.random.RandomState(seed)
    syll = np.char.add(
        _CONS[rng.randint(0, len(_CONS), (n_entities, 8))],
        _VOW[rng.randint(0, len(_VOW), (n_entities, 8))],
    )
    first = np.char.add(np.char.add(syll[:, 0], syll[:, 1]), syll[:, 2])
    last = np.char.add(np.char.add(syll[:, 3], syll[:, 4]), np.char.add(syll[:, 5], syll[:, 6]))
    names = np.char.add(np.char.add(np.char.capitalize(first), " "), np.char.capitalize(last))
    return names.astype("U64")


def _hash(a: np.ndarray, salt: int) -> np.ndarray:
    """Vectorized 64-bit mix (splitmix64-style) of int array + salt."""
    with np.errstate(over="ignore"):
        x = a.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) % 2**64)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def synth_docs(
    spark: SparkSession,
    n_docs: int = 10_000,
    n_datasets: int = 3,
    n_entities: int = 1_000,
    seed: int = 42,
    hot_frac: float = 0.01,
    hot_boost: int = 100,
    typo_rate: float = 0.5,
    partitions: int | None = None,
) -> DataFrame:
    names = _entity_names(n_entities, seed)
    bnames = spark.sparkContext.broadcast(names)
    n_hot = max(1, int(n_entities * hot_frac))

    def gen(batches):
        nm = bnames.value
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            n = len(idx)
            dataset = _hash(idx, seed + 1) % np.uint64(n_datasets)
            # skewed entity choice: hot_boost-fold weight on the first n_hot
            r = _hash(idx, seed + 2) % np.uint64(1_000_000)
            hot_mass = n_hot * hot_boost
            total = hot_mass + (len(nm) - n_hot)
            pick = (r.astype(np.float64) / 1e6 * total).astype(np.int64)
            ent = np.where(pick < hot_mass, pick // hot_boost, pick - hot_mass + n_hot)
            ent = np.minimum(ent, len(nm) - 1)

            mention = nm[ent].astype("U64")
            # deterministic typo keyed by (entity, dataset): one surface
            # form per entity per dataset (mirrors the reference benchmark's
            # dataset-specific value errors) — still JW>=0.93 vs canonical
            ed = ent * np.int64(64) + dataset.astype(np.int64)
            do_typo = (_hash(ed, seed + 3) % np.uint64(1000)) < np.uint64(int(typo_rate * 1000))
            pos = (_hash(ed, seed + 4) % np.uint64(6)).astype(np.int64) + 2
            sub = _CONS[(_hash(ed, seed + 5) % np.uint64(len(_CONS))).astype(np.int64)]
            mv = mention.view(np.uint32).reshape(n, -1)
            rows = np.flatnonzero(do_typo)
            mv[rows, pos[rows]] = np.char.encode(sub[rows], "utf-32-le").view(np.uint32)

            n_spans = (_hash(idx, seed + 6) % np.uint64(4)).astype(np.int64) + 2
            has_media = (_hash(idx, seed + 7) % np.uint64(2)).astype(bool)

            doc_ids = np.char.add(
                np.char.add("d", dataset.astype("U2")),
                np.char.add("-", np.char.zfill(idx.astype("U12"), 10)),
            )
            out_docs, out_spans = [], []
            filler = "lorem ipsum dolor sit amet"
            for i in range(n):
                spans = []
                off = 0
                k = int(n_spans[i])
                mention_at = int(_hash(idx[i : i + 1], seed + 8)[0] % k)
                for s in range(k):
                    if s == mention_at:
                        text = f"{filler} [[{mention[i]}]] {filler}"
                        spans.append(("text", text, "", off))
                        off += len(text)
                    elif has_media[i] and s == (mention_at + 1) % k:
                        spans.append(("image", "", f"media://{doc_ids[i]}/{s}", off))
                        off += 1
                    else:
                        spans.append(("text", filler, "", off))
                        off += len(filler)
                out_docs.append(doc_ids[i])
                out_spans.append(spans)
            yield pd.DataFrame({"doc_id": out_docs, "spans": out_spans})

    base = spark.range(n_docs, numPartitions=partitions)
    return base.mapInPandas(gen, schema=DOCS_SCHEMA)


def true_links(
    spark: SparkSession,
    n_docs: int,
    n_datasets: int = 3,
    n_entities: int = 1_000,
    seed: int = 42,
    hot_frac: float = 0.01,
    hot_boost: int = 100,
) -> DataFrame:
    """Ground truth for tests: (doc_id, dataset, entity_id) per doc —
    derived with the same hash functions as ``synth_docs``."""
    import pyspark.sql.functions as F  # noqa: F401

    names = _entity_names(n_entities, seed)
    n_hot = max(1, int(n_entities * hot_frac))

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            dataset = _hash(idx, seed + 1) % np.uint64(n_datasets)
            r = _hash(idx, seed + 2) % np.uint64(1_000_000)
            hot_mass = n_hot * hot_boost
            total = hot_mass + (len(names) - n_hot)
            pick = (r.astype(np.float64) / 1e6 * total).astype(np.int64)
            ent = np.where(pick < hot_mass, pick // hot_boost, pick - hot_mass + n_hot)
            ent = np.minimum(ent, len(names) - 1)
            doc_ids = np.char.add(
                np.char.add("d", dataset.astype("U2")),
                np.char.add("-", np.char.zfill(idx.astype("U12"), 10)),
            )
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "dataset": np.char.add("d", dataset.astype("U2")),
                    "entity_id": ent,
                }
            )

    return spark.range(n_docs).mapInPandas(
        gen, schema="doc_id string, dataset string, entity_id long"
    )
