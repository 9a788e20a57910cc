"""Deterministic corpus-mixture sampling: keep a configured fraction of
each stratum (source, language, …) for training-data mixing.

``DataFrame.sampleBy`` draws from ``rand()``, whose stream depends on
partition layout and row order — re-running after a repartition (or a
resume from checkpoint) selects a different corpus, and no external
oracle can replay it. Instead each row's inclusion is a pure function
of its key: ``u = ((key + salt) · 2654435761) mod 2³² / 2³²`` (Knuth's
multiplicative hash — equidistributed for sequential ids) and the row
survives iff ``u < fraction(stratum)``. Plain integer arithmetic, so
DuckDB replays it exactly; changing ``salt`` redraws the sample.

Scale: a broadcast of the tiny fractions map and a JVM-side filter —
no shuffle, no state; strata missing from the map are dropped (an
explicit mixture, not a passthrough).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH_A = 2654435761
_M = 1 << 32


def _u(key: Column, salt: int) -> Column:
    return F.pmod(
        (key.cast("bigint") + F.lit(salt)) * F.lit(_KNUTH_A), F.lit(_M)
    ).cast("double") / F.lit(float(_M))


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: int = 0,
) -> DataFrame:
    """Rows of ``df`` sampled at ``fractions[stratum]`` (strata not in
    the map are dropped), deterministically in the integer ``key_col``."""
    fmap = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(float(v))) for k, v in sorted(fractions.items())
        )
    )
    frac = F.coalesce(
        F.element_at(fmap, F.col(strata_col)), F.lit(0.0)
    )
    return df.where(_u(F.col(key_col), salt) < frac)


def mixture_upsample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    salt: int = 0,
) -> DataFrame:
    """Deterministic fractional up/down-sampling — the temperature-
    sampling shape multilingual training mixes need (mT5-style alpha
    weighting): each row is emitted ``floor(w)`` times plus one more iff
    its key-hash ``u < w - floor(w)``, so the expected multiplicity is
    exactly ``weights[stratum]``. A ``copy`` column (1..n) disambiguates
    the replicas downstream. Strata missing from the map are dropped,
    matching ``mixture_sample``.

    Same scale shape as ``mixture_sample``: a broadcast map lookup and a
    row-local ``sequence``/``explode`` — no shuffle, no state, and a
    replay with the same salt is bit-identical regardless of partition
    layout. Output growth is the intended mixture factor itself."""
    fmap = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(float(v))) for k, v in sorted(weights.items())
        )
    )
    w = F.coalesce(F.element_at(fmap, F.col(strata_col)), F.lit(0.0))
    n_copies = (
        F.floor(w) + F.when(_u(F.col(key_col), salt) < w - F.floor(w), 1).otherwise(0)
    ).cast("int")
    return (
        df.withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )
