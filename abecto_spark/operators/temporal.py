"""Temporal joins — the two event-table operators Spark's built-in
join strategies don't express directly, re-expressed as compositions
of windows and bucketized equi-joins (no Python in the hot path):

  * asof_join      — attach to each left row the latest right row at or
                     before it (per key), the classic time-series
                     enrichment join.  NOT a per-row probe: both sides
                     are tagged and unioned, then ONE window pass per
                     key ordered by (time, side) carries the last
                     non-null right payload forward — a single shuffle
                     on the key, sort bounded per key group, no range
                     cross-join anywhere.  ``direction="forward"``
                     mirrors the ordering for nearest-following;
                     ``tolerance_sec`` nulls matches older than the
                     bound (the pandas ``merge_asof`` contract).
  * interval_join  — match point rows to interval rows of the same key
                     (start <= t < end).  The naive plan is a range
                     join (O(|P|·|I|) per key); here each interval is
                     exploded onto the fixed time buckets it covers and
                     points carry their bucket, so the match becomes a
                     (key, bucket) equi-join plus a residual range
                     filter.  Blowup is bounded by interval_len /
                     bucket_seconds rows per interval — callers pick
                     ``bucket_seconds`` near the typical interval
                     length (the standard bucketized range-join
                     rewrite).

Both operators assume the right/interval side is unique per (key,
time): with duplicates the winner among equal timestamps is plan-
dependent (exactly as in DuckDB's ASOF JOIN); dedup upstream when the
source can repeat.

Scale notes: asof_join's one window partitions on the join key — at
corpus scale that's a high-cardinality entity/user key, so no reducer
hot-spots beyond natural key skew (salt upstream if one key dominates).
interval_join shuffles on (key, bucket), never materializing the
unbucketized range product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(col):
    """Microseconds since epoch for TIMESTAMP or TIMESTAMP_NTZ columns.

    Parquet event times load as TIMESTAMP_NTZ, which ``unix_micros``
    rejects; the cast is a bijection because get_spark pins
    spark.sql.session.timeZone to UTC (documented session invariant)."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    time_col: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with ``right_cols``
    from the latest ``right`` row with ``right.time_col <= left.time_col``
    (same ``on`` key; ``direction="forward"`` flips to the earliest
    right row at or after).  Unmatched left rows keep NULL payloads.

    Returns all ``left`` columns plus ``right_cols``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"bad direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != time_col
        ]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {clash}")

    l_tag = left.withColumn("__asof_side", F.lit(0))
    for c in right_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__asof_rt", F.lit(None).cast(right.schema[time_col].dataType))
    r_tag = right.select(
        *keys,
        F.col(time_col),
        F.lit(1).alias("__asof_side"),
        *[F.col(c) for c in right_cols],
        F.col(time_col).alias("__asof_rt"),
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    both = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # at equal timestamps the right row must sort before the left row so
    # an exact-time match is visible to it (backward is inclusive)
    if direction == "backward":
        order = [F.col(time_col).asc(), F.col("__asof_side").desc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:
        order = [F.col(time_col).desc(), F.col("__asof_side").desc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(*frame)

    carried = both
    for c in right_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    carried = carried.withColumn("__asof_rt", F.last("__asof_rt", ignorenulls=True).over(w))

    out = carried.where(F.col("__asof_side") == 0)
    if tolerance_sec is not None:
        # microsecond-exact gap — unix_timestamp would truncate to the
        # second and mis-classify matches at the tolerance boundary
        gap = F.abs(
            _micros(F.col(time_col)) - _micros(F.col("__asof_rt"))
        )
        keep = F.col("__asof_rt").isNotNull() & (
            gap <= int(tolerance_sec) * 1_000_000
        )
        for c in right_cols:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out.select(*left.columns, *right_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    time_col: str,
    start_col: str,
    end_col: str,
    interval_cols: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of point rows to the interval rows of the same key
    that contain them (``start <= t < end``), via the bucketized
    range-join rewrite: intervals explode onto the ``bucket_seconds``
    grid they cover, points carry their grid cell, and the match is a
    (key, bucket) equi-join with a residual range filter.

    Returns all ``points`` columns plus ``interval_cols`` (default:
    every interval column except the key and the two bounds).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if interval_cols is None:
        interval_cols = [
            c
            for c in intervals.columns
            if c not in keys and c not in (start_col, end_col)
        ]
    clash = set(interval_cols) & set(points.columns)
    if clash:
        raise ValueError(f"interval_cols collide with point columns: {clash}")
    # microsecond-exact bounds (unix_timestamp truncates to the second,
    # which would misplace sub-second boundaries relative to the exact
    # range filter below)
    bucket_us = int(bucket_seconds) * 1_000_000
    i_exp = intervals.select(
        *keys,
        _micros(F.col(start_col)).alias("_s"),
        _micros(F.col(end_col)).alias("_e"),
        *[F.col(c) for c in interval_cols],
    ).where(F.col("_s") < F.col("_e"))
    # half-open [start, end): the last covered bucket is the one holding
    # end - 1µs, so back-to-back intervals never double-claim a boundary.
    # `div` = exact integer division (floor(a/b) through doubles can be
    # off by one ulp at bucket boundaries)
    i_exp = i_exp.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"_s div {bucket_us}"),
                F.expr(f"(_e - 1) div {bucket_us}"),
            )
        ),
    )
    p = points.withColumn(
        "_t", _micros(F.col(time_col))
    ).withColumn("_bucket", F.expr(f"_t div {bucket_us}"))
    joined = p.join(i_exp, keys + ["_bucket"]).where(
        (F.col("_t") >= F.col("_s")) & (F.col("_t") < F.col("_e"))
    )
    return joined.select(*points.columns, *interval_cols)
