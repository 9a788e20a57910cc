"""Unit tests for operators/temporal.py (as-of join, interval join) on
hand-built event tables with enumerated expectations."""

from __future__ import annotations

import datetime as dt

import pytest

from abecto_spark.operators.temporal import asof_join, interval_join
from tests.conftest import rows_set


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


def _quotes(spark):
    # per-key price stream: key 1 has prices at :00, :10, :30; key 2 at :05
    return spark.createDataFrame(
        [
            (1, _ts(0), 100.0),
            (1, _ts(10), 110.0),
            (1, _ts(30), 130.0),
            (2, _ts(5), 200.0),
        ],
        "k bigint, ts timestamp, price double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [
            (10, 1, _ts(9)),   # after :00, before :10 -> 100.0
            (11, 1, _ts(10)),  # exactly :10 -> inclusive match 110.0
            (12, 1, _ts(45)),  # after :30 -> 130.0
            (13, 2, _ts(4)),   # before first quote -> NULL
            (14, 3, _ts(20)),  # key with no quotes -> NULL
        ],
        "trade_id bigint, k bigint, ts timestamp",
    )


def test_asof_backward_basic(spark):
    got = rows_set(
        asof_join(_trades(spark), _quotes(spark), on="k", time_col="ts"),
        "trade_id", "price",
    )
    assert got == {
        (10, 100.0), (11, 110.0), (12, 130.0), (13, None), (14, None),
    }


def test_asof_forward(spark):
    got = rows_set(
        asof_join(
            _trades(spark), _quotes(spark), on="k", time_col="ts",
            direction="forward",
        ),
        "trade_id", "price",
    )
    # nearest quote at-or-after: trade 10 -> :10, 11 -> :10 (inclusive),
    # 12 -> none after :45, 13 -> :05, 14 -> none
    assert got == {
        (10, 110.0), (11, 110.0), (12, None), (13, 200.0), (14, None),
    }


def test_asof_tolerance(spark):
    got = rows_set(
        asof_join(
            _trades(spark), _quotes(spark), on="k", time_col="ts",
            tolerance_sec=300,
        ),
        "trade_id", "price",
    )
    # 5-minute tolerance: trade 10 (9 min after :00) and trade 12
    # (15 min after :30) both drop to NULL; the exact-time match stays
    assert got == {
        (10, None), (11, 110.0), (12, None), (13, None), (14, None),
    }


def test_asof_microsecond_precision(spark):
    right = spark.createDataFrame(
        [(1, _ts(0, 0, 500_000), 1.0)], "k bigint, ts timestamp, v double"
    )
    left = spark.createDataFrame(
        [(1, 1, _ts(0, 0, 499_999)), (2, 1, _ts(0, 0, 500_000))],
        "i bigint, k bigint, ts timestamp",
    )
    got = rows_set(
        asof_join(left, right, on="k", time_col="ts"), "i", "v"
    )
    assert got == {(1, None), (2, 1.0)}


def test_asof_column_clash_is_loud(spark):
    with pytest.raises(ValueError):
        asof_join(
            _quotes(spark), _quotes(spark), on="k", time_col="ts"
        )  # price exists on both sides


def test_interval_join_basic(spark):
    intervals = spark.createDataFrame(
        [
            (1, _ts(0), _ts(10), 100),   # [12:00, 12:10)
            (1, _ts(10), _ts(20), 101),  # back-to-back [12:10, 12:20)
            (2, _ts(0), _ts(30), 200),
        ],
        "k bigint, s timestamp, e timestamp, iid bigint",
    )
    points = spark.createDataFrame(
        [
            (1, 1, _ts(5)),    # inside 100
            (2, 1, _ts(10)),   # boundary: half-open -> 101, not 100
            (3, 1, _ts(20)),   # end boundary of 101 -> no match
            (4, 2, _ts(29, 59)),
            (5, 3, _ts(5)),    # no intervals for key 3
        ],
        "pid bigint, k bigint, ts timestamp",
    )
    got = rows_set(
        interval_join(
            points, intervals, on="k", time_col="ts",
            start_col="s", end_col="e", bucket_seconds=300,
        ),
        "pid", "iid",
    )
    assert got == {(1, 100), (2, 101), (4, 200)}


def test_interval_join_overlapping_and_spanning(spark):
    # one interval spans many buckets; two intervals overlap the point
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(59), 1), (1, _ts(4), _ts(6), 2)],
        "k bigint, s timestamp, e timestamp, iid bigint",
    )
    points = spark.createDataFrame(
        [(1, 1, _ts(5))], "pid bigint, k bigint, ts timestamp"
    )
    got = rows_set(
        interval_join(
            points, intervals, on="k", time_col="ts",
            start_col="s", end_col="e", bucket_seconds=60,
        ),
        "pid", "iid",
    )
    assert got == {(1, 1), (1, 2)}


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized (seeded) parity against pandas.merge_asof — the
    de-facto reference semantics for backward-inclusive as-of joins,
    including the tolerance contract — over 500 trades x 200 quotes,
    10 keys, microsecond timestamps with no (key, ts) duplicates."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(0)
    base = np.datetime64("2024-01-01T00:00:00", "us")

    def times(n):
        # unique microsecond offsets so the right side is (key, ts)-unique
        offs = rng.choice(10_000_000, size=n, replace=False)
        return base + offs.astype("timedelta64[us]")

    left = pd.DataFrame({
        "i": np.arange(500),
        "k": rng.randint(0, 10, 500),
        "ts": times(500),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 10, 200),
        "ts": times(200),
        "v": rng.rand(200).round(6),
    }).drop_duplicates(["k", "ts"])

    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward", allow_exact_matches=True,
    )
    got_df = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", time_col="ts",
    ).toPandas()

    e = {(int(r.i), None if pd.isna(r.v) else float(r.v))
         for r in exp.itertuples()}
    g = {(int(r.i), None if pd.isna(r.v) else float(r.v))
         for r in got_df.itertuples()}
    assert g == e

    # tolerance contract parity (5-second bound)
    exp_t = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward", allow_exact_matches=True,
        tolerance=pd.Timedelta(seconds=5),
    )
    got_t = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", time_col="ts", tolerance_sec=5,
    ).toPandas()
    e = {(int(r.i), None if pd.isna(r.v) else float(r.v))
         for r in exp_t.itertuples()}
    g = {(int(r.i), None if pd.isna(r.v) else float(r.v))
         for r in got_t.itertuples()}
    assert g == e


def test_interval_join_matches_naive(spark):
    """Randomized (seeded) parity against the naive range join over the
    same data — the bucketized rewrite must change the plan, never the
    rows, including intervals spanning many buckets."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(1)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    p = pd.DataFrame({
        "pid": np.arange(300),
        "k": rng.randint(0, 5, 300),
        "ts": base + rng.randint(0, 3_600_000_000, 300).astype("timedelta64[us]"),
    })
    starts = rng.randint(0, 3_600_000_000, 40)
    lengths = rng.randint(1, 1_200_000_000, 40)  # up to 20 min
    iv = pd.DataFrame({
        "k": rng.randint(0, 5, 40),
        "s": base + starts.astype("timedelta64[us]"),
        "e": base + (starts + lengths).astype("timedelta64[us]"),
        "iid": np.arange(40),
    })
    naive = p.merge(iv, on="k")
    naive = naive[(naive.ts >= naive.s) & (naive.ts < naive.e)]
    exp = {(int(r.pid), int(r.iid)) for r in naive.itertuples()}
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            spark.createDataFrame(p), spark.createDataFrame(iv),
            on="k", time_col="ts", start_col="s", end_col="e",
            bucket_seconds=60,
        ).collect()
    }
    assert got == exp and got
