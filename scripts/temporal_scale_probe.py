#!/usr/bin/env python
"""Temporal-join dress rehearsal (the events-family analog of the graph
probe): deterministic synthetic event/quote/interval tables orders of
magnitude beyond the sf0.1 bench inputs, with planted key skew, driven
through asof_join and interval_join — the operators whose scale claims
SCALE.md models (one window pass keyed on the join key; bucketized
equi-join instead of a range product).

Data: --left L point rows and --right R quote rows over --keys K keys
via xxhash64 (uniform), plus --hot-frac of left rows redirected onto
ONE hot key (the bot-user skew that concentrates a per-key window).
Intervals: R rows of [start, start+len) with len up to --max-len-min
minutes.  All derivation is hash-deterministic (no rand()).

Usage: python scripts/temporal_scale_probe.py [--left 50000000]
Prints one JSON line with per-operator wall seconds and output sizes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", type=int, default=50_000_000)
    ap.add_argument("--right", type=int, default=5_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--hot-frac", type=float, default=0.02)
    ap.add_argument("--span-hours", type=int, default=720)
    ap.add_argument("--max-len-min", type=int, default=20)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from abecto_spark.operators.temporal import asof_join, interval_join
    from abecto_spark.session import get_spark

    spark = get_spark(
        app_name="abecto_temporal_probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )

    span_us = args.span_hours * 3600 * 1_000_000
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")

    def key_col(seed: int):
        k = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(args.keys))
        hot = F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(10_000)) < int(
            args.hot_frac * 10_000
        )
        return F.when(hot, F.lit(0)).otherwise(k)

    def ts_col(seed: int):
        off = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(span_us))
        return F.timestamp_micros(F.unix_micros(base) + off)

    left = spark.range(args.left).select(
        F.col("id").alias("event_id"),
        key_col(11).alias("k"),
        ts_col(12).alias("ts"),
    ).localCheckpoint(eager=True)
    right = (
        spark.range(args.right)
        .select(
            key_col(21).alias("k"),
            ts_col(22).alias("ts"),
            (F.pmod(F.xxhash64("id", F.lit(23)), F.lit(1_000_000)) / 1e6)
            .alias("v"),
        )
        .dropDuplicates(["k", "ts"])
        .localCheckpoint(eager=True)
    )
    max_len_us = args.max_len_min * 60 * 1_000_000
    intervals = (
        spark.range(args.right)
        .select(
            F.col("id").alias("iid"),
            key_col(31).alias("k"),
            ts_col(32).alias("s"),
            F.pmod(F.xxhash64("id", F.lit(33)), F.lit(max_len_us)).alias("_len"),
        )
        .select(
            "iid", "k", "s",
            F.timestamp_micros(F.unix_micros(F.col("s")) + F.col("_len") + 1)
            .alias("e"),
        )
        .localCheckpoint(eager=True)
    )

    out = {
        "left": left.count(), "right": right.count(),
        "intervals": intervals.count(), "keys": args.keys,
        "hot_frac": args.hot_frac, "cpus": args.cpus,
        "load_before": os.getloadavg(),
    }

    def run(name, fn):
        # checksum over EVERY output column: a bare count() would let
        # Catalyst prune the unused window/join columns and time an
        # emptier plan than the operator's real one
        t0 = time.time()
        res = fn()
        row = res.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*res.columns).cast("double")).alias("chk"),
        ).collect()[0]
        out[name] = {"sec": round(time.time() - t0, 1), "rows": row["n"]}
        print(f"{name}: {out[name]}", file=sys.stderr)

    run("asof_backward", lambda: asof_join(left, right, on="k", time_col="ts"))
    run(
        "asof_tolerance_1h",
        lambda: asof_join(
            left, right, on="k", time_col="ts", tolerance_sec=3600
        ),
    )
    run(
        "interval_join_30m_buckets",
        lambda: interval_join(
            left, intervals, on="k", time_col="ts",
            start_col="s", end_col="e", bucket_seconds=1800,
        ),
    )
    out["load_after"] = os.getloadavg()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
