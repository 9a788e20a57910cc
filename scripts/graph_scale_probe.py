#!/usr/bin/env python
"""Graph-analytics dress rehearsal (the graph-family analog of the 10M-doc
pipeline rehearsal): a deterministic synthetic graph orders of magnitude
beyond the sf0.1 bench inputs, with planted hubs, driven through the
operators whose scale behavior SCALE.md models — PageRank (k iterations of
|E| scans + |V| shuffles), degree-oriented triangle counting (the hub-cap
claim), and k-core peeling.

Graph: --edges E over --nodes V endpoints via xxhash64 (uniform), plus
--hub-frac of edges redirected onto --hubs hot destinations, giving the
skew that breaks naive triangle enumeration.  All derivation is
hash-deterministic (no rand()).

Usage: python scripts/graph_scale_probe.py [--edges 10000000]
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
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--hubs", type=int, default=100)
    ap.add_argument("--hub-frac", type=float, default=0.02)
    ap.add_argument("--kcore-k", type=int, default=25)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from abecto_spark.operators.graph_stats import (
        bfs_distances,
        degree_stats,
        kcore,
        pagerank,
        personalized_pagerank,
        triangle_counts,
    )
    from abecto_spark.session import get_spark

    spark = get_spark(
        app_name="abecto_graph_probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )

    base = spark.range(args.edges).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(args.nodes)).alias("src"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000))
            < int(args.hub_frac * 10_000),
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(args.hubs)),
        )
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(args.nodes)))
        .alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    edges = base.localCheckpoint(eager=True)
    n_edges = edges.count()

    out = {"edges": n_edges, "nodes": args.nodes, "hubs": args.hubs,
           "hub_frac": args.hub_frac, "cpus": args.cpus,
           "load_before": os.getloadavg()}

    def run(name, fn):
        t0 = time.time()
        res = fn()
        cnt = res.count()
        out[name] = {"sec": round(time.time() - t0, 1), "rows": cnt}
        print(f"{name}: {out[name]}", file=sys.stderr)

    run("degree_stats", lambda: degree_stats(edges))
    run("pagerank_k5", lambda: pagerank(edges, iterations=5))
    run("triangle_counts", lambda: triangle_counts(edges))
    run("kcore", lambda: kcore(edges, k=args.kcore_k, max_rounds=30))

    # multi-source BFS from ~1% of nodes (node % 97 == 0 — the driver
    # query's deterministic seed rule) and personalized PageRank from
    # the same seeds: the frontier/teleport scale behavior at hub skew
    nodes_df = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = nodes_df.where(F.col("node") % 97 == 0).localCheckpoint(eager=True)
    out["seeds"] = seeds.count()
    run("bfs_distances_d6", lambda: bfs_distances(edges, seeds, max_depth=6))
    run("ppr_k5", lambda: personalized_pagerank(edges, seeds, iterations=5))

    # final-surface graph ops: HITS (PageRank's shuffle budget × 2),
    # weighted SSSP (|E| join per relaxation, no settled pruning),
    # deterministic walks (one ranking window + length equi-joins), and
    # harmonic centrality from a SPARSER sample — its state is
    # O(|S| · reach), so the probe uses ~0.1% of nodes (% 997) to stay
    # inside the documented seed-sample budget at 1M nodes
    from abecto_spark.operators.graph_stats import (
        deterministic_walks,
        harmonic_centrality,
        hits,
        weighted_distances,
    )

    run("hits_k5", lambda: hits(edges, iterations=5))
    wedges = edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    ).localCheckpoint(eager=True)
    run("sssp_w_d6", lambda: weighted_distances(wedges, seeds, max_hops=6))
    run("walks_l5", lambda: deterministic_walks(edges, seeds, walk_length=5))
    sparse_seeds = nodes_df.where(F.col("node") % 997 == 0).localCheckpoint(
        eager=True
    )
    out["sparse_seeds"] = sparse_seeds.count()
    run("harmonic_d4_sparse",
        lambda: harmonic_centrality(edges, sparse_seeds, max_depth=4))
    out["load_after"] = os.getloadavg()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
