#!/usr/bin/env python
"""Recompute the flagship-pipeline golden fingerprint
(KG_GOLDEN_N_TRIPLES / KG_GOLDEN_HASH in plans/entry_queries.py and the
kg_pipeline_triples oracle) **independently of DocsPipeline**.

Round-2 review caveat: the old generator ran the pipeline itself, making
the golden a regression fingerprint rather than a semantic oracle. This
version re-derives the expected triples from first principles:

  1. dump the S1 mention rows of the seed-deterministic corpus
     (extract_mentions is a plain regex scan — the "exported mention
     dump"),
  2. recompute the value-level JW links in DuckDB SQL
     (jaro_winkler_similarity, >= threshold, bidirectional ties-kept
     argmax — the same formulation as the jw_linking oracle),
  3. recompute the value-graph connected components with a 20-line
     union-find (match links + same-resource bridges), canonical id =
     min(resource) per cluster,
  4. materialize label + distinct sameAs triples with span provenance
     in pandas,
  5. fingerprint with the same count + xxhash64-sum digest the driver
     uses.

None of steps 2-4 call pipeline/closure/jw_mapping code. The script also
runs the real pipeline and FAILS LOUDLY if the two disagree, so an
accidental semantic drift cannot silently re-mint the golden.

Run after any *intentional* semantic change to the pipeline, then paste
the printed constants.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

THRESHOLD = 0.90  # PipelineConfig defaults (case-insensitive, label var)
VARIABLE = "label"


def independent_triples(mentions_pdf):
    """Steps 2-4: mention dump (pandas) -> expected triples (pandas)."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("mentions", mentions_pdf)

    # value index (case-insensitive normalization) and cross-dataset
    # value-level links: >= threshold, bidirectional ties-kept argmax per
    # (d1, d2, variable)
    links = con.execute(
        f"""
        WITH idx AS (
          SELECT DISTINCT dataset, variable, lower(value) AS v, resource
          FROM mentions),
        strings AS (SELECT DISTINCT dataset, variable, v FROM idx),
        scored AS (
          SELECT a.dataset AS d1, a.variable, a.v AS v1,
                 b.dataset AS d2, b.v AS v2,
                 CASE WHEN a.v = b.v THEN 1.0
                      ELSE jaro_winkler_similarity(a.v, b.v) END AS s
          FROM strings a JOIN strings b
            ON a.variable = b.variable AND a.dataset < b.dataset),
        thresh AS (SELECT * FROM scored WHERE s >= {THRESHOLD}),
        fwd AS (SELECT d1, variable, v1, d2, v2 FROM (
            SELECT *, rank() OVER (PARTITION BY d1, d2, variable, v1
                                   ORDER BY s DESC) r FROM thresh) WHERE r = 1),
        bwd AS (SELECT d1, variable, v1, d2, v2 FROM (
            SELECT *, rank() OVER (PARTITION BY d1, d2, variable, v2
                                   ORDER BY s DESC) r FROM thresh) WHERE r = 1)
        SELECT fwd.* FROM fwd JOIN bwd USING (d1, variable, v1, d2, v2)
        """
    ).df()
    idx = con.execute(
        "SELECT DISTINCT dataset, variable, lower(value) AS v, resource FROM mentions"
    ).df()

    # union-find over value nodes
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    vnode = lambda d, var, v: f"{d}\x1f{var}\x1f{v}"  # noqa: E731
    matched: set[str] = set()
    for r in links.itertuples(index=False):
        a, b = vnode(r.d1, r.variable, r.v1), vnode(r.d2, r.variable, r.v2)
        matched.update((a, b))
        union(a, b)
    # bridges: a resource holding two matched values merges their clusters
    idx["vn"] = [
        vnode(d, var, v) for d, var, v in zip(idx.dataset, idx.variable, idx.v)
    ]
    rv = idx[idx.vn.isin(matched)]
    for _res, grp in rv.groupby("resource"):
        vns = sorted(grp.vn)
        for other in vns[1:]:
            union(vns[0], other)

    # canonical id: min resource per value-cluster
    rv = rv.assign(vc=[find(x) for x in rv.vn])
    canon = rv.groupby("vc")["resource"].min().rename("canonical_id")
    rmap = rv.merge(canon, on="vc")[["resource", "canonical_id"]].drop_duplicates()

    # materialize: label triples per mention row + distinct sameAs rows
    m = mentions_pdf.merge(rmap, on="resource", how="left")
    m["canonical_id"] = m["canonical_id"].fillna(m["resource"])
    m["s"] = "urn:entity:" + m["canonical_id"]
    labels = pd.DataFrame(
        {
            "s": m["s"], "p": m["variable"], "o_kind": "literal",
            "o_value": m["value"], "doc_id": m["doc_id"],
            "span_idx": m["span_idx"].astype("int32"),
        }
    )
    same_as = pd.DataFrame(
        {
            "s": m["s"], "p": "sameAs", "o_kind": "iri",
            "o_value": "urn:doc:" + m["doc_id"], "doc_id": m["doc_id"],
            "span_idx": m["span_idx"].astype("int32"),
        }
    ).drop_duplicates()
    return pd.concat([labels, same_as], ignore_index=True)


def fingerprint(spark, pdf):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pdf,
        "s string, p string, o_kind string, o_value string,"
        " doc_id string, span_idx int",
    )
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64("s", "p", "o_kind", "o_value", "doc_id", "span_idx"),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def main() -> int:
    from abecto_spark.operators.extract import DEFAULT_RULES, extract_mentions
    from abecto_spark.plans.entry_queries import kg_pipeline_triples_df, synth_docs_cached
    from abecto_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    docs = synth_docs_cached(spark, n_docs=1500, n_entities=120)
    mentions = extract_mentions(docs, DEFAULT_RULES).toPandas()

    n, h = fingerprint(spark, independent_triples(mentions))
    print(f"KG_GOLDEN_N_TRIPLES = {n}")
    print(f"KG_GOLDEN_HASH = {h}")

    # cross-check: the real pipeline must agree — if not, one of the two
    # derivations has drifted and the golden must NOT be updated blindly
    from pyspark.sql import functions as F

    t = kg_pipeline_triples_df(spark)
    row = t.agg(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64("s", "p", "o_kind", "o_value", "doc_id", "span_idx"),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
    ).collect()[0]
    if (int(row["n"]), int(row["h"])) != (n, h):
        print(
            f"MISMATCH: pipeline produced n={row['n']} h={row['h']} — "
            "independent recomputation disagrees; investigate before"
            " updating the golden",
            file=sys.stderr,
        )
        return 1
    print("pipeline agrees with the independent recomputation")
    return 0


if __name__ == "__main__":
    sys.exit(main())
