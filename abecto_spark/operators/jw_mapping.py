"""Jaro-Winkler entity linking (the reference's
`JaroWinklerMappingProcessor.java:37-127`) as a blocked similarity join.

Pipeline per variable and unordered dataset pair:

  1. value index: distinct (dataset, variable, normalized value) with the
     resource fan-out kept long — scoring cost is per *distinct string*,
     exactly like the reference's trie (hot values dedup before scoring,
     which also de-skews the similarity join).
  2. candidate generation: positional 2-gram blocking over the first four
     characters (``s[0:2], s[1:3], s[2:4]``) — any single edit in the
     prefix still shares a gram, recall measured in tests; ``block="cross"``
     gives the exact cartesian for golden verification.
  3. scoring: Arrow-batched vectorized JW (functions/jw.py), thresholded.
  4. per-direction argmax with **ties kept** (`maxValue`,
     `JaroWinklerMappingProcessor.java:112-127`): ``rank() == 1`` over a
     window — rank, not row_number.
  5. bidirectional filter (`:91-98`, commutativity) = inner join of the
     two argmax sets.
  6. fan-out back to resources (cross product of the matched values'
     resource sets, `:100-104`) — AQE skew-join handles hot values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.jw import jw_score

SYNTHETIC_PREFIX = "\x00jw:"  # sorts before any real resource id


def _block_keys(col):
    """Array of positional 2-gram block keys over the first 4 chars."""
    return F.array_distinct(
        F.array(
            F.substring(col, 1, 2),
            F.substring(col, 2, 2),
            F.substring(col, 3, 2),
        )
    )


def jw_mapping(
    values: DataFrame,
    variables: list[str],
    threshold: float,
    case_sensitive: bool = False,
    block: str = "grams",
    star: bool = False,
) -> DataFrame:
    """Correspondence edges (src, dst) from JW linking over all unordered
    dataset pairs present in ``values``.

    ``values``: long table (dataset, resource, variable, o_kind, o_value,
    o_datatype, o_lang) — the aspect extraction output.
    """
    lit = values.where(
        (F.col("variable").isin(variables)) & (F.col("o_kind") == "literal")
    )
    norm = F.col("o_value") if case_sensitive else F.lower(F.col("o_value"))
    idx = lit.select(
        "dataset", "variable", norm.alias("value"), "resource"
    ).distinct()

    strings = idx.select("dataset", "variable", "value").distinct()

    if block == "cross":
        s1 = strings.select(
            F.col("dataset").alias("d1"), "variable", F.col("value").alias("v1")
        )
        s2 = strings.select(
            F.col("dataset").alias("d2"), "variable", F.col("value").alias("v2")
        )
        cand = s1.join(s2, "variable").where(F.col("d1") < F.col("d2"))
    else:
        keyed = strings.select(
            "dataset",
            "variable",
            "value",
            F.explode(_block_keys(F.col("value"))).alias("bk"),
        )
        s1 = keyed.select(
            F.col("dataset").alias("d1"), "variable", F.col("value").alias("v1"), "bk"
        )
        s2 = keyed.select(
            F.col("dataset").alias("d2"), "variable", F.col("value").alias("v2"), "bk"
        )
        cand = (
            s1.join(s2, ["variable", "bk"])
            .where(F.col("d1") < F.col("d2"))
            .drop("bk")
            .distinct()
        )

    scored = (
        cand.withColumn("score", jw_score(F.col("v1"), F.col("v2")))
        .where(F.col("score") >= F.lit(threshold))
    )

    w_fwd = Window.partitionBy("d1", "d2", "variable", "v1").orderBy(F.desc("score"))
    w_bwd = Window.partitionBy("d1", "d2", "variable", "v2").orderBy(F.desc("score"))
    fwd = scored.withColumn("r", F.rank().over(w_fwd)).where(F.col("r") == 1).drop("r")
    bwd = scored.withColumn("r", F.rank().over(w_bwd)).where(F.col("r") == 1).drop("r")
    bidi = fwd.join(
        bwd.select("d1", "d2", "variable", "v1", "v2"),
        ["d1", "d2", "variable", "v1", "v2"],
        "left_semi",
    )

    if star:
        # Scale path: hot values fan out to thousands of resources; the
        # pairwise cross product (`JaroWinklerMappingProcessor.java:100-104`)
        # is quadratic per matched value. Linking every resource to a
        # synthetic node per matched value pair yields IDENTICAL connected
        # components with linear edge count (SURVEY.md §2.1: "closure never
        # needs materializing as O(n²) pairs"). Strip the synthetic nodes
        # with closure.strip_synthetic after CC.
        pairnode = F.concat_ws(
            "\x1f", F.lit(SYNTHETIC_PREFIX.rstrip(":")), "variable", "d1", "v1", "d2", "v2"
        )
        bidi_n = bidi.withColumn("pn", pairnode)
        r1 = idx.select(
            F.col("dataset").alias("d1"), "variable", F.col("value").alias("v1"),
            F.col("resource").alias("src"),
        )
        r2 = idx.select(
            F.col("dataset").alias("d2"), "variable", F.col("value").alias("v2"),
            F.col("resource").alias("src"),
        )
        e1 = bidi_n.join(r1, ["d1", "variable", "v1"]).select(
            "src", F.col("pn").alias("dst")
        )
        e2 = bidi_n.join(r2, ["d2", "variable", "v2"]).select(
            "src", F.col("pn").alias("dst")
        )
        return e1.unionByName(e2).distinct()

    r1 = idx.select(
        F.col("dataset").alias("d1"),
        "variable",
        F.col("value").alias("v1"),
        F.col("resource").alias("src"),
    )
    r2 = idx.select(
        F.col("dataset").alias("d2"),
        "variable",
        F.col("value").alias("v2"),
        F.col("resource").alias("dst"),
    )
    edges = (
        bidi.join(r1, ["d1", "variable", "v1"])
        .join(r2, ["d2", "variable", "v2"])
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return edges
