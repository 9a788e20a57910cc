"""Report export — the analog of the reference's SPARQL+FreeMarker
exports (`Abecto.java:258-281`; templates under
`abecto-core/src/main/resources/de/uni_jena/cs/fusion/abecto/export/`):
deviations CSV (`export/deviations.rq:29-60`), resource-omissions CSV,
and the measurements Markdown table.

CSV goes through `DataFrameWriter.csv` (distributed); the Markdown
report collects the (tiny) measures aggregate driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEVIATION_COLS = [
    "aspect",
    "variable",
    "affected_dataset",
    "affected_resource",
    "affected_value",
    "compared_to_dataset",
    "compared_to_resource",
    "compared_to_value",
]


def export_deviations_csv(findings: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        findings.where(F.col("kind") == "deviation")
        .select(*DEVIATION_COLS)
        .orderBy(*DEVIATION_COLS)
        .write.mode(mode)
        .option("header", True)
        .csv(path)
    )


def export_omissions_csv(findings: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        findings.where(F.col("kind").isin("resource_omission", "value_omission"))
        .select("kind", *DEVIATION_COLS)
        .orderBy("kind", *DEVIATION_COLS)
        .write.mode(mode)
        .option("header", True)
        .csv(path)
    )


def measurements_markdown(measures: DataFrame) -> str:
    """Markdown table of the measures DataFrame (measure, dataset,
    compared_to, variable?, value) — the `measurementsMarkdown` export.
    The measures aggregate is at most O(|datasets|² · |variables|) rows,
    so a driver-side collect is the right plan."""
    cols = measures.columns
    has_var = "variable" in cols
    sel = ["measure", "dataset"]
    if has_var:
        sel.append("variable")
    rows = (
        measures.select(
            *sel,
            F.concat_ws(",", "compared_to").alias("compared_to")
            if "compared_to" in cols
            else F.lit("").alias("compared_to"),
            F.col("value").cast("string").alias("value"),
        )
        .orderBy("measure", "dataset")
        .collect()
    )
    header = sel + ["compared_to", "value"]
    out = ["| " + " | ".join(header) + " |", "|" + "---|" * len(header)]
    for r in rows:
        out.append("| " + " | ".join("" if v is None else str(v) for v in r) + " |")
    return "\n".join(out) + "\n"


def mapping_review(edges: DataFrame, values: DataFrame, variable: str) -> DataFrame:
    """The `mappingReview` export: correspondence pairs side-by-side with
    a chosen label variable from each side, for human review."""
    lab = (
        values.where(F.col("variable") == variable)
        .groupBy("resource")
        .agg(F.min("o_value").alias("label"))
    )
    la = lab.select(F.col("resource").alias("src"), F.col("label").alias("src_label"))
    lb = lab.select(F.col("resource").alias("dst"), F.col("label").alias("dst_label"))
    return (
        edges.join(F.broadcast(la), "src", "left")
        .join(F.broadcast(lb), "dst", "left")
        .select("src", "src_label", "dst", "dst_label")
    )
