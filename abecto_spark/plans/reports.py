"""Report export — the analog of the reference's SPARQL+FreeMarker
exports (`Abecto.java:258-281`; templates under
`abecto-core/src/main/resources/de/uni_jena/cs/fusion/abecto/export/`):
deviations CSV (`export/deviations.rq:29-60`), resource-omissions CSV,
and the measurements Markdown table.

CSV goes through `DataFrameWriter.csv` (distributed); the Markdown
report collects the (tiny) measures aggregate driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def deviations_report_rows(findings: DataFrame) -> DataFrame:
    """The deviations-CSV row relation (`export/deviations.rq:29-60`) —
    shared by :func:`export_deviations_csv` and the driver-contract
    ``report_deviations`` oracle row, so the export projection itself is
    hash-checked."""
    return findings.where(F.col("kind") == "deviation").select(*DEVIATION_COLS)


def omissions_report_rows(findings: DataFrame) -> DataFrame:
    """The omissions-CSV row relation (resource + value omissions)."""
    return findings.where(
        F.col("kind").isin("resource_omission", "value_omission")
    ).select("kind", *DEVIATION_COLS)


def export_deviations_csv(findings: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        deviations_report_rows(findings)
        .orderBy(*DEVIATION_COLS)
        .write.mode(mode)
        .option("header", True)
        .csv(path)
    )


def export_omissions_csv(findings: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        omissions_report_rows(findings)
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


def deviations_markdown(findings: DataFrame, max_per_group: int = 10_000) -> str:
    """Markdown deviation report grouped by dataset → aspect with a
    ready-to-paste wrong-value annotation snippet per row — the
    `deviationsMarkdown` export (`export/deviationsMarkdown.rq:29-71`,
    table layout `export/deviationsMarkdown.ftl`). The reference's
    snippet is a Turtle `av:WrongValue` annotation; this engine's
    wrong-value channel is the ``wrong_values`` DataFrame
    (property_cmp.property_comparison), so the snippet is the matching
    (dataset, resource, variable, o_value) row literal.

    A human-readable report must not pull billions of findings to the
    driver: each (dataset, aspect) section is capped at
    ``max_per_group`` rows (deterministic rank by resource/variable,
    distributed row_number) with an elided-count footer; bulk consumers
    use the distributed ``export_deviations_csv``."""
    dev = findings.where(F.col("kind") == "deviation").select(*DEVIATION_COLS)
    w = Window.partitionBy("affected_dataset", "aspect").orderBy(
        "affected_resource", "variable", "compared_to_dataset",
        "compared_to_resource", "compared_to_value", "affected_value",
    )
    wc = Window.partitionBy("affected_dataset", "aspect")
    rows = (
        dev.withColumn("_rn", F.row_number().over(w))
        .withColumn("_total", F.count(F.lit(1)).over(wc))
        .where(F.col("_rn") <= max_per_group)
        .orderBy("affected_dataset", "aspect", "_rn")
        .collect()
    )
    out: list[str] = []
    prev_ds = prev_aspect = None
    elided: list[tuple[str, str, int]] = []
    header = (
        "| Resource | Variable Name | Value | Compared Value | Compared Resource "
        "| Compared Dataset | Wrong Compared Value Annotate Snippet |"
    )
    for r in rows:
        if r["affected_dataset"] != prev_ds:
            prev_ds, prev_aspect = r["affected_dataset"], None
            out += ["", f"## Dataset: {prev_ds}"]
        if r["aspect"] != prev_aspect:
            prev_aspect = r["aspect"]
            out += ["", f"### Aspect: {prev_aspect}", "", header, "|---|---|---|---|---|---|---|"]
            if r["_total"] > max_per_group:
                elided.append((prev_ds, prev_aspect, r["_total"] - max_per_group))
        snippet = (
            f"(\"{r['compared_to_dataset']}\", \"{r['compared_to_resource']}\", "
            f"\"{r['variable']}\", \"{r['compared_to_value']}\")"
        )
        cells = [
            r["affected_resource"], r["variable"], r["affected_value"],
            r["compared_to_value"], r["compared_to_resource"],
            r["compared_to_dataset"], f"`{snippet}`",
        ]
        out.append("| " + " | ".join("" if c is None else str(c) for c in cells) + " |")
    for ds, aspect, n in elided:
        out += ["", f"_{n} further deviations in dataset {ds}, aspect"
                f" {aspect} elided (cap {max_per_group}); see the"
                " deviations CSV export for the full set._"]
    return "\n".join(out).lstrip("\n") + "\n"


def wd_mismatch_finder(
    findings: DataFrame,
    wikidata_dataset: str,
    property_ids: dict[str, str],
    entity_prefix: str = "http://www.wikidata.org/entity/",
) -> DataFrame:
    """Rows for the Wikidata Mismatch Finder import CSV
    (`export/wdMismatchFinder.rq:29-120`, columns per
    `export/wdMismatchFinder.ftl`): deviations and value omissions whose
    affected side is the Wikidata dataset.

    ``property_ids``: variable name → Wikidata property id (the reference
    derives this from aspect-pattern variable paths; this engine stores
    the mapping as explicit config, SURVEY.md §2.2 'variable path
    extraction'). Statement GUIDs and calendar-model metadata require
    statement reification the flat triples model does not carry, so those
    columns are empty — legal per the Mismatch Finder format."""
    pid_rows = [(v, p) for v, p in sorted(property_ids.items())]
    pids = F.broadcast(
        findings.sparkSession.createDataFrame(
            pid_rows, "variable string, property_id string"
        )
    )
    f = (
        findings.where(
            F.col("kind").isin("deviation", "value_omission")
            & (F.col("affected_dataset") == wikidata_dataset)
            & F.col("compared_to_value").isNotNull()
            & (F.col("compared_to_value") != "")
        )
        .join(pids, "variable")
    )
    strip = lambda c: F.regexp_replace(c, entity_prefix + r"(Q\d+)", "$1")  # noqa: E731
    return f.select(
        F.regexp_replace("affected_resource", entity_prefix, "").alias("item_id"),
        F.lit("").alias("statement_guid"),
        "property_id",
        strip(F.coalesce("affected_value", F.lit(""))).alias("wikidata_value"),
        F.lit("").alias("meta_wikidata_value"),
        F.col("compared_to_value").alias("external_value"),
        F.coalesce("compared_to_resource", F.lit("")).alias("external_url"),
        F.lit("statement").alias("type"),
    ).distinct()


def export_wd_mismatch_finder_csv(
    findings: DataFrame,
    path: str,
    wikidata_dataset: str,
    property_ids: dict[str, str],
    mode: str = "overwrite",
) -> None:
    (
        wd_mismatch_finder(findings, wikidata_dataset, property_ids)
        .orderBy("item_id", "property_id", "external_value")
        .write.mode(mode)
        .option("header", True)
        .csv(path)
    )


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
