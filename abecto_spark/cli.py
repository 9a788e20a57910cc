"""Command-line entry point — the analog of the reference's
``abecto <plan.trig>`` CLI (`Abecto.java:64-155` options,
`Abecto.java:166-281` execute + export + exit-code logic)::

    python -m abecto_spark [options] plan.trig

Loads a reference-vocabulary TriG plan file (plans/trig_plan.py), runs it
through the plan-DAG driver, optionally writes measures/findings tables
and the reference's report exports, and returns the reference's
fail-on-finding exit-code bits (deviation +2, value omission +4,
resource omission +8, issue +32; `Abecto.java:215-240`).
"""

from __future__ import annotations

import argparse
import os
import sys

EXPORT_TEMPLATES = (
    "deviations", "resourceOmissions", "measurementsMarkdown",
    "deviationsMarkdown", "mappingReview", "wdMismatchFinder",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="abecto-spark",
        description="Compares and evaluates several RDF datasets"
        " (PySpark plan-DAG engine).",
    )
    p.add_argument("plan_file", help="TriG file containing the plan configuration")
    p.add_argument(
        "-p", "--plan", metavar="IRI", default=None,
        help="IRI of the plan to process (required if the configuration"
        " contains multiple plans)",
    )
    p.add_argument(
        "-E", "--export", action="append", default=[],
        metavar="TEMPLATE_NAME=PATH",
        help="export to write; templates: " + ", ".join(EXPORT_TEMPLATES)
        + " (CSV exports write a Spark CSV directory). Repeatable.",
    )
    p.add_argument(
        "--out", metavar="DIR", default=None,
        help="directory for the raw result tables"
        " (measures/, findings/, mappings/ as Parquet)",
    )
    p.add_argument(
        "--checkpoint", metavar="DIR", default=None,
        help="snapshot-store directory for per-step checkpoint/resume",
    )
    p.add_argument(
        "--trig", metavar="FILE", default=None,
        help="write the result datasets as a single TriG file, one named"
        " graph per dataset (`Abecto.java:166-173`); for cluster-scale"
        " dumps use --nquads instead",
    )
    p.add_argument(
        "--nquads", metavar="DIR", default=None,
        help="write the result datasets as a distributed N-Quads text"
        " directory, one named graph per dataset",
    )
    p.add_argument(
        "--loadOnly", action="store_true", dest="load_only",
        help="do not execute the plan; load previously saved results"
        " from --out DIR and run exports / fail-on checks against them"
        " (`Abecto.java:91-92` exports without repeated plan execution;"
        " this engine persists results as the --out parquet store rather"
        " than inside the plan file)",
    )
    p.add_argument(
        "--reportOn", metavar="IRI", default=None, dest="report_on",
        help="dataset IRI to report on; exports and fail-on checks are"
        " limited to findings affecting this dataset",
    )
    p.add_argument("--failOnDeviation", action="store_true")
    p.add_argument("--failOnValueOmission", action="store_true")
    p.add_argument("--failOnResourceOmission", action="store_true")
    p.add_argument(
        "--failOnWrongValue", action="store_true",
        help="exit bit 16 if the results contain an av:WrongValue"
        " annotation (`Abecto.java:225-227`); honors --reportOn",
    )
    p.add_argument("--failOnIssue", action="store_true")
    p.add_argument(
        "--reviewLabel", metavar="IRI", default=None, dest="review_label",
        help="predicate IRI whose values label each side of the"
        " mappingReview export",
    )
    p.add_argument(
        "--wdDataset", metavar="IRI", default=None, dest="wd_dataset",
        help="dataset IRI treated as Wikidata for the wdMismatchFinder"
        " export",
    )
    p.add_argument(
        "--wdProperty", action="append", default=[], dest="wd_property",
        metavar="VAR=PID",
        help="variable -> Wikidata property id mapping for"
        " wdMismatchFinder. Repeatable.",
    )
    p.add_argument(
        "--master", default=None,
        help="Spark master (default: local[$SPARK_GRAFT_CPUS])",
    )
    return p


def _parse_exports(specs: list[str]) -> list[tuple[str, str]]:
    out = []
    for spec in specs:
        name, sep, path = spec.partition("=")
        if not sep or name not in EXPORT_TEMPLATES:
            raise SystemExit(
                f"bad --export {spec!r}: expected TEMPLATE_NAME=PATH with"
                f" template one of {', '.join(EXPORT_TEMPLATES)}"
            )
        out.append((name, path))
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    exports = _parse_exports(args.export)

    from pyspark.sql import functions as F

    from .plans import reports
    from .plans.driver import run_plan
    from .plans.trig_plan import load_trig_plan
    from .session import get_spark
    from .sources.checkpoint import SnapshotStore

    plan = load_trig_plan(args.plan_file, plan_iri=args.plan)
    spark = get_spark(app_name="abecto-spark-cli", master=args.master)
    if args.load_only:
        from .plans.driver import PlanResult

        if not args.out:
            raise SystemExit(
                "--loadOnly needs --out DIR pointing at previously saved"
                " results"
            )
        if args.trig or args.nquads:
            raise SystemExit(
                "--loadOnly cannot dump primary graphs (--trig/--nquads):"
                " the --out store holds the result tables only"
            )
        wv_dir = os.path.join(args.out, "wrong_values")
        result = PlanResult(
            primary={},
            edges=spark.read.parquet(os.path.join(args.out, "mappings")),
            canonical=None,
            measures=spark.read.parquet(os.path.join(args.out, "measures")),
            findings=spark.read.parquet(os.path.join(args.out, "findings")),
            manifests={},
            wrong_values=(
                spark.read.parquet(wv_dir) if os.path.isdir(wv_dir) else None
            ),
        )
    else:
        store = (
            SnapshotStore(spark, args.checkpoint) if args.checkpoint else None
        )
        result = run_plan(spark, plan, store=store)

    findings = result.findings
    if args.report_on:
        findings = findings.where(F.col("affected_dataset") == args.report_on)

    if args.out and not args.load_only:
        os.makedirs(args.out, exist_ok=True)
        result.measures.write.mode("overwrite").parquet(
            os.path.join(args.out, "measures")
        )
        findings.write.mode("overwrite").parquet(os.path.join(args.out, "findings"))
        result.edges.write.mode("overwrite").parquet(os.path.join(args.out, "mappings"))
        if result.wrong_values is not None:
            result.wrong_values.write.mode("overwrite").parquet(
                os.path.join(args.out, "wrong_values")
            )

    if args.trig or args.nquads:
        from functools import reduce

        from .sources.rdf import write_nquads, write_trig_local

        parts = [
            df.select(
                "s", "p", "o_kind", "o_value", "o_datatype", "o_lang"
            ).withColumn("graph", F.lit(dataset))
            for dataset, df in result.primary.items()
        ]
        if parts:
            quads = reduce(lambda a, b: a.unionByName(b), parts)
            if args.trig:
                write_trig_local(quads, args.trig)
            if args.nquads:
                write_nquads(quads, args.nquads)

    for name, path in exports:
        if name == "deviations":
            reports.export_deviations_csv(findings, path)
        elif name == "resourceOmissions":
            reports.export_omissions_csv(findings, path)
        elif name == "measurementsMarkdown":
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(reports.measurements_markdown(result.measures))
        elif name == "deviationsMarkdown":
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(reports.deviations_markdown(findings))
        elif name == "mappingReview":
            if not args.review_label:
                raise SystemExit("mappingReview export needs --reviewLabel IRI")
            if args.load_only:
                raise SystemExit(
                    "mappingReview reads primary graphs, which the --out"
                    " store does not hold; run it without --loadOnly"
                )
            from functools import reduce

            parts = [
                df.where(F.col("p") == args.review_label).select(
                    F.col("s").alias("resource"),
                    F.lit("label").alias("variable"),
                    "o_value",
                )
                for df in result.primary.values()
            ]
            vals = reduce(lambda a, b: a.unionByName(b), parts)
            (
                reports.mapping_review(result.edges, vals, "label")
                .orderBy("src", "dst")
                .write.mode("overwrite").option("header", True).csv(path)
            )
        elif name == "wdMismatchFinder":
            if not args.wd_dataset:
                raise SystemExit("wdMismatchFinder export needs --wdDataset IRI")
            pids = {}
            for spec in args.wd_property:
                var, sep, pid = spec.partition("=")
                if not sep:
                    raise SystemExit(f"bad --wdProperty {spec!r}: expected VAR=PID")
                pids[var] = pid
            reports.export_wd_mismatch_finder_csv(
                findings, path, args.wd_dataset, pids
            )

    # fail-on exit bits (`Abecto.java:215-240`)
    checks = [
        (args.failOnDeviation, "deviation", 2),
        (args.failOnValueOmission, "value_omission", 4),
        (args.failOnResourceOmission, "resource_omission", 8),
        (args.failOnIssue, "issue", 32),
    ]
    wanted = [kind for flag, kind, _bit in checks if flag]
    exit_code = 0
    if wanted:
        present = {
            r["kind"]
            for r in findings.where(F.col("kind").isin(wanted))
            .select("kind").distinct().collect()
        }
        for flag, kind, bit in checks:
            if flag and kind in present:
                exit_code += bit
    if args.failOnWrongValue and result.wrong_values is not None:
        wv = result.wrong_values
        if args.report_on:
            wv = wv.where(F.col("dataset") == args.report_on)
        if wv.limit(1).count() > 0:
            exit_code += 16
    return exit_code


if __name__ == "__main__":
    sys.exit(main())
