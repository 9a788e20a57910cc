"""Distributed N-Triples / N-Quads reader — the cluster-friendly analog
of the reference's file-source scan (`FileSourceProcessor.java:31-55`,
format sniffing `util/Models.java:66-95`). Line-oriented RDF formats are
the only ones that split cleanly across executors, so they are the
cluster ingestion path; non-line formats (Turtle, RDF/XML, JSON-LD) are
a driver-side concern out of engine scope.

Parsing is pure Catalyst (`spark.read.text` + regexp) — no Python UDFs.
Output is the engine's triples schema
(s, p, o_kind, o_value, o_datatype, o_lang[, graph]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import XSD_STRING

# one RDF term: IRI | blank node | literal (with optional @lang / ^^<dt>)
_IRI = r"<[^>]*>"
_BNODE = r"_:[^\s]+"
_LIT = r'"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?'
_TERM = f"(?:{_IRI}|{_BNODE}|{_LIT})"

_LINE = (
    rf"^\s*({_IRI}|{_BNODE})\s+({_IRI})\s+({_TERM})"
    rf"(?:\s+({_IRI}|{_BNODE}))?\s*\.\s*$"
)


def _unescape(col):
    # N-Triples string escapes: \" \\ \n \r \t (uchar escapes left as-is).
    # Escaped backslashes are parked on a sentinel FIRST so that e.g. the
    # 3-char lexical `\\n` (literal backslash + "n") does not decode as a
    # newline; NUL cannot occur unescaped in the format, so it is a safe
    # sentinel.
    col = F.regexp_replace(col, r"\\\\", "\x00")
    for esc, rep in ((r"\\t", "\t"), (r"\\r", "\r"), (r"\\n", "\n"), (r'\\"', '"')):
        col = F.regexp_replace(col, esc, rep)
    return F.regexp_replace(col, "\x00", "\\\\")


def _term_kind(term):
    return (
        F.when(term.startswith("<"), F.lit("iri"))
        .when(term.startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("literal"))
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse N-Triples (or the triple part of N-Quads) files into the
    triples DataFrame. Malformed / comment / blank lines are dropped
    (strict=False semantics); count them via ``read_ntriples_rejects``.
    """
    raw = spark.read.text(path)
    parsed = raw.select(
        F.regexp_extract("value", _LINE, 1).alias("st"),
        F.regexp_extract("value", _LINE, 2).alias("pt"),
        F.regexp_extract("value", _LINE, 3).alias("ot"),
        F.regexp_extract("value", _LINE, 4).alias("gt"),
    ).where(F.col("st") != "")

    st, pt, ot, gt = F.col("st"), F.col("pt"), F.col("ot"), F.col("gt")
    strip_iri = lambda c: F.regexp_extract(c, r"^<(.*)>$", 1)  # noqa: E731
    lex = _unescape(F.regexp_extract(ot, r'^"((?:[^"\\]|\\.)*)"', 1))
    dt = F.regexp_extract(ot, r"\^\^<([^>]*)>$", 1)
    lang = F.regexp_extract(ot, r'"@([A-Za-z0-9-]+)$', 1)

    o_kind = _term_kind(ot)
    o_value = (
        F.when(o_kind == "iri", strip_iri(ot))
        .when(o_kind == "bnode", ot)
        .otherwise(lex)
    )
    o_datatype = F.when(
        o_kind == "literal",
        F.when(dt != "", dt)
        .when(lang != "", F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
        .otherwise(F.lit(XSD_STRING)),
    ).otherwise(F.lit(None).cast("string"))

    return parsed.select(
        F.when(st.startswith("<"), strip_iri(st)).otherwise(st).alias("s"),
        strip_iri(pt).alias("p"),
        o_kind.alias("o_kind"),
        o_value.alias("o_value"),
        o_datatype.alias("o_datatype"),
        F.when(o_kind == "literal", lang).otherwise(F.lit("")).alias("o_lang"),
        F.when(gt == "", F.lit(None).cast("string"))
        .when(gt.startswith("<"), strip_iri(gt))
        .otherwise(gt)  # blank-node graph label kept verbatim
        .alias("graph"),
    )


def read_ntriples_rejects(spark: SparkSession, path: str) -> DataFrame:
    """Lines that did not parse (excluding comments/blank) — the
    ingestion-quality side channel."""
    raw = spark.read.text(path)
    return raw.where(
        (F.trim("value") != "")
        & ~F.col("value").rlike(r"^\s*#")
        & (F.regexp_extract("value", _LINE, 1) == "")
    )


def _statement_col():
    """Serialized ``<s> <p> o`` statement expression (shared by the
    N-Triples / N-Quads / TriG writers)."""
    def esc(c):
        c = F.regexp_replace(c, r"\\", r"\\\\")
        c = F.regexp_replace(c, '"', r'\\"')
        c = F.regexp_replace(c, "\n", r"\\n")
        c = F.regexp_replace(c, "\r", r"\\r")
        return F.regexp_replace(c, "\t", r"\\t")
    obj = (
        F.when(F.col("o_kind") == "iri", F.concat(F.lit("<"), F.col("o_value"), F.lit(">")))
        .when(F.col("o_kind") == "bnode", F.col("o_value"))
        .otherwise(
            F.concat(
                F.lit('"'), esc(F.col("o_value")), F.lit('"'),
                F.when(F.col("o_lang") != "", F.concat(F.lit("@"), F.col("o_lang")))
                .when(
                    F.col("o_datatype").isNotNull()
                    & (F.col("o_datatype") != XSD_STRING),
                    F.concat(F.lit("^^<"), F.col("o_datatype"), F.lit(">")),
                )
                .otherwise(F.lit("")),
            )
        )
    )
    subj = F.when(F.col("s").startswith("_:"), F.col("s")).otherwise(
        F.concat(F.lit("<"), F.col("s"), F.lit(">"))
    )
    return F.concat(subj, F.lit(" "), F.lit("<"), F.col("p"), F.lit("> "), obj)


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Serialize the triples DataFrame back to N-Triples text (the
    line-format analog of the reference's dataset write,
    `Abecto.java:166-173`)."""
    line = F.concat(_statement_col(), F.lit(" ."))
    triples.select(line.alias("value")).write.mode(mode).text(path)


def write_nquads(
    quads: DataFrame, path: str, graph_col: str = "graph", mode: str = "overwrite"
) -> None:
    """Distributed N-Quads dataset dump — the cluster-scale analog of the
    reference's whole-dataset TriG write (`Abecto.java:166-173`): each
    dataset's named graph rides in the 4th term, so a 100 TB dataset
    serializes in parallel with no driver involvement. Default-graph
    rows (NULL graph) serialize as plain triples; blank-node graph
    labels are kept verbatim."""
    g = F.col(graph_col)
    # the TriG/quad readers use graph == '' for default-graph rows while
    # plan frames use NULL — both must serialize as plain triples, never
    # as an invalid empty label '<>'
    gterm = (
        F.when(g.isNull() | (g == ""), F.lit(""))
        .when(g.startswith("_:"), F.concat(F.lit(" "), g))
        .otherwise(F.concat(F.lit(" <"), g, F.lit(">")))
    )
    line = F.concat(_statement_col(), gterm, F.lit(" ."))
    quads.select(line.alias("value")).write.mode(mode).text(path)


def write_trig_local(quads: DataFrame, path: str, graph_col: str = "graph") -> None:
    """Driver-side single-file TriG dump — the literal shape of the
    reference's `--trig` export (`Abecto.java:166-173`): one
    ``<graph> { ... }`` block per named graph, default-graph statements
    first. Rows stream through ``toLocalIterator`` after a graph-ordered
    sort, so driver memory is bounded by one partition, not the dataset;
    bulk consumers use :func:`write_nquads` instead."""
    rows = (
        quads.select(
            # readers mark default-graph rows with graph == '', plan
            # frames with NULL — normalize both to the default graph
            F.when(F.col(graph_col) == "", F.lit(None))
            .otherwise(F.col(graph_col)).alias("_g"),
            _statement_col().alias("_stmt"),
        )
        .orderBy(F.col("_g").asc_nulls_first(), F.col("_stmt"))
        .toLocalIterator()
    )
    with open(path, "w", encoding="utf-8") as fh:
        open_graph: str | None = None
        for r in rows:
            g = r["_g"]
            if g != open_graph:
                if open_graph is not None:
                    fh.write("}\n")
                if g is not None:
                    label = g if g.startswith("_:") else f"<{g}>"
                    fh.write(f"{label} {{\n")
                open_graph = g
            indent = "\t" if g is not None else ""
            fh.write(f"{indent}{r['_stmt']} .\n")
        if open_graph is not None:
            fh.write("}\n")
