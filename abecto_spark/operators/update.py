"""SPARQL 1.1 Update over a triples DataFrame — the graph-store
mutation half of the query surface (W3C SPARQL 1.1 Update §3.1).

The reference executes updates through Jena's ``UpdateAction`` wherever
a processor rewrites its model; here an update is a *pure function* on
the distributed triples relation — each operation compiles to
anti-joins (delete) and unions (insert) and the updated DataFrame is
returned, which is the shape a Spark pipeline wants (the store write is
the caller's sink, e.g. an Iceberg MERGE at deployment).

Supported operations, separated by ``;``:

  INSERT DATA { ground triples }        §3.1.1
  DELETE DATA { ground triples }        §3.1.2
  DELETE { tmpl } INSERT { tmpl } WHERE { pattern }   §3.1.3
  DELETE { tmpl } WHERE { pattern }
  INSERT { tmpl } WHERE { pattern }
  DELETE WHERE { pattern }              (pattern doubles as template)
  CLEAR [SILENT] DEFAULT|ALL

The WHERE pattern gets the full engine subset (BGP/OPTIONAL/FILTER/
UNION/paths/...); templates and DATA blocks are plain triples, as the
grammar's QuadPattern requires.  Per §3.1.3 the delete and insert
templates instantiate against the SAME solution multiset, evaluated
before either mutation applies, and deletes apply before inserts.
Solutions leaving a template variable unbound skip that triple
(§3.1.3.2); a template variable that can never be bound is loud.
Named-graph forms (GRAPH/WITH/USING), LOAD, and bnode-minting INSERT
DATA are outside the subset and raise ``SparqlUnsupported``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sparql import (
    Group,
    Iri,
    Lit,
    SparqlUnsupported,
    Var,
    _Compiler,
    _Parser,
)
from .rule_text import (
    TRIPLE_COLS,
    _denorm_triples,
    _head_rows,
    _norm_triples,
)

_TRIPLES_DDL = (
    "s string, p string, o_kind string, o_value string,"
    " o_datatype string, o_lang string"
)


@dataclass
class _InsertData:
    triples: list


@dataclass
class _DeleteData:
    triples: list


@dataclass
class _Modify:
    delete: list
    insert: list
    where: Group


@dataclass
class _Clear:
    pass


def _plain(g: Group, what: str) -> list:
    if (
        g.optionals or g.filters or g.binds or g.unions or g.minuses
        or g.not_exists or g.exists or g.values_blocks
        or g.path_closures or g.graph_blocks or g.subqueries
    ):
        raise SparqlUnsupported(f"{what} must be plain triples")
    return g.triples


def _ground(triples: list, what: str) -> list:
    for tp in triples:
        for t in (tp.s, tp.p, tp.o):
            if isinstance(t, Var):
                raise SparqlUnsupported(
                    f"{what} requires ground triples (no variables or "
                    "blank nodes)"
                )
    return triples


def parse_update(text: str) -> list:
    """Parse an update request into its operation sequence."""
    p = _Parser(text)
    ops: list = []
    p.parse_prologue()
    while p.peek()[0] != "eof":
        if p.at_word("INSERT"):
            p.next()
            if p.at_word("DATA"):
                p.next()
                ops.append(_InsertData(_ground(
                    _plain(p.parse_group(), "INSERT DATA"), "INSERT DATA"
                )))
            else:
                tmpl = _plain(p.parse_group(), "INSERT template")
                p.eat("WHERE")
                ops.append(_Modify([], tmpl, p.parse_group()))
        elif p.at_word("DELETE"):
            p.next()
            if p.at_word("DATA"):
                p.next()
                ops.append(_DeleteData(_ground(
                    _plain(p.parse_group(), "DELETE DATA"), "DELETE DATA"
                )))
            elif p.at_word("WHERE"):
                p.next()
                g = p.parse_group()
                ops.append(_Modify(_plain(g, "DELETE WHERE"), [], g))
            else:
                dt = _plain(p.parse_group(), "DELETE template")
                ins: list = []
                if p.at_word("INSERT"):
                    p.next()
                    ins = _plain(p.parse_group(), "INSERT template")
                p.eat("WHERE")
                ops.append(_Modify(dt, ins, p.parse_group()))
        elif p.at_word("CLEAR"):
            p.next()
            if p.at_word("SILENT"):
                p.next()
            if not p.at_word("DEFAULT", "ALL"):
                raise SparqlUnsupported(
                    "only CLEAR DEFAULT / CLEAR ALL are supported "
                    "(no named graphs)"
                )
            p.next()
            ops.append(_Clear())
        elif p.at_word("WITH", "USING", "LOAD", "CREATE", "DROP",
                       "COPY", "MOVE", "ADD"):
            raise SparqlUnsupported(
                f"unsupported update operation {p.peek()[1]!r} "
                "(graph-store management / named graphs)"
            )
        else:
            raise SparqlUnsupported(
                f"expected an update operation, got {p.peek()[1]!r}"
            )
        if p.peek()[1] == ";":
            p.next()
            p.parse_prologue()
        else:
            break
    if p.peek()[0] != "eof":
        raise SparqlUnsupported(
            f"trailing content after update: {p.peek()[1]!r}"
        )
    return ops


def _const_rows(spark, triples: list) -> DataFrame:
    rows = []
    for tp in triples:
        if not isinstance(tp.p, Iri):
            raise SparqlUnsupported("ground predicate must be an IRI")
        if isinstance(tp.o, Iri):
            o = ("iri", tp.o.value, None, "")
        elif isinstance(tp.o, Lit):
            o = ("literal", tp.o.lex, tp.o.datatype, tp.o.lang)
        else:
            raise SparqlUnsupported("unsupported ground object term")
        rows.append((tp.s.value, tp.p.value) + o)
    return _norm_triples(spark.createDataFrame(rows, _TRIPLES_DDL))


def _tmpl_rows(match: DataFrame, bound: set, tmpl: list) -> DataFrame:
    """Instantiate a template against the solution multiset; solutions
    with an unbound template variable skip that triple (§3.1.3.2)."""
    outs = []
    for tp in tmpl:
        tvars = {
            t.name for t in (tp.s, tp.p, tp.o) if isinstance(t, Var)
        }
        missing = tvars - bound
        if missing:
            raise SparqlUnsupported(
                "template variable ?%s never bound in WHERE"
                % sorted(missing)[0]
            )
        m = match
        for v in sorted(tvars):
            m = m.where(F.col(v).isNotNull())
        outs.append(_head_rows(m, bound, [tp]))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def apply_update(triples: DataFrame, update_text: str) -> DataFrame:
    """Apply the update request to the triples DataFrame and return the
    updated relation (public schema: o_datatype NULL for non-literals).
    Operations run in sequence, each against the previous result, per
    the Update spec; the input DataFrame is not mutated."""
    spark = triples.sparkSession
    g = _norm_triples(triples).distinct().localCheckpoint(eager=True)
    for op in parse_update(update_text):
        if isinstance(op, _Clear):
            g = spark.createDataFrame([], _TRIPLES_DDL)
        elif isinstance(op, _InsertData):
            g = g.unionByName(_const_rows(spark, op.triples)).distinct()
        elif isinstance(op, _DeleteData):
            g = g.join(
                _const_rows(spark, op.triples), list(TRIPLE_COLS),
                "left_anti",
            )
        else:
            comp = _Compiler(g)
            match, bound = comp.group_df(op.where)
            match = match.localCheckpoint(eager=True)
            if op.delete:
                for tp in op.delete:
                    for t in (tp.s, tp.p, tp.o):
                        if isinstance(t, Var) and t.name.startswith("__bn"):
                            raise SparqlUnsupported(
                                "blank node in a DELETE template (§3.1.3: "
                                "DeleteClause must not contain blank nodes)"
                            )
                dels = _tmpl_rows(match, bound, op.delete).distinct()
                g = g.join(dels, list(TRIPLE_COLS), "left_anti")
            if op.insert:
                # template blank nodes mint one fresh bnode per solution
                # (§3.1.3.2) — deterministic per (var, row bindings),
                # same convention as CONSTRUCT templates
                imatch, ibound = match, bound
                mint = sorted({
                    t.name
                    for tp in op.insert
                    for t in (tp.s, tp.p, tp.o)
                    if isinstance(t, Var) and t.name.startswith("__bn")
                    and t.name not in bound
                })
                if mint:
                    from ..sparql import _term_struct

                    row_cols = [F.col(v) for v in sorted(bound)]
                    for v in mint:
                        tag = F.lit(f"ubn/{v}")
                        label = F.concat(
                            F.lit("_:u"),
                            F.xxhash64(tag, F.lit(1), *row_cols)
                            .cast("string"),
                            F.lit("x"),
                            F.xxhash64(tag, F.lit(2), *row_cols)
                            .cast("string"),
                        )
                        imatch = imatch.withColumn(
                            v,
                            _term_struct(
                                F.lit("bnode"), label, F.lit(""), F.lit("")
                            ),
                        )
                    ibound = bound | set(mint)
                ins = _norm_triples(
                    _tmpl_rows(imatch, ibound, op.insert)
                ).distinct()
                g = g.unionByName(ins).distinct()
        g = g.localCheckpoint(eager=True)
    return _denorm_triples(g)
