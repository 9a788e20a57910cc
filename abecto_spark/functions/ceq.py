"""C-EQ: the reference's pairwise value-equivalence predicate
(`PropertyComparisonProcessor.java:287-300`, `util/Literals.java`) turned
into a deterministic *key function* so that equivalence classes become
plain group-by / join keys in Spark.

Validity argument (SURVEY.md §2.2): each arm of the reference predicate is
an equivalence relation on its domain; cross-type numeric equality is made
transitive by keying on the exact decimal value of the literal's *binary*
value (Java ``new BigDecimal((double) v)`` == Python ``Decimal(float(v))``
bit-for-bit, both expand the IEEE-754 value exactly).

Key namespaces (prefixes) keep domains disjoint:
  res:   IRI resources     (callers substitute the canonical cluster id)
  bnode: blank nodes
  str:   xsd:string / rdf:langString   (lang tag kept unless lang-skip)
  num:   numeric tower (integer/decimal/float/double), exact decimal form
  bool:  xsd:boolean
  day:   date part of date/dateTime    (only with allow_time_skip)
  date:/dt:  full date / dateTime lexical (without allow_time_skip)
  lit:   any other typed literal (term-level equality fallback)

Only the numeric arm needs Python (arbitrary-precision decimal expansion,
e.g. float 0.1 -> 0.100000001490116119384765625); it runs as an
Arrow-batched pandas UDF applied to the numeric subset. Everything else is
a JVM-side Catalyst expression (whole-stage codegen).
"""

from __future__ import annotations

from decimal import Decimal, InvalidOperation

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import (
    DATEISH_TYPES,
    STRINGISH_TYPES,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_INTEGER_TYPES,
    XSD_STRING,
)


def _canonical_decimal_str(d: Decimal) -> str:
    if d == 0:
        return "0"  # BigDecimal.compareTo treats -0 == 0
    return format(d.normalize(), "f")


def _numeric_key_one(lexical: str, datatype: str) -> str | None:
    """Exact decimal key for one numeric literal; None when the lexical is
    invalid for the datatype (the reference then falls back to term
    equality via IllegalArgumentException, `util/Literals.java:61-67`)."""
    try:
        if datatype == XSD_FLOAT or datatype == XSD_DOUBLE:
            lex = lexical.strip()
            if lex in ("NaN",):
                return "num:NaN"
            if lex in ("INF", "+INF", "Infinity", "+Infinity"):
                return "num:INF"
            if lex in ("-INF", "-Infinity"):
                return "num:-INF"
            if datatype == XSD_FLOAT:
                import numpy as np

                f = float(np.float32(lex))
            else:
                f = float(lex)
            if f != f:
                return "num:NaN"
            if f == float("inf"):
                return "num:INF"
            if f == float("-inf"):
                return "num:-INF"
            return "num:" + _canonical_decimal_str(Decimal(f))
        # integer / decimal tower: BigDecimal(lexical)
        return "num:" + _canonical_decimal_str(Decimal(lexical.strip()))
    except (InvalidOperation, ValueError, OverflowError):
        return None


def _numeric_key_batch(lexical: pd.Series, datatype: pd.Series) -> pd.Series:
    # Arrow-batched; per-element decimal expansion is unavoidable for
    # arbitrary precision, but runs only on the (rare) numeric literals.
    out = [
        _numeric_key_one(lx, dt) if lx is not None else None
        for lx, dt in zip(lexical, datatype)
    ]
    return pd.Series(out, dtype="object")


_numeric_udf = None


def _numeric_key_udf(lexical, datatype):
    global _numeric_udf
    if _numeric_udf is None:
        _numeric_udf = F.pandas_udf(_numeric_key_batch, "string")
    return _numeric_udf(lexical, datatype)


def value_eq_key(
    o_kind: Column,
    o_value: Column,
    o_datatype: Column,
    o_lang: Column,
    canonical_id: Column | None = None,
    allow_lang_tag_skip: bool = False,
    allow_time_skip: bool = False,
) -> Column:
    """Column expression computing the C-EQ equivalence-class key.

    ``canonical_id`` — optional column holding the correspondence-cluster
    id for IRI values (null if unmapped); resources are equivalent iff
    they correspond (`PropertyComparisonProcessor.java:287-290`).
    """
    lex = o_value
    dt = F.coalesce(o_datatype, F.lit(XSD_STRING))
    lang = F.lower(F.coalesce(o_lang, F.lit("")))

    is_numeric = dt.isin(*XSD_INTEGER_TYPES, XSD_FLOAT, XSD_DOUBLE)
    is_stringish = dt.isin(*STRINGISH_TYPES)
    is_dateish = dt.isin(*DATEISH_TYPES)

    # JVM fast path for the integer/decimal tower: lexicals that fit
    # decimal(38,18) losslessly canonicalize without leaving codegen — the
    # Python expansion is needed only for float/double binary values (and
    # exotic >38-digit decimals). The canonical string (plain form, no
    # trailing zeros, -0 -> 0) is byte-identical to `_canonical_decimal_str`.
    is_int_dec = dt.isin(*XSD_INTEGER_TYPES)
    jvm_safe = is_int_dec & F.trim(lex).rlike(r"^[+-]?\d{1,20}(\.\d{1,18})?$")
    _dec = F.trim(lex).cast("decimal(38,18)")
    jvm_num_key = F.concat(
        F.lit("num:"),
        F.regexp_replace(
            F.regexp_replace(_dec.cast("string"), r"(\.\d*?)0+$", "$1"), r"\.$", ""
        ),
    )
    # rows the pandas UDF must process get the lexical; all others get
    # NULL so the Arrow batch short-circuits per element
    udf_input = F.when(is_numeric & ~jvm_safe, lex)

    if allow_lang_tag_skip:
        str_key = F.concat(F.lit("str:"), lex)
    else:
        str_key = F.concat(F.lit("str:"), lex, F.lit("@"), lang)

    if allow_time_skip:
        # date part of date/dateTime, sign-aware (`util/Literals.java:35-47`)
        date_key = F.concat(
            F.lit("day:"), F.regexp_extract(lex, r"^(-?\d{4,}-\d{2}-\d{2})", 1)
        )
    else:
        date_key = F.concat(
            F.when(dt == XSD_DATE, F.lit("date:")).otherwise(F.lit("dt:")), lex
        )

    bool_key = (
        F.when(F.trim(lex).isin("true", "1"), F.lit("bool:true"))
        .when(F.trim(lex).isin("false", "0"), F.lit("bool:false"))
        .otherwise(F.concat(F.lit("lit:"), dt, F.lit(":"), lex))
    )

    other_key = F.concat(F.lit("lit:"), dt, F.lit(":"), lex)

    literal_key = (
        F.when(is_stringish, str_key)
        .when(jvm_safe, jvm_num_key)
        .when(is_numeric, F.coalesce(_numeric_key_udf(udf_input, dt), other_key))
        .when(is_dateish, date_key)
        .when(dt == XSD_BOOLEAN, bool_key)
        .otherwise(other_key)
    )

    res_key = F.concat(
        F.lit("res:"),
        F.coalesce(canonical_id, lex) if canonical_id is not None else lex,
    )

    return (
        F.when(o_kind == F.lit("iri"), res_key)
        .when(o_kind == F.lit("bnode"), F.concat(F.lit("bnode:"), lex))
        .otherwise(literal_key)
    )


def term_key(o_kind: Column, o_value: Column, o_datatype: Column, o_lang: Column) -> Column:
    """RDF *term* identity key (Jena RDFNode.equals): kind + lexical +
    datatype + lang. Used for the per-resource value-set dedup that the
    reference gets implicitly from ``Set<RDFNode>``."""
    return F.concat_ws(
        "\x1f",
        o_kind,
        F.coalesce(o_value, F.lit("")),
        F.coalesce(o_datatype, F.lit("")),
        F.lower(F.coalesce(o_lang, F.lit(""))),
    )
