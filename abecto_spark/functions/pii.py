"""PII redaction for training-data curation: emails, phone numbers and
IPv4 addresses are replaced with typed placeholders (``<EMAIL>``,
``<PHONE>``, ``<IPV4>``) and counted per kind.

Everything is JVM-side Catalyst (``regexp_count`` on the original text,
then sequential ``regexp_replace``) — no Python in the hot path, and the
patterns are restricted to constructs shared by Java regex and RE2 so
the DuckDB oracle can run the identical literals. Counts are measured on
the ORIGINAL text; replacement is applied in the fixed kind order below
(documented: an earlier kind's placeholder is never re-matched by a
later pattern since placeholders contain no digits or ``@``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: email first (an email never contains a phone/IP match once
# replaced; the reverse could split an email's digits)
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"),
]


def redact_text(text: Column) -> Column:
    out = text
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document redaction: ``(id, redacted, n_email, n_phone,
    n_ipv4)`` — one shuffle-free projection."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        redact_text(text).alias("redacted"),
        *[
            F.regexp_count(text, F.lit(pat)).alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS
        ],
    )
