"""PII redaction (functions/pii.py): placeholder replacement, per-kind
counts measured on the original text, and kind-order interplay."""

from __future__ import annotations

from abecto_spark.functions.pii import redact_pii


def test_redact_pii_kinds_and_counts(spark):
    rows = [
        (1, "mail a.b+c@ex-am.ple.org and bob@example.com today"),
        (2, "call 555-123-4567 or +1 212 555 0199 x9"),
        (3, "hosts 10.0.0.1 192.168.255.254 and 999.1.1.1"),
        (4, "clean document with no identifiers"),
        (5, "x@y.io at 8.8.8.8 phone 800-555-0100"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert got[1]["redacted"] == "mail <EMAIL> and <EMAIL> today"
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (2, 0, 0)
    # "+1 212 555 0199": the match anchors at "212 555 0199" (3-3-4)
    assert got[2]["redacted"] == "call <PHONE> or +1 <PHONE> x9"
    assert got[2]["n_phone"] == 2
    # 999.1.1.1 is still 4 dotted runs of 1-3 digits (syntactic redactor,
    # not a validator — documented)
    assert got[3]["redacted"] == "hosts <IPV4> <IPV4> and <IPV4>"
    assert got[3]["n_ipv4"] == 3
    assert got[4]["redacted"] == rows[3][1]
    assert (got[4]["n_email"], got[4]["n_phone"], got[4]["n_ipv4"]) == (0, 0, 0)
    assert got[5]["redacted"] == "<EMAIL> at <IPV4> phone <PHONE>"
    assert got[6]["redacted"] == ""
