"""Unit tests for the PII scrub operator (hand-checkable fixtures)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aces_spark.datapipe.pii import pii_redact_expr, pii_scrub

PII_DOCS = [
    (1, "mail me at alice.smith+x@example.co.uk or bob@test.org today"),
    (2, "server at 192.168.0.1 and backup 10.0.255.3"),
    (3, "call 555-123-4567 or +4915123456789 now"),
    (4, "no pii here, just 1234.5.6.7 which is not an ip token"),
    (5, ""),
    (6, "mixed: eve@corp.io from 172.16.4.20 dials 800-555-0199"),
]


@pytest.fixture(scope="module")
def pii_docs(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


def test_counts(pii_docs):
    rows = {r["doc_id"]: r for r in pii_scrub(pii_docs).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_ipv4"] == 0
    assert rows[2]["n_ipv4"] == 2 and rows[2]["n_emails"] == 0
    assert rows[3]["n_phones"] == 2
    # leading "1234" kills the word boundary: not an IPv4 match
    assert rows[4]["n_ipv4"] == 0 and rows[4]["n_phones"] == 0
    assert rows[5]["n_emails"] == rows[5]["n_ipv4"] == rows[5]["n_phones"] == 0
    assert (rows[6]["n_emails"], rows[6]["n_ipv4"], rows[6]["n_phones"]) == (1, 1, 1)


def test_redaction_text(pii_docs):
    red = {
        r["doc_id"]: r["red"]
        for r in pii_docs.select(
            "doc_id", pii_redact_expr(F.col("text")).alias("red")
        ).collect()
    }
    assert red[1] == "mail me at <EMAIL> or <EMAIL> today"
    assert red[2] == "server at <IP> and backup <IP>"
    assert red[3] == "call <PHONE> or <PHONE> now"
    assert red[6] == "mixed: <EMAIL> from <IP> dials <PHONE>"


def test_digest_is_deterministic(pii_docs):
    a = pii_scrub(pii_docs).orderBy("doc_id").collect()
    b = pii_scrub(pii_docs).orderBy("doc_id").collect()
    assert [r["redacted_digest"] for r in a] == [r["redacted_digest"] for r in b]
