"""PII scrubbing: DuckDB exact-text oracle + ordering/edge semantics."""

from __future__ import annotations

import duckdb
import pytest

from gensor_spark.operators.pii import PII_PATTERNS, scrub_pii


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        ("d0", "contact alice.smith+spam@example.co.uk or bob@sub.domain.org today"),
        ("d1", "server at 10.0.255.1 and 192.168.1.17 responded"),
        ("d2", "call +1 (415) 555-0199 or +44 20-7946-0958 now"),
        ("d3", "ssn 123-45-6789 on file"),
        ("d4", "mixed: eve@host.io from 172.16.0.9 dial +33 1 42 68 53 00 ssn 987-65-4321"),
        ("d5", "nothing sensitive here at all"),
        ("d6", ""),
        ("d7", "not-an-email @ example.com and version 1.2.3 stay"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _oracle(pdf):
    con = duckdb.connect()
    con.register("docs", pdf)
    text, selects = "text", []
    for kind, pat in PII_PATTERNS.items():
        selects.append(
            f"len(regexp_extract_all({text}, '{pat}')) AS n_{kind}")
        text = f"regexp_replace({text}, '{pat}', '<PII:{kind}>', 'g')"
    cols = ", ".join(selects)
    return con.execute(
        f"SELECT doc_id, {text} AS text, {cols} FROM docs ORDER BY doc_id"
    ).df()


def test_scrub_matches_duckdb_exact_text(spark, pii_docs):
    got = scrub_pii(pii_docs).orderBy("doc_id").toPandas()
    exp = _oracle(pii_docs.toPandas())
    assert list(got["text"]) == list(exp["text"])
    for kind in PII_PATTERNS:
        assert list(got[f"n_{kind}"]) == list(exp[f"n_{kind}"]), kind


def test_scrub_counts_and_total(spark, pii_docs):
    rows = {r.doc_id: r for r in scrub_pii(pii_docs).collect()}
    assert rows["d0"].n_email == 2 and rows["d0"].n_pii == 2
    assert rows["d1"].n_ipv4 == 2
    assert rows["d2"].n_phone == 2
    assert rows["d3"].n_ssn == 1
    assert rows["d4"].n_pii == 4  # one of each kind
    assert rows["d5"].n_pii == 0 and rows["d6"].n_pii == 0
    # bare '@' is not an email; dotted version number is not an IPv4
    assert rows["d7"].n_pii == 0
    assert "<PII:" not in rows["d5"].text


def test_scrub_no_double_count_after_redaction(spark):
    # the email's digits must not re-match as a phone once redacted
    docs = spark.createDataFrame(
        [("d", "mail +14155550199@sms-gateway.example.com please")],
        "doc_id string, text string",
    )
    r = scrub_pii(docs).collect()[0]
    assert r.n_email == 1 and r.n_phone == 0
    assert r.text == "mail <PII:email> please"


def test_scrub_plan_is_pure_codegen(spark, pii_docs):
    plan = scrub_pii(pii_docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # row-local: zero shuffles
