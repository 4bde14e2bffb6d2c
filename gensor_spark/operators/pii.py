"""PII scrubbing: regex redaction of emails / IPs / phones / SSNs.

Training-data-pipeline extension (no gensor analogue). Every published
pretraining pipeline scrubs or flags personally identifiable information
before training (C4 §2.2 removes pages by bad-word lists, The Pile and
RefinedWeb redact emails/IPs; BigScience ROOTS runs exactly this regex
family). The operator redacts matches in place with a typed placeholder and
reports per-kind match counts so callers can also threshold-drop documents
with heavy PII density.

Shape at scale: entirely row-local — a chain of ``regexp_count`` +
``regexp_replace`` column expressions, whole-stage codegen, zero shuffles,
zero UDFs. The scan cost IS the operator cost; it composes with any
downstream shuffle for free.

Pattern notes: patterns are deliberately kept inside the regex subset that
Java (Spark) and RE2-ish engines (DuckDB) evaluate identically, so the
DuckDB oracle in tests/test_pii.py checks the exact redacted text. Kinds
apply in declaration order and each count is measured on the text AFTER the
previous kinds were redacted — an email's digits can never double-count as
a phone number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> pattern, applied in this order (email first so its local part's
#: digits can't be re-matched as phone fragments)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9][0-9 ()\-]{7,14}[0-9]",
}


def _redaction(kind: str) -> str:
    return f"<PII:{kind}>"


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact PII in ``text_col``; emit scrubbed text + per-kind counts.

    Output: ``id_col``, ``text`` (scrubbed), one ``n_<kind>`` count column
    per pattern, and ``n_pii`` (total). All other input columns pass
    through untouched.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    scrubbed: Column = F.col(text_col)
    counts: dict[str, Column] = {}
    for kind, pat in pats.items():
        counts[kind] = F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, _redaction(kind))

    passthrough = [c for c in docs.columns if c != text_col]
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        *passthrough,
        scrubbed.alias(text_col),
        *[counts[k].alias(f"n_{k}") for k in pats],
        (total if total is not None else F.lit(0)).alias("n_pii"),
    )
