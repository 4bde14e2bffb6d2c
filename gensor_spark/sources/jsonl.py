"""JSONL corpus ingestion with corrupt-record quarantine.

Sources-family extension (the reference reads CSV/SQL/API —
gensor/parse/vanessen.py, gensor/io/sql.py; JSONL is the training-data
equivalent: crawl dumps, API exports and annotation exports ship as
newline-delimited JSON, and at web scale a fraction of lines is ALWAYS
malformed — truncated records, encoding damage, stray non-JSON lines).

Policy here is the mask-don't-crash convention the repo applies everywhere:
never throw on bad data; split the scan into (clean rows projected to the
expected schema) and (a quarantine frame carrying the raw offending line +
its source file) so corruption is auditable, never silent.

Implementation note — why text + ``from_json`` instead of
``spark.read.json``: Spark's native JSON source disallows any query whose
referenced columns are only the internal ``_corrupt_record``
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the documented
workaround is caching the parsed frame — wrong at 100 TB. Reading the files
as TEXT and parsing each line with ``from_json`` (with the capture column
declared inside the struct) sidesteps the restriction, keeps the whole
split ONE FileScan shared by both frames, and stays pure Catalyst. Schema
is CALLER-SUPPLIED, never inferred: inference is a full extra pass over the
corpus and nondeterministic under corruption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: capture-column name, matching Spark's native convention
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) frames from newline-delimited JSON at ``path``.

    ``clean`` carries exactly the caller's data fields (malformed lines
    dropped, the capture column projected away); blank lines are ignored.
    ``quarantine`` carries ``(source_file, raw_line)`` for every malformed
    line — land it next to the clean output.
    """
    full = _with_corrupt(schema)
    data_fields = [f.name for f in full.fields if f.name != CORRUPT_COL]
    lines = spark.read.text(path).select(
        F.input_file_name().alias("source_file"),
        F.col("value").alias("raw_line"),
    ).filter(F.trim("raw_line") != "")
    parsed = lines.withColumn(
        "_p",
        F.from_json("raw_line", full,
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": CORRUPT_COL}),
    )
    # from_json yields a NULL struct (rather than a populated capture
    # column) for lines it cannot parse at all — treat both as corrupt
    bad = F.col("_p").isNull() | F.col(f"_p.{CORRUPT_COL}").isNotNull()
    clean = parsed.filter(~bad).select(
        *[F.col(f"_p.{c}").alias(c) for c in data_fields])
    quarantine = parsed.filter(bad).select("source_file", "raw_line")
    return clean, quarantine


def jsonl_corruption_stats(quarantine: DataFrame) -> DataFrame:
    """Per-file malformed-line counts — the ingest health dashboard row."""
    return quarantine.groupBy("source_file").agg(
        F.count(F.lit(1)).alias("n_corrupt"))
