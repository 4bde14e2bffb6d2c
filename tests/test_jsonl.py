"""JSONL ingestion: clean/quarantine split exactness, no-crash guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gensor_spark.sources.jsonl import jsonl_corruption_stats, read_jsonl

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_tok", T.IntegerType()),
])

GOOD = [
    '{"doc_id": "a", "text": "hello world", "n_tok": 2}',
    '{"doc_id": "b", "text": "second doc", "n_tok": 2}',
    '{"doc_id": "c", "text": null, "n_tok": 0}',        # null field: legal
    '{"doc_id": "d", "text": "extra ignored", "n_tok": 1, "junk": true}',
]
# note: Spark's Jackson parser ACCEPTS a valid first object with trailing
# garbage ('{"a":1} junk'), so "concatenated objects" is not a corruption
# case for this engine — these three are unambiguously malformed
BAD = [
    '{"doc_id": "x", "text": "truncated...',             # unterminated
    'not json at all',
    '{{{',                                               # bare braces
]


@pytest.fixture(scope="module")
def jsonl_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    (d / "part-0.jsonl").write_text("\n".join(GOOD[:2] + BAD[:1]) + "\n")
    (d / "part-1.jsonl").write_text("\n".join(GOOD[2:] + BAD[1:]) + "\n")
    return str(d)


def test_clean_rows_exact(spark, jsonl_dir):
    clean, _ = read_jsonl(spark, jsonl_dir, SCHEMA)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    assert rows["a"].text == "hello world" and rows["a"].n_tok == 2
    assert rows["c"].text is None and rows["c"].n_tok == 0
    assert clean.columns == ["doc_id", "text", "n_tok"]  # capture col gone


def test_quarantine_captures_every_bad_line(spark, jsonl_dir):
    _, quarantine = read_jsonl(spark, jsonl_dir, SCHEMA)
    raw = sorted(r.raw_line for r in quarantine.collect())
    assert len(raw) == 3
    assert any("truncated" in x for x in raw)
    assert any(x == "not json at all" for x in raw)
    assert all(r.source_file for r in quarantine.collect())


def test_clean_plus_quarantine_is_total(spark, jsonl_dir):
    clean, quarantine = read_jsonl(spark, jsonl_dir, SCHEMA)
    assert clean.count() + quarantine.count() == len(GOOD) + len(BAD)


def test_corruption_stats_per_file(spark, jsonl_dir):
    _, quarantine = read_jsonl(spark, jsonl_dir, SCHEMA)
    stats = {r.source_file.rsplit("/", 1)[-1]: r.n_corrupt
             for r in jsonl_corruption_stats(quarantine).collect()}
    assert stats == {"part-0.jsonl": 1, "part-1.jsonl": 2}


def test_caller_schema_with_existing_corrupt_col(spark, jsonl_dir):
    # a schema that already declares the capture column is used as-is
    schema = T.StructType(list(SCHEMA.fields) + [
        T.StructField("_corrupt_record", T.StringType())])
    clean, quarantine = read_jsonl(spark, jsonl_dir, schema)
    assert clean.count() == 4 and quarantine.count() == 3
