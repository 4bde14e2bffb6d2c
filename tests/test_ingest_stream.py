"""Composed streaming ingestion pipeline: gate → mix → dedup → land."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.sampling import DENOM, keep_hash
from gensor_spark.streaming.ingest_stream import ingest_pipeline, start_ingest_sink


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    yield str(src), str(out)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_ingest_pipeline_end_to_end(spark, dirs):
    src, out = dirs
    good = "a perfectly reasonable document with plenty of clean words here"
    rows = [
        (0, "2024-01-01 00:00:00", good, "keepme"),
        (1, "2024-01-01 00:00:05", "x", "keepme"),              # too short
        (2, "2024-01-01 00:00:10", "!!! ??? ;;; ***  ---- !!!!", "keepme"),  # low alnum
        (3, "2024-01-01 00:00:15", good, "keepme"),             # dup of 0
        (4, "2024-01-01 00:00:20", good + " extra", "dropme"),  # rate 0 source
        (5, "2024-01-01 00:00:25", "another long and clean document body with different words", "keepme"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, ts_s string, text string, source string"
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "text", "source")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    survivors = ingest_pipeline(stream, rates={"keepme": 1.0, "dropme": 0.0})
    q = start_ingest_sink(survivors, out, trigger_once=True)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{out}/data").collect()
    texts = sorted(r.text for r in got)
    # 1,2 gated; 4 mixed out; one of {0,3} deduped; 5 survives
    assert len(got) == 2
    assert texts == sorted([good, rows[5][2]])


def test_ingest_pipeline_batch_mode(spark):
    """The composed pipeline also runs on a plain batch frame (plain
    digest dropDuplicates replaces the streaming-only watermarked op)."""
    good = "a perfectly reasonable document with plenty of clean words here"
    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", good, "s"),
         (1, "2024-01-01 00:00:10", good, "s"),
         (2, "2024-01-01 00:00:20", "x", "s")],
        "doc_id long, ts_s string, text string, source string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "text", "source")
    out = ingest_pipeline(df, rates={"s": 1.0}).collect()
    assert len(out) == 1 and out[0].text == good


def test_ingest_pipeline_batch_and_stream_agree_on_stateless_stages(spark):
    """The gate+mix stages are mode-agnostic: applying them to the same
    rows as a plain batch frame keeps exactly the rows whose keep-hash
    passes — replay-stable by construction."""
    from gensor_spark.streaming.ingest_stream import quality_gate
    from gensor_spark.operators.sampling import stratified_sample

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.lit("a long clean document body with plenty of words to pass").alias("text"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    kept = stratified_sample(df.filter(quality_gate()), {"a": 0.4, "b": 0.0})
    ids = {r.doc_id for r in kept.collect()}
    expected = {
        r.doc_id
        for r in df.withColumn("h", keep_hash(F.col("doc_id"), "mix1")).collect()
        if r.source == "a" and r.h < int(0.4 * DENOM)
    }
    assert ids == expected and ids


def test_ingest_pipeline_scrub_stage_batch(spark):
    """scrub=True redacts between gate and mix, so dedup sees redacted
    text: two docs differing only in their PII collapse to one survivor;
    max_pii drops PII-dense docs before landing."""
    base = "a perfectly reasonable document with plenty of clean words here"
    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", base + " mail alice@example.com", "s"),
         (1, "2024-01-01 00:00:10", base + " mail bob@example.org", "s"),
         (2, "2024-01-01 00:00:20",
          base + " a@x.io b@x.io c@x.io 1.2.3.4 5.6.7.8", "s"),
         (3, "2024-01-01 00:00:30", base + " nothing private", "s")],
        "doc_id long, ts_s string, text string, source string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "text", "source")
    out = ingest_pipeline(df, rates={"s": 1.0}, scrub=True, max_pii=2)
    rows = {r.doc_id: r.text for r in out.collect()}
    # docs 0 and 1 redact to the identical text -> one survivor;
    # doc 2 (5 redactions) dies at the max_pii cap; doc 3 unaffected
    assert set(rows) == {0, 3} or set(rows) == {1, 3}
    surviving = rows[0] if 0 in rows else rows[1]
    assert surviving == base + " mail <PII:email>"
    assert "n_pii" not in out.columns and "n_email" not in out.columns


def test_ingest_pipeline_scrub_stage_streaming(spark, dirs):
    """The scrub stage lifts onto the streaming frame unchanged and lands
    redacted text."""
    src, out = dirs
    base = "a perfectly reasonable document with plenty of clean words here"
    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", base + " ping 10.0.0.1 now", "s"),
         (1, "2024-01-01 00:00:10", base + " all clear", "s")],
        "doc_id long, ts_s string, text string, source string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "text", "source")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    survivors = ingest_pipeline(stream, rates={"s": 1.0}, scrub=True)
    q = start_ingest_sink(survivors, out, trigger_once=True)
    q.awaitTermination(120)
    landed = {r.doc_id: r.text
              for r in spark.read.parquet(f"{out}/data").collect()}
    assert landed[0] == base + " ping <PII:ipv4> now"
    assert landed[1] == base + " all clear"


GOPHER_OK = ("The quick brown fox jumps over the lazy dog and runs far away "
             "today with all of that done. ") * 8


def test_ingest_pipeline_gopher_stage_batch(spark):
    """gopher=True drops docs failing any published Gopher rule after the
    cheap gate; flag columns never reach the landing schema."""
    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", GOPHER_OK, "s"),
         # passes the cheap gate (length/alnum) but fails Gopher stop-words
         (1, "2024-01-01 00:00:10",
          " ".join(f"word{i}" for i in range(80)), "s")],
        "doc_id long, ts_s string, text string, source string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "text", "source")
    base = ingest_pipeline(df, rates={"s": 1.0})
    out = ingest_pipeline(df, rates={"s": 1.0}, gopher=True)
    assert {r.doc_id for r in base.collect()} == {0, 1}
    assert {r.doc_id for r in out.collect()} == {0}
    assert out.columns == base.columns  # no flag columns leak


def test_ingest_pipeline_gopher_stage_streaming(spark, dirs):
    src, out = dirs
    df = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", GOPHER_OK, "s"),
         (1, "2024-01-01 00:00:10",
          " ".join(f"word{i}" for i in range(80)), "s")],
        "doc_id long, ts_s string, text string, source string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "text", "source")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    survivors = ingest_pipeline(stream, rates={"s": 1.0}, gopher=True)
    q = start_ingest_sink(survivors, out, trigger_once=True)
    q.awaitTermination(120)
    landed = {r.doc_id for r in spark.read.parquet(f"{out}/data").collect()}
    assert landed == {0}
