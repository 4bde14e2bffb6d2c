"""Streaming exact dedup vs the batch keeper semantics."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gensor_spark.streaming.dedup_stream import dedup_stream, start_dedup_sink


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    yield str(src), str(out)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_stream_dedup_first_occurrence_wins(spark, dirs):
    src, out = dirs
    rows = [
        (0, "2024-01-01 00:00:00", "alpha"),
        (1, "2024-01-01 00:00:10", "beta"),
        (2, "2024-01-01 00:00:20", "alpha"),   # dup of 0 within horizon
        (3, "2024-01-01 00:05:00", "gamma"),
        (4, "2024-01-01 00:06:00", "beta"),    # dup of 1 within horizon
        (5, "2024-01-01 00:07:00", "delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts_s string, text string") \
        .select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = start_dedup_sink(dedup_stream(stream, watermark="10 minutes"),
                         out, trigger_once=True)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{out}/data").collect()
    # exactly one survivor per digest (which duplicate survives within a
    # micro-batch is partition-order-dependent — see module docstring)
    kept_texts = sorted(r.text for r in got)
    assert kept_texts == ["alpha", "beta", "delta", "gamma"]
    by_text = {r.text: r.doc_id for r in got}
    assert by_text["alpha"] in (0, 2) and by_text["beta"] in (1, 4)
    assert by_text["gamma"] == 3 and by_text["delta"] == 5


def test_stream_dedup_state_crosses_micro_batches(spark, dirs):
    """A duplicate in a LATER micro-batch is deterministically suppressed:
    the digest state from batch 1 survives into batch 2."""
    src, out = dirs
    batch1 = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", "alpha"), (1, "2024-01-01 00:00:10", "beta")],
        "doc_id long, ts_s string, text string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    batch2 = spark.createDataFrame(
        [(2, "2024-01-01 00:01:00", "alpha"), (3, "2024-01-01 00:01:10", "gamma")],
        "doc_id long, ts_s string, text string",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    batch1.coalesce(1).write.parquet(f"{src}/b1")
    batch2.coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")   # one file per micro-batch
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = start_dedup_sink(dedup_stream(stream, watermark="10 minutes"),
                         out, trigger_once=True)
    q.awaitTermination(120)

    got = {r.text: r.doc_id for r in spark.read.parquet(f"{out}/data").collect()}
    # doc 2 ("alpha" again) was suppressed by state from the earlier batch
    assert got == {"alpha": 0, "beta": 1, "gamma": 3}
