"""Streaming as-of enrichment vs the batch operator on the same input."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.asof import asof_join
from gensor_spark.streaming.asof_stream import asof_enrich_stream


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    yield str(src), str(out)
    shutil.rmtree(tmp_path, ignore_errors=True)


def _ts(col):
    return F.col(col).cast("timestamp")


def test_stream_asof_equals_batch(spark, dirs):
    src, out = dirs
    left_rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 00:20:00", 2.0),
        ("a", "2024-01-01 02:00:00", 3.0),
        ("b", "2024-01-01 00:00:30", 4.0),
    ]
    right_rows = [
        ("a", "2024-01-01 00:10:00", 10.0),
        ("a", "2024-01-01 00:15:00", 11.0),
        ("b", "2024-01-01 01:00:00", 12.0),
    ]
    left = spark.createDataFrame(
        left_rows, "doc_id string, ts_s string, lv double"
    ).select("doc_id", _ts("ts_s").alias("ts"), "lv")
    right = spark.createDataFrame(
        right_rows, "doc_id string, ts_s string, rv double"
    ).select("doc_id", _ts("ts_s").alias("ts"), "rv")
    left.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(left.schema).parquet(src)
    q = asof_enrich_stream(stream, right, out, keys=("doc_id",),
                           trigger_once=True, bucket_seconds=3600)
    q.awaitTermination(120)

    got = {(r.doc_id, str(r.ts)): (r.rv, str(r.right_ts))
           for r in spark.read.parquet(f"{out}/data").collect()}
    want = {(r.doc_id, str(r.ts)): (r.rv, str(r.right_ts))
            for r in asof_join(left, right, keys=("doc_id",)).collect()}
    assert got == want and len(got) == len(left_rows)


def test_stream_asof_growing_reference(spark, dirs):
    """A callable right_source re-reads the reference each epoch: points in
    a later epoch match reference rows that landed between epochs."""
    src, out = dirs
    ref_dir = f"{out}/_ref"

    left = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1.0)],
        "doc_id string, ts_s string, lv double",
    ).select("doc_id", _ts("ts_s").alias("ts"), "lv")
    ref1 = spark.createDataFrame(
        [("a", "2024-01-01 00:30:00", 10.0)],
        "doc_id string, ts_s string, rv double",
    ).select("doc_id", _ts("ts_s").alias("ts"), "rv")
    ref1.write.mode("overwrite").parquet(ref_dir)
    left.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(left.schema).parquet(src)
    q = asof_enrich_stream(
        stream, lambda: spark.read.parquet(ref_dir), out,
        keys=("doc_id",), trigger_once=True,
    )
    q.awaitTermination(120)
    first = spark.read.parquet(f"{out}/data").collect()
    assert [(r.rv, str(r.right_ts)) for r in first] == \
        [(10.0, "2024-01-01 00:30:00")]

    # a newer reference row lands, then a second left epoch arrives
    spark.createDataFrame(
        [("a", "2024-01-01 00:45:00", 11.0)],
        "doc_id string, ts_s string, rv double",
    ).select("doc_id", _ts("ts_s").alias("ts"), "rv") \
     .write.mode("append").parquet(ref_dir)
    spark.createDataFrame(
        [("a", "2024-01-01 01:30:00", 2.0)],
        "doc_id string, ts_s string, lv double",
    ).select("doc_id", _ts("ts_s").alias("ts"), "lv") \
     .write.mode("append").parquet(src)

    q2 = asof_enrich_stream(
        stream, lambda: spark.read.parquet(ref_dir), out,
        keys=("doc_id",), trigger_once=True,
    )
    q2.awaitTermination(120)
    rows = {r.lv: (r.rv, str(r.right_ts))
            for r in spark.read.parquet(f"{out}/data").collect()}
    # epoch-1 row is NOT rewritten; epoch-2 row sees the newer reference
    assert rows[1.0] == (10.0, "2024-01-01 00:30:00")
    assert rows[2.0] == (11.0, "2024-01-01 00:45:00")


def test_stream_asof_epoch_replay_is_idempotent(spark, dirs):
    """foreachBatch is at-least-once: a replayed epoch must overwrite its
    own epoch partition, not append a duplicate. Simulate the worst replay
    (a lost commit log — every epoch re-fires with the same ids over the
    same input) and require byte-identical results."""
    src, out = dirs
    left = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 1.0),
         ("b", "2024-01-01 00:20:00", 2.0)],
        "doc_id string, ts_s string, lv double",
    ).select("doc_id", _ts("ts_s").alias("ts"), "lv")
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:05:00", 10.0)],
        "doc_id string, ts_s string, rv double",
    ).select("doc_id", _ts("ts_s").alias("ts"), "rv")
    left.write.mode("overwrite").parquet(src)

    def run():
        stream = spark.readStream.schema(left.schema).parquet(src)
        q = asof_enrich_stream(stream, right, out, keys=("doc_id",),
                               trigger_once=True)
        q.awaitTermination(120)
        return sorted(
            (r.doc_id, str(r.ts), r.lv, r.rv)
            for r in spark.read.parquet(f"{out}/data").collect()
        )

    first = run()
    assert len(first) == 2
    shutil.rmtree(f"{out}/_checkpoints")  # lose the commit log → full replay
    assert run() == first


def test_stream_asof_late_out_of_order_epochs(spark, dirs):
    """Left rows arriving in a LATER epoch with EARLIER event times (late
    data) are still enriched correctly per their own timestamps — the as-of
    match is a function of event time, not arrival epoch — and earlier
    epochs' rows are not rewritten."""
    src, out = dirs
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:15:00", 10.0),
         ("a", "2024-01-01 01:15:00", 11.0)],
        "doc_id string, ts_s string, rv double",
    ).select("doc_id", _ts("ts_s").alias("ts"), "rv")
    schema = "doc_id string, ts timestamp, lv double"

    def feed(rows):
        spark.createDataFrame(
            rows, "doc_id string, ts_s string, lv double",
        ).select("doc_id", _ts("ts_s").alias("ts"), "lv") \
         .write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = asof_enrich_stream(stream, right, out, keys=("doc_id",),
                               trigger_once=True)
        q.awaitTermination(120)

    # epoch 0: an on-time point after the second reference row
    feed([("a", "2024-01-01 02:00:00", 1.0)])
    # epoch 1: a LATE point whose event time precedes everything in epoch 0
    feed([("a", "2024-01-01 00:20:00", 2.0)])

    rows = {r.lv: (r.rv, str(r.right_ts), r.epoch)
            for r in spark.read.parquet(f"{out}/data").collect()}
    assert rows[1.0][:2] == (11.0, "2024-01-01 01:15:00")
    # the late row matched the ≤-00:20 reference despite arriving last
    assert rows[2.0][:2] == (10.0, "2024-01-01 00:15:00")
    assert rows[1.0][2] == 0 and rows[2.0][2] == 1  # epochs preserved
