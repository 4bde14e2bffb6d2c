"""Streaming interval enrichment vs the batch operator on the same input."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.intervaljoin import interval_join
from gensor_spark.streaming.interval_stream import interval_enrich_stream


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    yield str(src), str(out)
    shutil.rmtree(tmp_path, ignore_errors=True)


def _ts(col):
    return F.col(col).cast("timestamp")


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, ts_s string, v double"
    ).select("doc_id", _ts("ts_s").alias("ts"), "v")


def _ivs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, s string, e string, label string"
    ).select("doc_id", _ts("s").alias("start_ts"), _ts("e").alias("end_ts"),
             "label")


def test_stream_interval_equals_batch(spark, dirs):
    src, out = dirs
    pts = _pts(spark, [
        ("a", "2024-01-01 01:00:00", 1.0),   # inside 'x'
        ("a", "2024-01-01 05:00:00", 2.0),   # uncovered
        ("b", "2024-01-01 01:30:00", 3.0),   # inside both b-intervals
    ])
    ivs = _ivs(spark, [
        ("a", "2024-01-01 00:00:00", "2024-01-01 02:00:00", "x"),
        ("b", "2024-01-01 00:00:00", "2024-01-01 02:00:00", "y"),
        ("b", "2024-01-01 01:00:00", "2024-01-01 03:00:00", "z"),
    ])
    pts.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(pts.schema).parquet(src)
    q = interval_enrich_stream(stream, ivs, out, keys=("doc_id",),
                               trigger_once=True, bucket_seconds=3600,
                               how="left")
    q.awaitTermination(120)

    def canon(df):
        return sorted((r.doc_id, str(r.ts), r.v, r.label)
                      for r in df.collect())

    got = canon(spark.read.parquet(f"{out}/data"))
    want = canon(interval_join(pts, ivs, keys=("doc_id",),
                               bucket_seconds=3600, how="left"))
    assert got == want
    labels = {(d, v): [] for d, _, v, _ in got}
    for d, _, v, lab in got:
        labels[(d, v)].append(lab)
    assert sorted(labels[("b", 3.0)]) == ["y", "z"]  # multi-interval match
    assert labels[("a", 2.0)] == [None]              # left keeps uncovered


def test_stream_interval_growing_intervals(spark, dirs):
    """A callable intervals_source re-reads the interval table per epoch:
    points in a later epoch see intervals that landed between epochs, and
    earlier epochs' rows are not rewritten."""
    src, out = dirs
    ivs_dir = f"{out}/_ivs"

    _ivs(spark, [("a", "2024-01-01 00:00:00", "2024-01-01 02:00:00", "w1")]) \
        .write.mode("overwrite").parquet(ivs_dir)
    _pts(spark, [("a", "2024-01-01 01:00:00", 1.0)]) \
        .write.mode("append").parquet(src)

    schema = "doc_id string, ts timestamp, v double"

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = interval_enrich_stream(
            stream, lambda: spark.read.parquet(ivs_dir), out,
            keys=("doc_id",), trigger_once=True, bucket_seconds=3600,
        )
        q.awaitTermination(120)

    run()
    assert [(r.v, r.label) for r in
            spark.read.parquet(f"{out}/data").collect()] == [(1.0, "w1")]

    # a second interval lands, then a second point epoch arrives
    _ivs(spark, [("a", "2024-01-01 02:00:00", "2024-01-01 04:00:00", "w2")]) \
        .write.mode("append").parquet(ivs_dir)
    _pts(spark, [("a", "2024-01-01 03:00:00", 2.0)]) \
        .write.mode("append").parquet(src)
    run()

    rows = {r.v: (r.label, r.epoch)
            for r in spark.read.parquet(f"{out}/data").collect()}
    assert rows[1.0] == ("w1", 0)  # epoch-0 row untouched
    assert rows[2.0] == ("w2", 1)  # epoch-1 row sees the new interval
