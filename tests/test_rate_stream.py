"""Stateful streaming counter_rate vs the batch operator.

Two time-split files, one micro-batch each (maxFilesPerTrigger=1): the lag
partner of each second-batch first point lives in the first batch, so
equality with the batch operator proves the GroupState carry works. A
second fixture pins reset + NULL semantics ACROSS the batch boundary.
"""

from __future__ import annotations

import shutil
import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from gensor_spark.operators.seriesstats import counter_rate
from gensor_spark.streaming.rate_stream import streaming_counter_rate

SF = "/root/testdata/sf0.001"


def _write_split(spark, tmp_path_factory, df, name):
    """Time-split df into two parquet files with ordered mtimes."""
    d = tmp_path_factory.mktemp(f"{name}_in")
    mid = df.selectExpr("percentile(unix_micros(ts), 0.5) p").collect()[0].p
    early = df.filter(f"unix_micros(ts) <= {mid}")
    late = df.filter(f"unix_micros(ts) > {mid}")
    early.coalesce(1).write.mode("overwrite").parquet(str(d / "a"))
    time.sleep(1.1)
    late.coalesce(1).write.mode("overwrite").parquet(str(d / "b"))
    out = tmp_path_factory.mktemp(f"{name}_flat")
    for i, sub in enumerate(("a", "b")):
        src = next((d / sub).glob("*.parquet"))
        shutil.copy(src, out / f"{i}_{src.name}")
        time.sleep(1.1)
    return str(out)


def _run_stream(spark, in_dir, tmp_path, qname, **kwargs):
    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming_counter_rate(stream, **kwargs)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {qname}").toPandas()


@pytest.fixture(scope="module")
def unique_ts_points(spark):
    """Event points deduplicated to one row per (series, ts) so the batch
    tie-break (seq) and the stream's ts-only ordering agree."""
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "cast(user_id as string) doc_id", "event_type source",
        "cast(ts as timestamp) ts", "value")
    return (
        ev.groupBy("doc_id", "source", "ts")
        .agg(F.min("value").alias("value"))
    )


def _sorted(pdf):
    return pdf.sort_values(["doc_id", "source", "ts"]).reset_index(drop=True)


def test_stream_counter_rate_equals_batch(spark, unique_ts_points,
                                          tmp_path_factory, tmp_path):
    in_dir = _write_split(spark, tmp_path_factory, unique_ts_points, "rate")
    got = _sorted(_run_stream(spark, in_dir, tmp_path, "rate_out",
                              counter=True))

    batch_in = unique_ts_points.withColumn(
        "seq",
        F.row_number().over(
            Window.partitionBy("doc_id", "source").orderBy("ts")) - 1,
    )
    want = _sorted(
        counter_rate(batch_in, counter=True)
        .select("doc_id", "source", "ts", "value", "is_reset",
                "increase", "rate")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    for c in ("doc_id", "source", "ts"):
        assert (got[c] == want[c]).all()
    np.testing.assert_array_equal(
        got["is_reset"].to_numpy(dtype=bool), want["is_reset"].to_numpy(dtype=bool)
    )
    for c in ("value", "increase", "rate"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
            rtol=1e-12, equal_nan=True,
        )


def test_stream_reset_and_null_across_batch_boundary(spark, tmp_path_factory,
                                                     tmp_path):
    """The reset and the NULL both sit at a micro-batch boundary: the carry
    must hold the pre-boundary sample (including a NULL one) in state."""
    ts = pd.date_range("2024-01-01", periods=6, freq="30s", tz="UTC")
    # batch 1: 10 -> 40 -> NULL ; batch 2: 5 (reset vs ... NULL prev) -> 8 -> 20
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "ts": ts,
        "value": pd.array([10.0, 40.0, None, 5.0, 8.0, 20.0], dtype=float),
    })
    df = spark.createDataFrame(pdf)
    in_dir = _write_split(spark, tmp_path_factory, df, "ratefix")
    got = _sorted(_run_stream(spark, in_dir, tmp_path, "ratefix_out",
                              counter=True))
    assert len(got) == 6
    rows = [got.iloc[i] for i in range(6)]  # _sorted ordered by ts
    assert np.isnan(rows[0].increase)                 # first point
    assert rows[1].increase == pytest.approx(30.0)
    assert np.isnan(rows[2].increase)                 # NULL value
    # boundary row: previous value is NULL (carried in state) -> masked,
    # NOT treated as a reset
    assert np.isnan(rows[3].increase) and not rows[3].is_reset
    assert rows[4].increase == pytest.approx(3.0)
    assert rows[4].rate == pytest.approx(3.0 / 30.0)
    assert rows[5].increase == pytest.approx(12.0)


def test_stream_gauge_mode_passes_negative_deltas(spark, tmp_path_factory,
                                                  tmp_path):
    ts = pd.date_range("2024-01-01", periods=3, freq="30s", tz="UTC")
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "ts": ts,
        "value": [10.0, 4.0, 6.0],
    })
    in_dir = _write_split(spark, tmp_path_factory,
                          spark.createDataFrame(pdf), "gauge")
    got = _sorted(_run_stream(spark, in_dir, tmp_path, "gauge_out",
                              counter=False))
    assert got["increase"].iloc[1] == pytest.approx(-6.0)
    assert not got["is_reset"].any()


def test_stream_series_spanning_arrow_chunks(spark, tmp_path_factory,
                                             tmp_path):
    """applyInPandasWithState hands a group to the operator as an ITERATOR
    of Arrow chunks (~10k rows each) in arbitrary order. A series whose
    single micro-batch exceeds one chunk — written here in SHUFFLED row
    order so later chunks carry earlier timestamps — must still pair every
    lag partner correctly: the operator sorts the WHOLE group once, never
    chunk-by-chunk."""
    n = 25_000  # > 2x spark.sql.execution.arrow.maxRecordsPerBatch (10k)
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame({
        "doc_id": "big", "source": "s",
        "ts": pd.date_range("2024-01-01", periods=n, freq="s", tz="UTC"),
        "value": np.cumsum(np.abs(rng.randn(n))),
    })
    shuffled = pdf.iloc[rng.permutation(n)].reset_index(drop=True)
    in_dir = tmp_path_factory.mktemp("bigchunks")
    spark.createDataFrame(shuffled).coalesce(1).write.mode(
        "overwrite").parquet(str(in_dir / "f"))

    got = _sorted(_run_stream(spark, str(in_dir / "f"), tmp_path,
                              "bigchunk_out", counter=True))

    batch_in = spark.createDataFrame(pdf).withColumn(
        "seq",
        F.row_number().over(
            Window.partitionBy("doc_id", "source").orderBy("ts")) - 1,
    )
    want = _sorted(
        counter_rate(batch_in, counter=True)
        .select("doc_id", "source", "ts", "value", "is_reset",
                "increase", "rate")
        .toPandas()
    )
    assert len(got) == len(want) == n
    for c in ("increase", "rate"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
            rtol=1e-12, equal_nan=True,
        )
    # a monotone counter never resets — a per-chunk sort would produce
    # spurious resets at every chunk seam
    assert not got["is_reset"].any()
