"""Stateful streaming EWMA vs the batch operator and vs pandas itself.

Same harness as test_rate_stream: two time-split files, one micro-batch
each — the recurrence state of every second-batch first point lives in the
first batch, so equality with the batch operator proves the GroupState
(num, den) carry works, including NaN aging at the boundary.
"""

from __future__ import annotations

import shutil
import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from gensor_spark.operators.seriesstats import ewma
from gensor_spark.streaming.smooth_stream import streaming_ewma

SF = "/root/testdata/sf0.001"


def _write_split(spark, tmp_path_factory, df, name):
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
    out = streaming_ewma(stream, **kwargs)
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
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "cast(user_id as string) doc_id", "event_type source",
        "cast(ts as timestamp) ts", "value")
    return (
        ev.groupBy("doc_id", "source", "ts")
        .agg(F.min("value").alias("value"))
    )


def _sorted(pdf):
    return pdf.sort_values(["doc_id", "source", "ts"]).reset_index(drop=True)


@pytest.mark.parametrize("ignore_na", [False, True])
def test_stream_ewma_equals_batch(spark, unique_ts_points, tmp_path_factory,
                                  tmp_path, ignore_na):
    in_dir = _write_split(
        spark, tmp_path_factory, unique_ts_points, f"ewma{int(ignore_na)}")
    got = _sorted(_run_stream(
        spark, in_dir, tmp_path, f"ewma_out{int(ignore_na)}",
        alpha=0.35, ignore_na=ignore_na))

    batch_in = unique_ts_points.withColumn(
        "seq",
        F.row_number().over(
            Window.partitionBy("doc_id", "source").orderBy("ts")) - 1,
    )
    want = _sorted(
        ewma(batch_in, alpha=0.35, adjust=True, ignore_na=ignore_na)
        .select("doc_id", "source", "ts", "value", "ewma")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    for c in ("doc_id", "source", "ts"):
        assert (got[c] == want[c]).all()
    for c in ("value", "ewma"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
            rtol=1e-12, equal_nan=True,
        )


def test_stream_ewma_nan_at_boundary(spark, tmp_path_factory, tmp_path):
    """A NULL as the LAST pre-boundary row: with ignore_na=False the carried
    weights must age through it (pandas semantics), pinned vs pandas."""
    ts = pd.date_range("2024-01-01", periods=6, freq="30s", tz="UTC")
    vals = [2.0, 4.0, None, 8.0, None, 1.0]
    pdf = pd.DataFrame({"doc_id": "d", "source": "s", "ts": ts,
                        "value": pd.array(vals, dtype=float)})
    df = spark.createDataFrame(pdf)
    in_dir = _write_split(spark, tmp_path_factory, df, "ewmafix")
    got = _sorted(_run_stream(spark, in_dir, tmp_path, "ewmafix_out",
                              alpha=0.5, ignore_na=False))
    want = pd.Series(vals, dtype=float).ewm(
        alpha=0.5, adjust=True, ignore_na=False).mean().to_numpy()
    np.testing.assert_allclose(
        got["ewma"].to_numpy(dtype=float), want, rtol=1e-12, equal_nan=True)


def test_stream_ewma_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        streaming_ewma(None, alpha=0.0)


def _run_stream_t(spark, in_dir, tmp_path, qname, **kwargs):
    from gensor_spark.streaming.smooth_stream import streaming_ewma_halflife

    schema = spark.read.parquet(in_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming_ewma_halflife(stream, **kwargs)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {qname}").toPandas()


def test_stream_ewma_halflife_equals_batch(spark, unique_ts_points,
                                           tmp_path_factory, tmp_path):
    """Time-aware stream == batch ewma_halflife across the epoch split —
    the (num, den, last_event_us) carry ages the second epoch's first
    point by the REAL cross-batch gap."""
    from gensor_spark.operators.seriesstats import ewma_halflife

    hl = 3600.0
    in_dir = _write_split(spark, tmp_path_factory, unique_ts_points, "ewt")
    got = _sorted(_run_stream_t(spark, in_dir, tmp_path, "ewt1",
                                halflife_seconds=hl))
    want = _sorted(
        ewma_halflife(
            unique_ts_points.withColumn("seq", F.lit(0)),
            halflife_seconds=hl)
        .select("doc_id", "source", "ts", "value", "ewma_t").toPandas())
    assert len(got) == len(want)
    np.testing.assert_allclose(got["ewma_t"].to_numpy(),
                               want["ewma_t"].to_numpy(),
                               rtol=1e-9, equal_nan=True)


def test_stream_ewma_halflife_restart_across_idle_gap(spark, tmp_path):
    """Checkpoint-restart mid-series across a 3-day idle gap — the risky
    path the (num, den, last_event_us) state triple exists for: the
    restarted query must reload the state store and age it by the REAL
    elapsed event time (72h ≈ 72 half-lives), not by a per-batch cadence,
    and a NaN immediately before the gap must have aged-without-
    contributing. Pinned equal to the batch operator at 1e-9."""
    from gensor_spark.operators.seriesstats import ewma_halflife
    from gensor_spark.streaming.smooth_stream import streaming_ewma_halflife

    hl = 3600.0
    ts1 = pd.date_range("2024-01-01", periods=5, freq="90s", tz="UTC")
    ts2 = pd.date_range("2024-01-04", periods=5, freq="45s", tz="UTC")
    vals1 = [2.0, None, 5.0, 7.0, None]   # NaN as the last pre-gap row
    vals2 = [9.0, 1.0, None, 4.0, 6.0]
    frames = [
        pd.DataFrame({"doc_id": "d", "source": "s", "ts": t,
                      "value": pd.array(v, dtype=float)})
        for t, v in ((ts1, vals1), (ts2, vals2))
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # pyarrow defaults to TIMESTAMP(NANOS), which Spark's parquet reader
    # rejects — coerce to microseconds
    frames[0].to_parquet(in_dir / "0_epoch.parquet", index=False,
                         coerce_timestamps="us")
    ckpt = str(tmp_path / "ckpt_restart")
    out_dir = str(tmp_path / "out_restart")
    schema = spark.read.parquet(str(in_dir)).schema

    def run_epoch():
        # durable (parquet) sink: the memory sink refuses checkpoint
        # recovery, and recovery is exactly what this test exercises
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(in_dir)))
        q = (streaming_ewma_halflife(stream, halflife_seconds=hl)
             .writeStream.outputMode("append").format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        return spark.read.parquet(out_dir).toPandas()

    part1 = run_epoch()                    # query STOPS after epoch 1
    assert len(part1) == 5
    frames[1].to_parquet(in_dir / "1_epoch.parquet", index=False,
                         coerce_timestamps="us")
    got = _sorted(run_epoch())             # fresh query, same checkpoint
    assert len(got) == 10                  # 5 recovered-state + 5 new rows

    batch_in = spark.createDataFrame(
        pd.concat(frames, ignore_index=True)).withColumn("seq", F.lit(0))
    want = _sorted(
        ewma_halflife(batch_in, halflife_seconds=hl)
        .select("doc_id", "source", "ts", "value", "ewma_t").toPandas())
    np.testing.assert_allclose(got["ewma_t"].to_numpy(),
                               want["ewma_t"].to_numpy(),
                               rtol=1e-9, equal_nan=True)


def test_stream_ewma_halflife_rejects_bad_halflife(spark):
    import datetime

    df = spark.createDataFrame(
        [("a", "s", datetime.datetime(2024, 1, 1), 1.0)],
        "doc_id string, source string, ts timestamp, value double")
    from gensor_spark.streaming.smooth_stream import streaming_ewma_halflife

    with pytest.raises(ValueError):
        streaming_ewma_halflife(df, halflife_seconds=-1.0)
