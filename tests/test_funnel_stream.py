"""Stateful streaming windowFunnel vs the batch operator.

Two time-split files, one micro-batch each: chains that SPAN the batch
boundary (step 0 in batch 1, completion in batch 2) prove the GroupState
starts-vector carry; the final per-key level must equal the batch operator
over the concatenated input, and levels are monotone across batches.
"""

from __future__ import annotations

import shutil
import time

import pandas as pd
import pytest

from gensor_spark.operators.funnel import window_funnel
from gensor_spark.streaming.funnel_stream import streaming_window_funnel

STEPS = ["view", "click", "signup", "purchase"]


def _events_df(spark):
    t0 = pd.Timestamp("2024-01-01", tz="UTC")

    def at(minutes):
        return (t0 + pd.Timedelta(minutes=minutes)).to_pydatetime()

    rows = [
        # u1: chain spans the split at minute 40 AND fits the 30-min window
        ("u1", at(25), "view"), ("u1", at(28), "click"),
        ("u1", at(45), "signup"), ("u1", at(50), "purchase"),
        # u2: early window expires; late restart completes 2 deep
        ("u2", at(0), "view"), ("u2", at(80), "view"), ("u2", at(85), "click"),
        # u3: everything early
        ("u3", at(1), "view"), ("u3", at(2), "click"), ("u3", at(3), "signup"),
        # u4: only late, never step 0
        ("u4", at(90), "click"), ("u4", at(95), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, ts timestamp, source string")


def _split_dir(spark, tmp_path, df):
    mid = pd.Timestamp("2024-01-01 00:40:00", tz="UTC").to_pydatetime()
    d = tmp_path / "split"
    d.mkdir()
    early = df.filter(df.ts <= mid)
    late = df.filter(df.ts > mid)
    early.coalesce(1).write.mode("overwrite").parquet(str(d / "a"))
    time.sleep(1.1)
    late.coalesce(1).write.mode("overwrite").parquet(str(d / "b"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, sub in enumerate(("a", "b")):
        src = next((d / sub).glob("*.parquet"))
        shutil.copy(src, flat / f"{i}_{src.name}")
        time.sleep(1.1)
    return str(flat)


def test_stream_funnel_equals_batch_across_split(spark, tmp_path):
    df = _events_df(spark)
    in_dir = _split_dir(spark, tmp_path, df)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming_window_funnel(stream, STEPS, window_seconds=30 * 60)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("funnel_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM funnel_stream").toPandas()

    # final level per key == the batch operator over all history
    final = (got.sort_values("batch_events")  # any order; take max level
             .groupby("doc_id")["level"].max().to_dict())
    want = {r.doc_id: r.level
            for r in window_funnel(df, STEPS, 30 * 60).collect()}
    assert final == want
    assert want == {"u1": 4, "u2": 2, "u3": 3, "u4": 0}
    # u1's chain SPANS the split: batch 1 must report < 4, batch 2 exactly 4
    u1 = got[got.doc_id == "u1"].sort_values("chain_start_us", na_position="first")
    assert len(u1) == 2
    assert sorted(u1["level"]) == [2, 4]
    # levels are monotone non-decreasing per key across batches
    for d_, grp in got.groupby("doc_id"):
        lv = grp["level"].tolist()
        assert lv == sorted(lv), d_


def test_stream_funnel_guards(spark):
    df = _events_df(spark)
    stream = df  # guards fire before any streaming machinery
    with pytest.raises(ValueError, match="steps"):
        streaming_window_funnel(stream, ["view"], 60)
    with pytest.raises(ValueError, match="window_seconds"):
        streaming_window_funnel(stream, STEPS, 0)
