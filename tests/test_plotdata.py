"""Plot-data endpoints (operators/plotdata.py) vs hand-computed references."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.plotdata import (
    coverage_segments,
    m4_downsample,
    outlier_overlay,
)

T0 = dt.datetime(2024, 1, 1)


def _series(spark, values, step_s=60, doc="a", source="s"):
    rows = [
        (doc, source, T0 + dt.timedelta(seconds=i * step_s), float(v), i)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, source string, ts timestamp, value double, seq long"
    )


def test_m4_keeps_bin_extremes_and_endpoints(spark):
    rng = np.random.default_rng(5)
    vals = rng.normal(size=400)
    sdf = _series(spark, vals)
    out = m4_downsample(sdf, bins=10).toPandas()

    # ≤ 4 kept points per bin, 10 bins
    per_bin = out.groupby("bin").size()
    assert per_bin.max() <= 4 and set(per_bin.index) <= set(range(10))

    # pandas reference: same per-series binning arithmetic
    ts = pd.date_range(T0, periods=400, freq="60s")
    us = (ts - ts[0]).total_seconds() * 1_000_000
    bins = np.minimum(9, (us * 10 // us[-1]).astype(int))
    ref = pd.DataFrame({"bin": bins, "v": vals, "ts": ts})
    for b, grp in ref.groupby("bin"):
        got = out[out["bin"] == b]
        assert grp["v"].min() in got["value"].values, f"bin {b} lost its min"
        assert grp["v"].max() in got["value"].values, f"bin {b} lost its max"
        assert grp["ts"].iloc[0] in list(got["ts"]), f"bin {b} lost first"
        assert grp["ts"].iloc[-1] in list(got["ts"]), f"bin {b} lost last"

    # global endpoints survive any bin count
    assert pd.Timestamp(T0) in list(out["ts"])
    assert ts[-1] in list(out["ts"])


def test_m4_single_point_series_and_ties(spark):
    sdf = _series(spark, [7.0])
    out = m4_downsample(sdf, bins=5).toPandas()
    assert len(out) == 1 and out["value"].iloc[0] == 7.0  # roles collapse

    flat = _series(spark, [1.0] * 50)  # all ties: min==max==first==last
    out = m4_downsample(flat, bins=5).toPandas()
    assert out.groupby("bin").size().max() <= 4
    assert (out["value"] == 1.0).all()


def test_outlier_overlay_flags_spike_and_validates(spark):
    vals = [1.0] * 50
    vals[20] = 500.0
    sdf = _series(spark, vals)
    out = outlier_overlay(sdf, method="zscore_global", threshold=3.0).toPandas()
    assert list(out["value"]) == [500.0]
    assert (out["method"] == "zscore_global").all()
    with pytest.raises(ValueError, match="unknown outlier method"):
        outlier_overlay(sdf, method="nope")


def test_coverage_segments_split_at_gaps(spark):
    # three runs separated by > 1h holes
    times = (
        [T0 + dt.timedelta(minutes=i) for i in range(5)]
        + [T0 + dt.timedelta(hours=3, minutes=i) for i in range(3)]
        + [T0 + dt.timedelta(hours=9, minutes=i) for i in range(4)]
    )
    rows = [("a", "s", t, 1.0, i) for i, t in enumerate(times)]
    sdf = spark.createDataFrame(
        rows, "doc_id string, source string, ts timestamp, value double, seq long"
    )
    out = (coverage_segments(sdf, gap_seconds=3600).toPandas()
           .sort_values("segment").reset_index(drop=True))
    assert list(out["n_points"]) == [5, 3, 4]
    assert out["start_ts"][0] == pd.Timestamp(T0)
    assert out["end_ts"][2] == pd.Timestamp(times[-1])
