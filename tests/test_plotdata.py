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


# ------------------------------------------------------------------- LTTB

def _lttb_reference(ts, vals, k):
    """Independent straight-from-the-paper implementation (loops, no numpy
    vectorization) used only to cross-check the operator kernel."""
    import numpy as np

    n = len(ts)
    if n <= k:
        return list(range(n))
    edges = np.linspace(1, n - 1, k - 1).astype(int)
    kept = [0]
    a = 0
    for i in range(k - 2):
        lo, hi = edges[i], edges[i + 1]
        if i + 2 < k - 1:
            nxt = list(range(edges[i + 1], edges[i + 2]))
        else:
            nxt = [n - 1]
        nx_t = sum(ts[j] for j in nxt) / len(nxt)
        nx_v = sum(vals[j] for j in nxt) / len(nxt)
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((ts[a] - nx_t) * (vals[j] - vals[a])
                       - (ts[a] - ts[j]) * (nx_v - vals[a]))
            if area > best_area:
                best, best_area = j, area
        kept.append(best)
        a = best
    kept.append(n - 1)
    return kept


def test_lttb_matches_reference_impl(spark):
    """Operator vs the loop-wise reference on irregular multi-series data."""
    import numpy as np
    import pandas as pd

    from gensor_spark.operators.plotdata import lttb_downsample

    rng = np.random.default_rng(7)
    frames = []
    for doc, n in (("a", 500), ("b", 83), ("c", 9)):
        ts = pd.to_datetime(
            np.sort(rng.choice(10**6, size=n, replace=False)) * 10**9, utc=True
        )
        frames.append(pd.DataFrame({
            "doc_id": doc, "source": "s", "seq": np.arange(n), "ts": ts,
            "value": rng.normal(size=n).cumsum(),
        }))
    pdf = pd.concat(frames, ignore_index=True)
    k = 20
    got = (
        lttb_downsample(spark.createDataFrame(pdf), k=k)
        .orderBy("doc_id", "ts").toPandas()
    )
    for doc, g in pdf.groupby("doc_id"):
        g = g.sort_values("ts").reset_index(drop=True)
        idx = _lttb_reference(
            g["ts"].astype("int64").to_numpy().astype(float),
            g["value"].to_numpy(), k,
        )
        want = g.iloc[idx]
        have = got[got.doc_id == doc]
        assert list(have["seq"]) == list(want["seq"]), doc
        np.testing.assert_allclose(have["value"].to_numpy(), want["value"].to_numpy())


def test_lttb_invariants_and_area_optimality(spark):
    """Independent of bucket-edge conventions: every kept middle point must
    be the argmax-area choice within its bucket given its actual neighbors,
    and first/last/count invariants hold."""
    import numpy as np
    import pandas as pd

    from gensor_spark.operators.plotdata import _lttb_select, lttb_downsample

    rng = np.random.default_rng(11)
    n, k = 400, 25
    ts = np.arange(n, dtype=float) * 60.0
    vals = np.sin(ts / 500.0) * 10 + rng.normal(size=n)
    idx = _lttb_select(ts, vals, k)
    assert idx[0] == 0 and idx[-1] == n - 1 and len(idx) == k
    assert (np.diff(idx) > 0).all()
    edges = np.linspace(1, n - 1, k - 1).astype(int)
    for i in range(k - 2):
        lo, hi = edges[i], edges[i + 1]
        assert lo <= idx[i + 1] < hi  # one point per bucket
        # area optimality against the previously kept point + next-bucket avg
        a = idx[i]
        if i + 2 < k - 1:
            nx_t, nx_v = ts[edges[i+1]:edges[i+2]].mean(), vals[edges[i+1]:edges[i+2]].mean()
        else:
            nx_t, nx_v = ts[-1], vals[-1]
        areas = np.abs((ts[a] - nx_t) * (vals[lo:hi] - vals[a])
                       - (ts[a] - ts[lo:hi]) * (nx_v - vals[a]))
        assert areas[idx[i + 1] - lo] == areas.max()

    # short series pass through untouched; k<3 rejected
    tiny = pd.DataFrame({
        "doc_id": "t", "source": "s", "seq": [0, 1], 
        "ts": pd.to_datetime([0, 10**9], utc=True), "value": [1.0, 2.0],
    })
    out = lttb_downsample(spark.createDataFrame(tiny), k=5).collect()
    assert len(out) == 2
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        lttb_downsample(spark.createDataFrame(tiny), k=2)
