"""Streaming Page-CUSUM: epoch-split == single-pass, sequential reference
parity, planted-shift alarms, self-calibration semantics."""

from __future__ import annotations

import shutil
import time

import numpy as np
import pandas as pd
import pytest

from gensor_spark.streaming.cusum_stream import streaming_cusum


def _page_reference(vals, k, h, mu, sigma):
    """Independent sequential loop: (s_pos, s_neg, alarm) per point."""
    sp = sn = 0.0
    out = []
    for v in vals:
        if np.isnan(v):
            out.append((np.nan, np.nan, False))
            continue
        z = (v - mu) / sigma
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        a = sp > h or sn > h
        out.append((sp, sn, a))
        if sp > h:
            sp = 0.0
        if sn > h:
            sn = 0.0
    return out


def _mk_points(shift_at=120, n=200):
    rng = np.random.default_rng(4)
    v = rng.normal(10.0, 2.0, n)
    v[shift_at:] += 6.0  # 3-sigma upward shift
    v[17] = np.nan
    return pd.DataFrame({
        "doc_id": "d0", "source": "s",
        "ts": pd.date_range("2024-01-01", periods=n, freq="min", tz="UTC"),
        "value": v,
    })


def _run(spark, pdf, tmp_path, qname, n_files=2, **kwargs):
    d = tmp_path / f"in_{qname}"
    d.mkdir()
    cuts = np.array_split(pdf.index, n_files)
    for i, idx in enumerate(cuts):
        spark.createDataFrame(pdf.loc[idx]).coalesce(1) \
            .write.mode("overwrite").parquet(str(d / f"p{i}"))
        src = next((d / f"p{i}").glob("*.parquet"))
        shutil.copy(src, d / f"{i}_{src.name}")
        shutil.rmtree(d / f"p{i}")
        time.sleep(1.05)
    stream = (spark.readStream.schema(spark.createDataFrame(pdf).schema)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    out = streaming_cusum(stream, **kwargs)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(qname)
         .option("checkpointLocation", str(tmp_path / f"ck_{qname}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return (spark.sql(f"select * from {qname}")
            .toPandas().sort_values("ts").reset_index(drop=True))


def test_stream_matches_sequential_reference_across_epochs(spark, tmp_path):
    pdf = _mk_points()
    got = _run(spark, pdf, tmp_path, "cusum_a", n_files=3,
               k=0.5, h=5.0, mu0=10.0, sigma0=2.0)
    ref = _page_reference(pdf["value"].to_numpy(), 0.5, 5.0, 10.0, 2.0)
    assert len(got) == len(ref)
    for i, (sp, sn, a) in enumerate(ref):
        if np.isnan(sp):
            assert np.isnan(got["s_pos"][i]) and not got["alarm"][i]
        else:
            assert abs(got["s_pos"][i] - sp) < 1e-12
            assert abs(got["s_neg"][i] - sn) < 1e-12
            assert bool(got["alarm"][i]) == a


def test_alarm_fires_after_shift_not_before(spark, tmp_path):
    pdf = _mk_points(shift_at=120)
    got = _run(spark, pdf, tmp_path, "cusum_b",
               k=0.5, h=5.0, mu0=10.0, sigma0=2.0)
    alarms = got.index[got["alarm"]].tolist()
    assert alarms and min(alarms) >= 120
    assert min(alarms) <= 130  # 3-sigma shift trips within ~10 points


def test_self_calibration_warmup(spark, tmp_path):
    pdf = _mk_points(shift_at=120)
    got = _run(spark, pdf, tmp_path, "cusum_c", k=0.5, h=5.0, warmup=40)
    # no scores/alarms during warmup
    assert got["s_pos"][:40].isna().all()
    assert not got["alarm"][:40].any()
    alarms = got.index[got["alarm"]].tolist()
    assert alarms and 120 <= min(alarms) <= 135


def test_parameter_validation(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        streaming_cusum(df, h=0.0)
    with pytest.raises(ValueError):
        streaming_cusum(df, mu0=0.0, sigma0=0.0)
    with pytest.raises(ValueError):
        streaming_cusum(df, warmup=1)
