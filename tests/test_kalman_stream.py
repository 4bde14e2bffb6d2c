"""Streaming Kalman filter: epoch-split == batch filter, bit-exact.

The stream's only cross-batch memory is the (a, p) posterior, so any
epoch split of an in-order stream must reproduce the batch operator's
k_filt column bit-for-bit; k_pvar is pinned against an independent
sequential variance recursion. Gap/leading-NaN semantics mirror batch.
"""

from __future__ import annotations

import shutil
import time

import numpy as np
import pandas as pd
import pytest

from gensor_spark.streaming.kalman_stream import streaming_kalman

Q, R = 0.4, 1.3


def _mk_points(n=120):
    rng = np.random.default_rng(11)
    frames = []
    for sid in ("a", "b"):
        v = np.cumsum(rng.normal(0, 1.0, n)) + rng.normal(0, 0.7, n)
        v[:3] = np.nan if sid == "a" else v[:3]  # leading gap on one series
        v[40:46] = np.nan  # internal gap
        frames.append(pd.DataFrame({
            "doc_id": sid, "source": "s",
            "ts": pd.date_range("2024-01-01", periods=n, freq="min",
                                tz="UTC"),
            "value": v,
        }))
    return pd.concat(frames, ignore_index=True)


def _run(spark, pdf, tmp_path, qname, n_files=3, **kwargs):
    d = tmp_path / f"in_{qname}"
    d.mkdir()
    cuts = np.array_split(pdf.sort_values("ts").index, n_files)
    for i, idx in enumerate(cuts):
        spark.createDataFrame(pdf.loc[idx]).coalesce(1) \
            .write.mode("overwrite").parquet(str(d / f"p{i}"))
        src = next((d / f"p{i}").glob("*.parquet"))
        shutil.copy(src, d / f"{i}_{src.name}")
        shutil.rmtree(d / f"p{i}")
        time.sleep(1.05)
    stream = (spark.readStream.schema(spark.createDataFrame(pdf).schema)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    out = streaming_kalman(stream, **kwargs)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(qname)
         .option("checkpointLocation", str(tmp_path / f"ck_{qname}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return (spark.sql(f"select * from {qname}")
            .toPandas().sort_values(["doc_id", "ts"]).reset_index(drop=True))


def _seq_reference(vals, q, r):
    a = p = np.nan
    filt, pvar = [], []
    for v in vals:
        if np.isnan(a):
            if np.isnan(v):
                filt.append(np.nan)
                pvar.append(np.nan)
                continue
            a, p = v, r
        else:
            pp = p + q
            if np.isnan(v):
                p = pp
            else:
                s = pp + r
                g = pp / s
                a = a + g * (v - a)
                p = (1 - g) * pp
        filt.append(a)
        pvar.append(p)
    return np.array(filt), np.array(pvar)


def test_stream_matches_batch_filter_bitexact(spark, tmp_path):
    pdf = _mk_points()
    got = _run(spark, pdf, tmp_path, "kstream1", n_files=3, q=Q, r=R)
    assert len(got) == len(pdf)

    # batch operator on the same points
    from gensor_spark.operators.kalman import kalman_smooth
    pts = spark.createDataFrame(
        pdf.assign(seq=pdf.groupby("doc_id").cumcount()))
    batch = (kalman_smooth(pts, q=Q, r=R).toPandas()
             .sort_values(["doc_id", "ts"]).reset_index(drop=True))
    for sid in ("a", "b"):
        s = got[got.doc_id == sid]["k_filt"].to_numpy()
        b = batch[batch.doc_id == sid]["k_filt"].to_numpy()
        np.testing.assert_array_equal(s, b)  # bit-exact incl. NaN pattern
        # variance vs the independent sequential recursion
        v = pdf[pdf.doc_id == sid].sort_values("ts")["value"].to_numpy()
        _, pv = _seq_reference(v, Q, R)
        np.testing.assert_allclose(
            got[got.doc_id == sid]["k_pvar"].to_numpy(), pv,
            rtol=1e-12, atol=0, equal_nan=True)


def test_epoch_split_invariance(spark, tmp_path):
    pdf = _mk_points(n=60)
    a = _run(spark, pdf, tmp_path, "kstream2", n_files=1, q=Q, r=R)
    b = _run(spark, pdf, tmp_path, "kstream3", n_files=4, q=Q, r=R)
    np.testing.assert_array_equal(a["k_filt"].to_numpy(),
                                  b["k_filt"].to_numpy())
    np.testing.assert_array_equal(a["k_pvar"].to_numpy(),
                                  b["k_pvar"].to_numpy())


def test_arg_validation(spark):
    import datetime

    df = spark.createDataFrame(
        [("a", "s", datetime.datetime(2024, 1, 1), 1.0)],
        "doc_id string, source string, ts timestamp, value double")
    with pytest.raises(ValueError):
        streaming_kalman(df, q=0.0)
