"""Spectral-residual anomaly detection (operators/spectral.py).

The kernel is pinned against an INDEPENDENT reference implementation that
uses a direct O(n²) DFT matrix (no np.fft) and naive Python loops for the
moving averages — same mathematics, disjoint code path. Behavioral pins:
the saliency map spikes at a planted spike inside a strong seasonal
pattern (the case a global z-test cannot separate), NaN masking, episode
coalescing, and distributed == kernel parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.spectral import (
    _sr_kernel,
    anomaly_episodes,
    spectral_residual,
)


def _ref_sr(x, mag_window=3, score_window=21, extend_num=5, look_ahead=5):
    """Independent SR: direct DFT matrix + loop-built moving averages."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    la = min(look_ahead, n - 1)
    if extend_num > 0 and la >= 1:
        slopes = [(x[-1] - x[-1 - i]) / i for i in range(la, 0, -1)]
        est = x[-(la + 1)] + (sum(slopes) / len(slopes)) * (la + 1)
        xe = np.concatenate([x, [est] * extend_num])
    else:
        xe = x
    m = xe.size
    k = np.arange(m)
    W = np.exp(-2j * np.pi * np.outer(k, k) / m)  # DFT matrix
    spec = W @ xe
    amp = np.abs(spec)
    logamp = np.log(np.maximum(amp, 1e-12))

    def movavg_same(a, w):
        # zero-padded 'same' convolution with a ones/w kernel, by hand:
        # same[i] = full[i + (w-1)//2], full[t] = (1/w)·Σ_j a[j]·[t-w < j <= t]
        w = max(1, min(w, a.size))
        out = np.empty_like(a)
        c = (w - 1) // 2
        for i in range(a.size):
            lo = max(0, i + c - w + 1)
            hi = min(a.size, i + c + 1)
            out[i] = a[lo:hi].sum() / w
        return out

    resid = logamp - movavg_same(logamp, mag_window)
    phase = np.where(amp > 0, spec / amp, 0.0)
    Winv = np.conj(W) / m
    sal = np.abs(Winv @ (np.exp(resid) * phase))[:n]
    local = np.maximum(movavg_same(sal, min(score_window, n)), 1e-12)
    return sal, (sal - local) / local


@pytest.mark.parametrize("n", [16, 50, 127])
def test_kernel_matches_independent_dft_reference(n):
    rng = np.random.default_rng(n)
    x = np.sin(np.arange(n) * 0.3) * 5 + rng.normal(0, 0.5, n)
    got_sal, got_score = _sr_kernel(x, 3, 21, 5, 5)
    exp_sal, exp_score = _ref_sr(x)
    np.testing.assert_allclose(got_sal, exp_sal, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got_score, exp_score, rtol=1e-9, atol=1e-9)


def test_spike_in_seasonal_series_is_top_salient():
    """A one-point spike inside a strong sinusoid: SR's selling point. The
    spike must carry the top score, and the seasonal peaks (which a global
    z-test flags before the spike) must score far below it."""
    n = 240
    t = np.arange(n)
    x = 10 * np.sin(2 * np.pi * t / 24)  # daily season, amplitude 10
    x[117] += 6.0  # in-band spike: |value| stays under the seasonal max
    sal, score = _sr_kernel(x, 3, 21, 5, 5)
    assert int(np.argmax(score)) == 117
    # global z-score CANNOT isolate it: the spike value is not extreme
    z = np.abs((x - x.mean()) / x.std())
    assert int(np.argmax(z)) != 117


def test_short_and_constant_series_never_flag():
    for x in ([1.0, 2.0], [5.0] * 50):
        sal, score = _sr_kernel(np.asarray(x), 3, 21, 5, 5)
        assert (score <= 3.0).all()


def test_distributed_matches_kernel_and_masks_nans(spark):
    rng = np.random.default_rng(3)
    rows = []
    for d in range(6):
        n = 80 + 13 * d
        x = np.sin(np.arange(n) * 0.25) * (d + 1)
        x += rng.normal(0, 0.1, n)
        x[n // 2] += 5.0
        for i, v in enumerate(x):
            val = None if (d == 2 and i % 17 == 0) else float(v)
            rows.append((f"d{d}", "s", i, val))
    pts = spark.createDataFrame(
        rows, "doc_id string, source string, seq long, value double")
    out = spectral_residual(pts, tau=2.0).toPandas()
    assert not out["value"].isna().any()  # nulls dropped, never scored
    for d in range(6):
        sub = out[out["doc_id"] == f"d{d}"].sort_values("seq")
        xs = np.array([v for (dd, s, i, v) in rows
                       if dd == f"d{d}" and v is not None])
        sal, score = _sr_kernel(xs, 3, 21, 5, 5)
        np.testing.assert_allclose(sub["sr_score"].to_numpy(), score,
                                   rtol=1e-9, atol=1e-9)
    # each series' planted spike is its top-scoring point
    top = out.loc[out.groupby("doc_id")["sr_score"].idxmax()]
    for _, r in top.iterrows():
        d = int(r["doc_id"][1:])
        n = 80 + 13 * d
        assert abs(int(r["seq"]) - n // 2) <= 1


def test_anomaly_episodes_coalesce(spark):
    flagged = spark.createDataFrame(
        [("a", "s", i, 1.0, float(s), s > 2.0)
         for i, s in enumerate([0, 3, 4, 0, 3, 0, 0, 0, 5, 6])],
        "doc_id string, source string, seq long, value double, "
        "sr_score double, is_anomaly boolean")
    eps = anomaly_episodes(flagged, max_gap=2).orderBy("episode").toPandas()
    # flags at 1,2,4 merge; 8,9 separate (3 unflagged between 4 and 8 > 2)
    assert len(eps) == 2
    assert (eps.loc[0, "start_seq"], eps.loc[0, "end_seq"],
            eps.loc[0, "n_points"], eps.loc[0, "peak_score"]) == (1, 4, 3, 4.0)
    assert (eps.loc[1, "start_seq"], eps.loc[1, "end_seq"]) == (8, 9)
    # boundary: EXACTLY max_gap unflagged ordinals between flags merges,
    # one more splits (the documented contract)
    pair = spark.createDataFrame(
        [("b", "s", 0, 1.0, 9.0, True), ("b", "s", 3, 1.0, 9.0, True),
         ("c", "s", 0, 1.0, 9.0, True), ("c", "s", 4, 1.0, 9.0, True)],
        "doc_id string, source string, seq long, value double, "
        "sr_score double, is_anomaly boolean")
    got = anomaly_episodes(pair, max_gap=2).groupBy("doc_id").count().collect()
    n = {r["doc_id"]: r["count"] for r in got}
    assert n == {"b": 1, "c": 2}


def test_validation():
    with pytest.raises(ValueError, match="tau"):
        spectral_residual(None, tau=0.0)


# ---------------------------------------------------------------- period

def test_period_kernel_known_signals():
    from gensor_spark.operators.spectral import _period_kernel

    n = 240
    t = np.arange(n)
    # pure season + linear trend: detrending must expose period 24
    p, ratio, acf = _period_kernel(10 * np.sin(2 * np.pi * t / 24) + 0.05 * t,
                                   None, 0.2)
    assert p == 24.0 and ratio > 0.9 and acf > 0.8
    # two seasons: the dominant (larger-amplitude) one wins
    p2, _, _ = _period_kernel(
        np.sin(2 * np.pi * t / 12) + 3 * np.sin(2 * np.pi * t / 48), None, 0.2)
    assert p2 == 48.0
    # white noise: no confirmed period
    rng = np.random.default_rng(0)
    p3, _, _ = _period_kernel(rng.normal(0, 1, 200), None, 0.2)
    assert np.isnan(p3)
    # max_period excludes the long season, the short one remains; the
    # out-of-cap 48-component still sits in the series and dilutes the
    # lag-12 ACF to ~0.1 (amplitude² weighting, cos(π/2)=0 contribution),
    # so the confirmation gate must be relaxed to see it — and at the
    # default gate the same call correctly reports "no CONFIRMED season"
    p4, _, _ = _period_kernel(
        np.sin(2 * np.pi * t / 12) + 3 * np.sin(2 * np.pi * t / 48), 24, 0.05)
    assert p4 == 12.0
    p4g, _, acf4 = _period_kernel(
        np.sin(2 * np.pi * t / 12) + 3 * np.sin(2 * np.pi * t / 48), 24, 0.2)
    assert np.isnan(p4g) and 0.05 < acf4 < 0.2
    # too short
    p5, _, _ = _period_kernel(np.ones(5), None, 0.2)
    assert np.isnan(p5)


def test_period_kernel_matches_direct_dft_argmax():
    """Independent cross-check: the chosen bin equals the argmax of a
    direct O(n²) DFT periodogram of the hand-detrended series."""
    from gensor_spark.operators.spectral import _period_kernel

    rng = np.random.default_rng(7)
    n = 96
    t = np.arange(n)
    x = 4 * np.sin(2 * np.pi * t / 16) + rng.normal(0, 0.3, n)
    p, _, _ = _period_kernel(x, None, 0.2)
    # by-hand detrend + DFT matrix
    A = np.vstack([np.ones(n), t]).T
    beta, *_ = np.linalg.lstsq(A, x, rcond=None)
    r = x - A @ beta
    W = np.exp(-2j * np.pi * np.outer(t, t) / n)
    power = np.abs(W @ r) ** 2
    k = 1 + int(np.argmax(power[1:n // 2 + 1]))
    assert p == float(round(n / k)) == 16.0


def test_dominant_period_distributed(spark):
    rows = []
    for d, per in ((0, 12), (1, 30), (2, None)):
        n = 180
        t = np.arange(n)
        rng = np.random.default_rng(d)
        x = (np.sin(2 * np.pi * t / per) * 5 + rng.normal(0, 0.2, n)
             if per else rng.normal(0, 1.0, n))
        for i, v in enumerate(x):
            val = None if (d == 0 and i % 19 == 0) else float(v)
            rows.append((f"d{d}", "s", i, val))
    pts = spark.createDataFrame(
        rows, "doc_id string, source string, seq long, value double")
    from gensor_spark.operators.spectral import dominant_period

    out = {r["doc_id"]: r for _, r in
           dominant_period(pts).toPandas().iterrows()}
    # NaN-masked series: period survives the dropped ordinals (12-ish)
    assert out["d0"]["period"] in (11.0, 12.0, 13.0)
    assert out["d1"]["period"] == 30.0
    assert pd.isna(out["d2"]["period"]) and out["d2"]["n"] == 180
    with pytest.raises(ValueError, match="min_acf"):
        dominant_period(pts, min_acf=1.5)


def test_period_feeds_seasonal_verbs(spark):
    """The loop the diagnostic closes: detect the period, hand it to the
    decomposition, get a clean seasonal component."""
    from gensor_spark.operators.seriesstats import seasonal_decompose
    from gensor_spark.operators.spectral import dominant_period

    n = 144
    t = np.arange(n)
    x = 7 * np.sin(2 * np.pi * t / 24) + 3.0
    pts = spark.createDataFrame(
        [("a", "s", i, float(v), None) for i, v in enumerate(x)],
        "doc_id string, source string, seq long, value double, ts timestamp")
    per = dominant_period(pts).first()["period"]
    assert per == 24.0
    dec = seasonal_decompose(pts, period=int(per)).toPandas()
    mid = dec[(dec["seq"] > 24) & (dec["seq"] < n - 24)]
    np.testing.assert_allclose(mid["resid"].to_numpy(float), 0.0, atol=1e-9)


def test_period_max_cap_never_exceeds_half_series():
    """max_period larger than n/2 must TIGHTEN nothing (the n/2 cap rules):
    the k=1 whole-series bin is never a candidate, so a noise series stays
    NULL no matter the caller's cap."""
    from gensor_spark.operators.spectral import _period_kernel

    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, 200)
    p_default, _, _ = _period_kernel(x, None, 0.2)
    p_big_cap, _, _ = _period_kernel(x, 400, 0.2)
    assert np.isnan(p_default) and np.isnan(p_big_cap)
    # and a real season is still found under the oversized cap
    t = np.arange(240)
    p, _, _ = _period_kernel(10 * np.sin(2 * np.pi * t / 24), 10_000, 0.2)
    assert p == 24.0
