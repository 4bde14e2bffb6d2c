"""Kalman local-level smoother: independent linear-algebra oracle.

The sequential filter+RTS recursion is verified against a structurally
different computation of the same Gaussian posterior: with a flat prior on
the first observed state, the smoothed means/variances of the local-level
model are the mean and covariance diagonal of N(Λ⁻¹ b, Λ⁻¹) with
tridiagonal precision Λ = O/r + L/q (O = observation indicator, L = the
random-walk second-difference matrix) and b = O·y/r. Solving that system
with dense linear algebra shares no code path with the kernel — agreement
at 1e-9 pins both.
"""

from __future__ import annotations

import numpy as np
import pytest

from gensor_spark.operators.kalman import _kalman_kernel, _mle_ratio, kalman_smooth


def _posterior_oracle(y: np.ndarray, q: float, r: float):
    obs = np.flatnonzero(~np.isnan(y))
    first = obs[0]
    z = y[first:]
    m = len(z)
    O = (~np.isnan(z)).astype(float)
    lam = np.zeros((m, m))
    for i in range(m - 1):  # random-walk precision
        lam[i, i] += 1.0 / q
        lam[i + 1, i + 1] += 1.0 / q
        lam[i, i + 1] -= 1.0 / q
        lam[i + 1, i] -= 1.0 / q
    lam += np.diag(O / r)
    b = np.where(np.isnan(z), 0.0, z) / r * O
    cov = np.linalg.inv(lam)
    mean = cov @ b
    out_mean = np.full(len(y), np.nan)
    out_var = np.full(len(y), np.nan)
    out_mean[first:] = mean
    out_var[first:] = np.diag(cov)
    return out_mean, out_var


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("q,r", [(0.1, 1.0), (2.5, 0.3), (1e-3, 5.0)])
def test_kernel_matches_linear_algebra_posterior(q, r):
    y = np.cumsum(RNG.normal(0, 1, 60)) + RNG.normal(0, 1, 60)
    y[[0, 1, 17, 18, 19, 40]] = np.nan  # leading + internal gaps
    f, s, v, _ = _kalman_kernel(y, q, r)
    want_mean, want_var = _posterior_oracle(y, q, r)
    np.testing.assert_allclose(s, want_mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(v, want_var, rtol=1e-9, atol=1e-12)
    # the filter agrees with the smoother at the final state
    np.testing.assert_allclose(f[-1], s[-1], rtol=1e-12)


def test_kernel_edge_cases():
    f, s, v, ll = _kalman_kernel(np.array([np.nan, np.nan]), 0.1, 1.0)
    assert np.all(np.isnan(f)) and np.all(np.isnan(s)) and np.isnan(ll)
    # constant observed series → smoothed == constant
    y = np.full(20, 3.25)
    _, s, _, _ = _kalman_kernel(y, 0.5, 1.0)
    np.testing.assert_allclose(s, 3.25, rtol=1e-12)
    # single observation: state = that value, variance = r
    y = np.array([np.nan, 7.0, np.nan])
    f, s, v, _ = _kalman_kernel(y, 0.2, 0.7)
    assert np.isnan(s[0])
    np.testing.assert_allclose(s[1:], [7.0, 7.0])
    np.testing.assert_allclose(v[1], 0.7, rtol=1e-12)


def test_mle_ratio_recovers_regime():
    # smooth random walk with tiny observation noise → large q/r;
    # white noise around a constant → small q/r
    n = 400
    walk = np.cumsum(RNG.normal(0, 1.0, n)) + RNG.normal(0, 0.05, n)
    flat = 5.0 + RNG.normal(0, 1.0, n)
    assert _mle_ratio(walk) > 10.0
    assert _mle_ratio(flat) < 0.1


def test_spark_operator_matches_kernel(spark):
    import pandas as pd

    rows = []
    series = {}
    for sid in ("a", "b"):
        y = np.cumsum(RNG.normal(0, 1, 50)) + RNG.normal(0, 0.5, 50)
        y[5:9] = np.nan
        series[sid] = y
        rows += [(sid, "s", i, float(v) if not np.isnan(v) else None)
                 for i, v in enumerate(y)]
    pts = spark.createDataFrame(
        rows, "doc_id string, source string, seq long, value double")
    out = kalman_smooth(pts, q=0.4, r=1.0).toPandas()
    for sid, y in series.items():
        got = out[out.doc_id == sid].sort_values("seq")
        f, s, v, _ = _kalman_kernel(y, 0.4, 1.0)
        np.testing.assert_allclose(got["k_smooth"].to_numpy(), s,
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(got["k_filt"].to_numpy(), f,
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(got["k_var"].to_numpy(), v,
                                   rtol=1e-12, atol=1e-12)
    # pandas NaN round-trip: gap rows got smoothed estimates
    a = out[(out.doc_id == "a") & out.value.isna()]
    assert len(a) == 4 and a["k_smooth"].notna().all()


def test_arg_validation(spark):
    import pandas as pd  # noqa: F401

    pts = spark.createDataFrame(
        [("a", "s", 0, 1.0)],
        "doc_id string, source string, seq long, value double")
    with pytest.raises(ValueError):
        kalman_smooth(pts, q=0.0)
    with pytest.raises(ValueError):
        kalman_smooth(pts.withColumnRenamed("value", "k_filt"))
