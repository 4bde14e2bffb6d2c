"""Generalized ESD / Seasonal-Hybrid-ESD (operators/esd.py): the t-quantile
pinned against published t-tables, Rosner's critical-value table for the
canonical n=54 case, masking robustness, planted-anomaly exactness, and
distributed == kernel parity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from gensor_spark.operators.esd import (
    _gesd_kernel,
    gesd_outliers,
    seasonal_esd,
    t_ppf,
)

# --------------------------------------------------------------------------
# Student-t quantile vs published tables
# --------------------------------------------------------------------------

T_TABLE_975 = {1: 12.7062, 2: 4.30265, 3: 3.18245, 4: 2.77645,
               5: 2.57058, 10: 2.22814, 30: 2.04227, 100: 1.98397}


def test_t_ppf_matches_published_tables():
    for df, want in T_TABLE_975.items():
        assert math.isclose(t_ppf(0.975, df), want, abs_tol=1e-4), df
    assert math.isclose(t_ppf(0.995, 1), 63.6567, abs_tol=1e-3)
    assert math.isclose(t_ppf(0.95, 10), 1.81246, abs_tol=1e-4)
    # symmetry + median
    assert t_ppf(0.5, 7) == 0.0
    assert math.isclose(t_ppf(0.025, 5), -t_ppf(0.975, 5), rel_tol=1e-9)


def test_rosner_critical_values_n54():
    # Rosner (1983) / NIST e-handbook canonical example: n=54, alpha=0.05
    # publishes lambda_1..3 = 3.158, 3.151, 3.144
    n, alpha = 54, 0.05
    lams = []
    for i in (1, 2, 3):
        ni = n - i + 1
        t = t_ppf(1 - alpha / (2 * ni), ni - 2)
        lams.append((ni - 1) * t / math.sqrt((ni - 2 + t * t) * ni))
    np.testing.assert_allclose(lams, [3.158, 3.151, 3.144], atol=2e-3)


# --------------------------------------------------------------------------
# kernel behavior
# --------------------------------------------------------------------------

def test_planted_outliers_found_exactly():
    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, 60)
    x[[7, 23, 41]] = [9.0, -8.5, 8.8]
    hits = _gesd_kernel(x, max_k=10, alpha=0.05, hybrid=False)
    assert sorted(h[0] for h in hits) == [7, 23, 41]
    ranks = {h[0]: h[1] for h in hits}
    assert ranks[7] == 1  # largest deviation removed first
    for _, _, r, lam in hits:
        assert r > lam


def test_masking_robustness_vs_single_pass_zscore():
    # a cluster of 6 identical extremes inflates the full-sample SD enough
    # that a single-pass 3-sigma rule misses every one; GESD removes them
    # one by one and declares all 6
    rng = np.random.default_rng(21)
    x = np.concatenate([rng.normal(0, 1, 40), np.full(6, 5.5)])
    z = np.abs(x - x.mean()) / x.std(ddof=1)
    assert (z[40:] > 3.0).sum() == 0  # masked from the naive rule
    hits = _gesd_kernel(x, max_k=10, alpha=0.05, hybrid=False)
    assert sorted(h[0] for h in hits) == list(range(40, 46))


def test_clean_data_no_false_positives():
    rng = np.random.default_rng(3)
    x = rng.normal(10, 2, 80)
    assert _gesd_kernel(x, max_k=8, alpha=0.01, hybrid=False) == []


def test_nan_values_skipped_and_positions_original():
    x = np.array([1.0, np.nan, 1.2, 0.9, 50.0, 1.1, np.nan, 1.0, 0.8, 1.3,
                  1.05, 0.95])
    hits = _gesd_kernel(x, max_k=3, alpha=0.05, hybrid=False)
    assert [h[0] for h in hits] == [4]


def test_flat_series_no_outliers():
    assert _gesd_kernel(np.full(20, 3.3), 5, 0.05, False) == []
    assert _gesd_kernel(np.full(20, 3.3), 5, 0.05, True) == []


def test_numerically_flat_series_no_outliers():
    # spread at float-cancellation magnitude (a degenerate seasonal
    # residual): dev and scale shrink together so R stays O(1) — the
    # relative scale floor must refuse to rank rounding noise
    rng = np.random.default_rng(8)
    x = -6.415417 + rng.normal(0, 1e-14, 15)
    assert _gesd_kernel(x, 5, 0.05, True) == []
    assert _gesd_kernel(x, 5, 0.05, False) == []


def test_hybrid_uses_median_mad():
    # one extreme plus a skewed tail: the mean/SD test's first removal can
    # differ from median/MAD; at minimum both flag the planted spike
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.normal(0, 1, 50), [30.0]])
    for hybrid in (False, True):
        hits = _gesd_kernel(x, 5, 0.05, hybrid)
        assert 50 in [h[0] for h in hits]


# --------------------------------------------------------------------------
# distributed operator
# --------------------------------------------------------------------------

def _mk_points(spark, series: dict[str, np.ndarray]):
    frames = [
        pd.DataFrame({"doc_id": k, "source": "s",
                      "seq": np.arange(len(v)), "value": v})
        for k, v in series.items()
    ]
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def test_distributed_matches_kernel(spark):
    rng = np.random.default_rng(17)
    series = {}
    for d in range(6):
        x = rng.normal(0, 1, 50 + d * 7)
        x[5 + d] = 12.0 + d
        if d % 2:
            x[20] = -11.0
        series[f"d{d}"] = x
    got = (
        gesd_outliers(_mk_points(spark, series), max_anomalies=5, alpha=0.05)
        .toPandas().sort_values(["doc_id", "seq"]).reset_index(drop=True)
    )
    exp_rows = []
    for k in sorted(series):
        for j, rank, r, lam in _gesd_kernel(series[k], 5, 0.05, False):
            exp_rows.append((k, j, rank, r, lam))
    exp = pd.DataFrame(
        exp_rows, columns=["doc_id", "seq", "out_rank", "r_stat",
                           "lambda_crit"]
    ).sort_values(["doc_id", "seq"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got["doc_id"], exp["doc_id"])
    np.testing.assert_array_equal(got["seq"], exp["seq"])
    np.testing.assert_array_equal(got["out_rank"], exp["out_rank"])
    np.testing.assert_allclose(got["r_stat"], exp["r_stat"], rtol=1e-12)
    np.testing.assert_allclose(got["lambda_crit"], exp["lambda_crit"],
                               rtol=1e-12)


def test_seasonal_esd_finds_in_pattern_anomaly(spark):
    # strong seasonality (amplitude 10) + two small spikes (+4) that stay
    # INSIDE the raw range: a global test cannot see them, the residual can
    rng = np.random.default_rng(33)
    period, n = 12, 144
    t = np.arange(n)
    x = 10.0 * np.sin(2 * np.pi * t / period) + rng.normal(0, 0.4, n)
    x[50] += 4.0
    x[100] -= 4.0
    pts = _mk_points(spark, {"s1": x})
    raw = gesd_outliers(pts, max_anomalies=5, alpha=0.05).toPandas()
    assert not {50, 100} <= set(raw["seq"])  # invisible globally
    got = seasonal_esd(pts, period=period, max_anomalies=5,
                       alpha=0.05).toPandas()
    assert {50, 100} == set(got["seq"])
    # original value carried alongside the residual grain
    assert set(got.columns) >= {"value", "resid", "out_rank"}


def test_no_outlier_series_contributes_no_rows(spark):
    rng = np.random.default_rng(2)
    pts = _mk_points(spark, {"clean": rng.normal(5, 1, 60)})
    assert gesd_outliers(pts, max_anomalies=5, alpha=0.01).count() == 0
