"""PAA + LB_Keogh + banded DTW (operators/dtw.py): loop-reference parity,
lower-bound losslessness, phase-shift discrimination, guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.dtw import _dtw_kernel, dtw_pairs, paa_sketch

SF = "/root/testdata/sf0.001"


def _dtw_loop(a, b, band):
    """Independent O(n²) DP reference (dict-based, no numpy)."""
    n = len(a)
    inf = float("inf")
    cost = {(0, 0): 0.0}
    for i in range(1, n + 1):
        for j in range(max(1, i - band), min(n, i + band) + 1):
            d = (a[i - 1] - b[j - 1]) ** 2
            best = min(
                cost.get((i - 1, j), inf),
                cost.get((i, j - 1), inf),
                cost.get((i - 1, j - 1), inf),
            )
            cost[(i, j)] = d + best
    return cost[(n, n)] ** 0.5


def _series_df(spark, series: dict[str, np.ndarray]):
    rows = []
    for sid, vals in series.items():
        rows += [(sid, "s", i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")


# ------------------------------------------------------------------ kernel

def test_dtw_kernel_matches_loop_reference():
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(4, 40))
        band = int(rng.integers(1, n + 3))
        a, b = rng.normal(0, 1, n), rng.normal(0, 1, n)
        np.testing.assert_allclose(
            _dtw_kernel(a, b, band), _dtw_loop(a.tolist(), b.tolist(), band),
            rtol=1e-12)


def test_dtw_kernel_identity_and_symmetry():
    rng = np.random.default_rng(9)
    a, b = rng.normal(0, 1, 32), rng.normal(0, 1, 32)
    assert _dtw_kernel(a, a, 4) == 0.0
    np.testing.assert_allclose(_dtw_kernel(a, b, 4), _dtw_kernel(b, a, 4), rtol=1e-12)
    # wide band == unconstrained: distance can only shrink as band grows
    assert _dtw_kernel(a, b, 40) <= _dtw_kernel(a, b, 4) + 1e-12


# ------------------------------------------------------------------ PAA

def test_paa_sketch_values(spark):
    # 8 points -> 4 bins of 2: means are pairwise averages
    vals = np.array([1, 3, 5, 7, 2, 4, 6, 8], dtype=float)
    df = _series_df(spark, {"a": vals})
    row = paa_sketch(df, length=4, normalize=False, min_points=4).collect()[0]
    np.testing.assert_allclose(row.sketch, [2.0, 6.0, 3.0, 7.0])
    assert row.n_points == 8
    # z-normalized variant has mean 0 / sd 1 (ddof=0)
    rown = paa_sketch(df, length=4, min_points=4).collect()[0]
    s = np.array(rown.sketch)
    np.testing.assert_allclose(s.mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(s.std(), 1.0, rtol=1e-12)


def test_paa_drops_short_series_and_masks_constant(spark):
    df = _series_df(spark, {"short": np.arange(3, dtype=float),
                            "flat": np.full(16, 7.0)})
    out = {r.sid: r for r in paa_sketch(df, length=8).collect()}
    assert "short|s" not in out  # < min_points
    np.testing.assert_allclose(out["flat|s"].sketch, np.zeros(8))  # sd=0 -> zeros


# ------------------------------------------------------------- lower bound

def test_lb_keogh_never_exceeds_dtw(spark):
    """Pruning losslessness: min(lb_ab, lb_ba) <= dtw for every pair —
    checked by running dtw_pairs with eps=inf and comparing columns."""
    rng = np.random.default_rng(17)
    series = {f"s{i:02d}": rng.normal(0, 1, 64).cumsum() for i in range(12)}
    df = _series_df(spark, series)
    got = dtw_pairs(df, eps=1e18, length=32, band=4).toPandas()
    assert len(got) == 12 * 11 // 2  # eps=inf keeps every pair
    assert (got["lb"] <= got["dtw"] + 1e-9).all()


def test_dtw_pairs_finds_phase_shifted_twin(spark):
    """A sine and its quarter-period-shifted copy: DTW (with band) sees
    near-identity; an unrelated ramp stays far — and correlation on the
    aligned clock would have scored the twins poorly."""
    t = np.arange(128, dtype=float)
    base = np.sin(2 * np.pi * t / 32)
    series = {
        "sin": base,
        "shifted": np.sin(2 * np.pi * (t - 4) / 32),
        "ramp": t,
    }
    df = _series_df(spark, series)
    out = dtw_pairs(df, eps=1e18, length=64, band=8).toPandas()
    d = {tuple(sorted((r.sid_a, r.sid_b))): r.dtw for r in out.itertuples()}
    twin = d[("shifted|s", "sin|s")]
    # interior warp path is exact (a 4-point shift is exactly 2 sketch
    # bins); the residual is the endpoint-anchored head/tail only
    assert twin < 2.0
    assert d[("ramp|s", "sin|s")] > 5 * twin
    assert d[("ramp|s", "shifted|s")] > 5 * twin
    # aligned-clock check: the shifted twin's pointwise euclidean gap is big
    eu = float(np.sqrt(((base - series["shifted"]) ** 2).sum()))
    assert eu > 5  # DTW's warping is what closes the gap, not the data


def test_dtw_pairs_eps_prunes_and_is_exact(spark):
    """Threshold semantics: the eps-filtered result equals the eps=inf
    result filtered post-hoc — i.e. LB pruning dropped nothing."""
    rng = np.random.default_rng(31)
    series = {f"s{i}": rng.normal(0, 1, 48).cumsum() for i in range(10)}
    df = _series_df(spark, series)
    full = dtw_pairs(df, eps=1e18, length=24, band=3).toPandas()
    eps = float(np.quantile(full["dtw"], 0.3))
    pruned = dtw_pairs(df, eps=eps, length=24, band=3).toPandas()
    want = full[full["dtw"] <= eps]
    assert len(pruned) == len(want) > 0
    a = pruned.sort_values(["sid_a", "sid_b"]).reset_index(drop=True)
    b = want.sort_values(["sid_a", "sid_b"]).reset_index(drop=True)
    np.testing.assert_allclose(a["dtw"].to_numpy(), b["dtw"].to_numpy(), rtol=1e-12)


def test_dtw_pairs_guards(spark):
    df = _series_df(spark, {f"s{i}": np.arange(40, dtype=float) for i in range(5)})
    with pytest.raises(ValueError, match="max_series"):
        dtw_pairs(df, eps=1.0, length=8, max_series=3)
    with pytest.raises(ValueError, match="eps"):
        dtw_pairs(df, eps=-1.0)
    with pytest.raises(ValueError, match="band"):
        dtw_pairs(df, eps=1.0, band=0)
    with pytest.raises(ValueError, match="length"):
        paa_sketch(df, length=1)


def test_dtw_registry_smoke(spark):
    from gensor_spark.queries import QUERIES

    out = QUERIES["dtw_pairs"](spark, SF)
    assert out.columns == ["sid_a", "sid_b", "lbd", "d"]
    assert out.count() > 0
