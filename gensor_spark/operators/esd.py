"""Generalized ESD (Rosner 1983) and Seasonal-Hybrid-ESD anomaly detection.

The generalized extreme Studentized deviate test is the statistically
principled answer to "how many outliers does this series have" — unlike a
z-score cut (gensor's ``detect_outliers('zscore')``,
``operators/outliers.py``) it is immune to *masking*: a cluster of
outliers inflates the sample standard deviation enough to hide each
member from a single-pass rule, while GESD re-estimates the spread after
each removal and compares every step against its own critical value, so
the cluster falls one by one. Seasonal-Hybrid-ESD (Hochenbaum, Vallis &
Kejariwal 2017 — Twitter's production anomaly detector) runs the same
test on the *seasonal-decomposition residual* with median/MAD in place of
mean/SD, catching anomalies that sit inside the raw value range but
outside the local seasonal pattern.

Statistics (Rosner's exact formulation):

- step ``i`` (1-based) removes the point with the largest
  ``|x - center| / scale`` over the surviving sample and records
  ``R_i = max |x - center| / scale``;
- the critical value is ``lambda_i = (n_i - 1) * t / sqrt((n_i - 2 + t^2)
  * n_i)`` with ``n_i = n - i + 1`` survivors before the removal and
  ``t = t_ppf(1 - alpha / (2 n_i), n_i - 2)``;
- the declared outlier count is the LARGEST ``i`` with ``R_i > lambda_i``
  (not the first failure — that is the masking defense).

``hybrid=True`` substitutes median / (1.4826·MAD) for mean / SD in
``R_i`` (the S-H-ESD robustification; the lambda table is unchanged,
exactly as published).

The Student-t quantile is computed wheel-free (no scipy in this
container): regularized incomplete beta via the Lentz continued fraction
+ bisection inversion, pinned against standard t-table values at 1e-6 in
tests/test_esd.py.

Spark-first shape: ONE ``applyInPandas`` crossing partitioned by series —
GESD is sequential *within* a series (each step depends on the last
removal) and embarrassingly parallel *across* series, so the per-series
Arrow kernel is the honest distribution unit; ``max_anomalies`` bounds
per-series work. ``seasonal_esd`` composes the pure-window
``seriesstats.seasonal_decompose`` with the kernel — decomposition stays
JVM-side, only the O(k·n) test itself crosses into Python.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEYS = ("doc_id", "source")

__all__ = ["gesd_outliers", "seasonal_esd", "t_ppf"]


# --------------------------------------------------------------------------
# Student-t quantile, wheel-free
# --------------------------------------------------------------------------

def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    FPMIN = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-15:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def _t_cdf(t: float, df: float) -> float:
    if t == 0.0:
        return 0.5
    p = 0.5 * _betainc(df / 2.0, 0.5, df / (df + t * t))
    return 1.0 - p if t > 0 else p


def t_ppf(q: float, df: float) -> float:
    """Student-t quantile by bisection on the exact CDF (|err| < 1e-10 in
    probability; pinned vs published t-tables in tests)."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0,1), got {q}")
    if df <= 0:
        raise ValueError(f"df must be > 0, got {df}")
    if q == 0.5:
        return 0.0
    lo, hi = -1.0, 1.0
    while _t_cdf(lo, df) > q:
        lo *= 2.0
        if lo < -1e12:
            break
    while _t_cdf(hi, df) < q:
        hi *= 2.0
        if hi > 1e12:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if _t_cdf(mid, df) < q:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-12 * max(1.0, abs(lo)):
            break
    return 0.5 * (lo + hi)


# --------------------------------------------------------------------------
# GESD kernel
# --------------------------------------------------------------------------

def _gesd_kernel(
    v: np.ndarray, max_k: int, alpha: float, hybrid: bool,
    max_frac: float = 0.49,
) -> list[tuple[int, int, float, float]]:
    """Rosner's test over the finite values of one series.

    Returns the declared outliers as ``(index_into_v, rank, r_stat,
    lambda_crit)`` — ``rank`` is the removal order (1-based).
    ``max_frac`` additionally caps the candidate count at a fraction of
    the sample (Twitter's S-H-ESD ``max_anoms`` convention, default 49% —
    the statistical hard bound: a 'majority of outliers' is a new
    baseline, not outliers; on SHORT series this is what stops the
    median/MAD scale from collapsing as extremes are peeled off)."""
    finite = np.isfinite(v)
    pos = np.nonzero(finite)[0]
    x = v[finite].astype(np.float64)
    n = len(x)
    k = min(int(max_k), int(max_frac * n), n - 2)
    if k < 1:
        return []
    alive = np.ones(n, dtype=bool)
    steps: list[tuple[int, float, float]] = []
    for i in range(1, k + 1):
        cur = x[alive]
        if hybrid:
            center = float(np.median(cur))
            scale = 1.4826 * float(np.median(np.abs(cur - center)))
        else:
            center = float(cur.mean())
            scale = float(cur.std(ddof=1))
        # relative scale floor: survivors that are NUMERICALLY constant
        # (spread at float-cancellation magnitude, e.g. a degenerate
        # seasonal residual) must read as flat — otherwise the test ranks
        # pure rounding noise as outliers (dev and scale shrink together,
        # so R stays O(1) while the data carries no signal)
        floor = 1e-10 * max(abs(center), float(np.abs(cur).max()), 1e-300)
        if not (scale > floor):
            break  # flat survivors: no scale, no further outliers
        dev = np.abs(x - center)
        dev[~alive] = -1.0
        j = int(np.argmax(dev))  # ties → smallest surviving index
        r = dev[j] / scale
        ni = n - i + 1
        t = t_ppf(1.0 - alpha / (2.0 * ni), ni - 2)
        lam = (ni - 1) * t / math.sqrt((ni - 2 + t * t) * ni)
        steps.append((j, r, lam))
        alive[j] = False
    n_out = 0
    for i, (_, r, lam) in enumerate(steps, start=1):
        if r > lam:
            n_out = i
    return [
        (int(pos[j]), rank, r, lam)
        for rank, (j, r, lam) in enumerate(steps[:n_out], start=1)
    ]


def gesd_outliers(
    points: DataFrame,
    max_anomalies: int = 10,
    alpha: float = 0.05,
    keys: Iterable[str] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    hybrid: bool = False,
    extra_cols: Iterable[str] = (),
    max_frac: float = 0.49,
) -> DataFrame:
    """Per-series generalized ESD test. Output grain: ONE ROW PER DECLARED
    OUTLIER — ``keys..., order_col, extra_cols..., <value_col>, out_rank``
    (removal order), ``r_stat``, ``lambda_crit``. Series where nothing
    exceeds its critical value contribute no rows. NaN/NULL values are
    skipped (mask-don't-crash), never flagged."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if max_anomalies < 1:
        raise ValueError(f"max_anomalies must be >= 1, got {max_anomalies}")
    keys = list(keys)
    extra_cols = list(extra_cols)
    carried = [*keys, order_col, *extra_cols, value_col]
    by_name = {f.name: f for f in points.schema.fields}
    schema = T.StructType(
        [T.StructField(c, by_name[c].dataType) for c in carried]
        + [
            T.StructField("out_rank", T.IntegerType()),
            T.StructField("r_stat", T.DoubleType()),
            T.StructField("lambda_crit", T.DoubleType()),
        ]
    )

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        hits = _gesd_kernel(v, max_anomalies, alpha, hybrid, max_frac)
        if not hits:
            return pd.DataFrame(columns=[*carried, "out_rank", "r_stat",
                                         "lambda_crit"])
        rows = pdf.iloc[[h[0] for h in hits]][carried].reset_index(drop=True)
        rows["out_rank"] = [h[1] for h in hits]
        rows["r_stat"] = [h[2] for h in hits]
        rows["lambda_crit"] = [h[3] for h in hits]
        return rows

    return (
        points.select(*dict.fromkeys(carried))
        .groupBy(*keys).applyInPandas(per_series, schema)
    )


def seasonal_esd(
    points: DataFrame,
    period: int,
    max_anomalies: int = 10,
    alpha: float = 0.05,
    keys: Iterable[str] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    hybrid: bool = True,
    max_frac: float = 0.2,
) -> DataFrame:
    """Seasonal(-Hybrid)-ESD: GESD over the classic-decomposition residual
    (``seriesstats.seasonal_decompose`` — pure window algebra, JVM-side),
    median/MAD robustified by default. Flags anomalies that sit INSIDE the
    raw value range but outside the local seasonal pattern — the case
    every global test misses. Output: the ``gesd_outliers`` grain on the
    residual, carrying the original ``value`` alongside ``resid``."""
    from gensor_spark.operators.seriesstats import seasonal_decompose

    dec = seasonal_decompose(
        points, period, keys=tuple(keys), value_col=value_col,
        order_col=order_col,
    )
    return gesd_outliers(
        dec,
        max_anomalies=max_anomalies,
        alpha=alpha,
        keys=keys,
        value_col="resid",
        order_col=order_col,
        hybrid=hybrid,
        extra_cols=[value_col],
        max_frac=max_frac,
    )
