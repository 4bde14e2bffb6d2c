"""Spectral-residual saliency anomaly detection (SR).

The frequency-domain member of the outlier family (Ren et al., KDD 2019 —
"Time-Series Anomaly Detection Service at Microsoft"): treat anomaly
detection as visual saliency. The log-amplitude spectrum of a series is
smooth except where rare events inject broadband energy; subtracting its
local average (the *spectral residual*) and inverting the FFT yields a
saliency map that spikes exactly at temporally-local surprises while
suppressing the series' own periodic structure — the case where a global
z-test flags every seasonal peak and misses the one anomalous trough.
Complements the family: z/IQR (global), Hampel (local), GESD (count-exact),
S-H-ESD (seasonal, decomposition-based), matrix-profile discords (shape);
SR is the only one that works in the frequency domain and needs no period,
window length, or anomaly-count parameter.

Algorithm per series (values on the observation ordinal, NaNs dropped —
mask-don't-crash):

1. extend the series by ``extend_num`` copies of a slope-extrapolated next
   point (the paper's trick so the LAST points — the ones a monitor cares
   about — sit in the interior of the FFT window),
2. ``A·e^{iP} = FFT(x)``;  ``R = log A − mean_q(log A)``,
3. saliency ``S = |IFFT(e^{R + iP})|`` (drop the extension),
4. ``score = (S − mean_z(S)) / mean_z(S)`` (local-mean normalization),
   anomaly where ``score > tau``.

This is an independent implementation from the paper's description; the
reference engine has no frequency-domain detector at all (its surface stops
at the z/IQR pair, gensor core/analysis/outliers.py).

Shape at scale: one ``applyInPandas`` crossing on the existing series-key
Exchange (the same single-shuffle plan as every per-series kernel here);
FFT is O(n log n) row-local; output is one row per non-null point. Series
length per key is the usual bound (a series must fit one task — true for
every per-series kernel in this engine; milestone-partition longer ones
upstream).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

KEYS = ("doc_id", "source")


def _sr_kernel(
    x: np.ndarray,
    mag_window: int,
    score_window: int,
    extend_num: int,
    look_ahead: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Saliency map + normalized score for ONE gap-free series (numpy).

    Returns ``(saliency, score)`` aligned with ``x``. Series shorter than 4
    points return zeros (no spectrum to speak of; never flagged).
    """
    n = x.size
    if n < 4:
        z = np.zeros(n)
        return z, z
    la = min(look_ahead, n - 1)
    if extend_num > 0 and la >= 1:
        # slope-extrapolated next value: average of the slopes from each of
        # the last `la` points to the last point, applied one step ahead
        anchor = x[-1]
        back = x[-(la + 1):-1]
        steps = np.arange(la, 0, -1, dtype=np.float64)
        slope = np.mean((anchor - back) / steps)
        ext = np.full(extend_num, x[-(la + 1)] + slope * (la + 1))
        xe = np.concatenate([x, ext])
    else:
        xe = x
    spec = np.fft.fft(xe)
    amp = np.abs(spec)
    logamp = np.log(np.maximum(amp, 1e-12))
    q = max(1, min(mag_window, xe.size))
    avg_log = np.convolve(logamp, np.ones(q) / q, mode="same")
    resid = logamp - avg_log
    with np.errstate(invalid="ignore", divide="ignore"):
        phase = np.where(amp > 0, spec / amp, 0.0)
    sal = np.abs(np.fft.ifft(np.exp(resid) * phase))[:n]
    z = max(1, min(score_window, n))
    local = np.convolve(sal, np.ones(z) / z, mode="same")
    denom = np.maximum(local, 1e-12)
    score = (sal - local) / denom
    return sal, score


def spectral_residual(
    points: DataFrame,
    tau: float = 3.0,
    mag_window: int = 3,
    score_window: int = 21,
    extend_num: int = 5,
    look_ahead: int = 5,
    keys: Iterable[str] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
) -> DataFrame:
    """Per-point SR saliency scores + anomaly flags for every series.

    Output grain: one row per NON-NULL point — ``keys..., order_col,
    <value_col>, saliency, sr_score, is_anomaly`` (``sr_score > tau``).
    NULL values are dropped from the transform and the output (the same
    contract as the GESD kernels); filtering/episode grouping composes
    downstream.
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    keys = list(keys)
    fields = [T.StructField(f.name, f.dataType) for f in points.schema.fields
              if f.name in keys]
    schema = T.StructType(fields + [
        T.StructField(order_col, T.LongType()),
        T.StructField(value_col, T.DoubleType()),
        T.StructField("saliency", T.DoubleType()),
        T.StructField("sr_score", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        keep = np.isfinite(vals)
        pdf = pdf.iloc[keep]
        x = vals[keep]
        sal, score = _sr_kernel(x, mag_window, score_window,
                                extend_num, look_ahead)
        out = pd.DataFrame({
            order_col: pdf[order_col].to_numpy(dtype=np.int64),
            value_col: x,
            "saliency": sal,
            "sr_score": score,
            "is_anomaly": score > tau,
        })
        for k in keys:
            out[k] = pdf[k].iloc[0] if len(pdf) else None
        return out[[*keys, order_col, value_col,
                    "saliency", "sr_score", "is_anomaly"]]

    return (
        points.select(*keys, order_col, value_col)
        .groupBy(*keys).applyInPandas(per_series, schema)
    )


def anomaly_episodes(
    flagged: DataFrame,
    max_gap: int = 2,
    keys: Iterable[str] = KEYS,
    order_col: str = "seq",
    flag_col: str = "is_anomaly",
    score_col: str = "sr_score",
) -> DataFrame:
    """Coalesce per-point anomaly flags into alert EPISODES: consecutive
    flagged points (allowing ``max_gap`` unflagged ordinals between them)
    become one row per (series, episode) with bounds, size, and peak score
    — what a paging system wants instead of one alert per point. Works on
    any detector's output that has a boolean flag column (SR, Hampel,
    z/IQR, ...). Pure window algebra: the gap-sessionization plan
    (queries.gap_sessions) applied to the flagged subset — one Exchange on
    the series keys, no Python.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(order_col)
    f = flagged.filter(F.col(flag_col))
    # gap is the ordinal distance between consecutive FLAGGED points, so
    # the count of unflagged ordinals between them is gap - 1: allowing
    # max_gap of those means splitting only when gap > max_gap + 1
    gap = F.col(order_col) - F.lag(order_col).over(w)
    ep = (
        f.withColumn("_new", F.when(gap.isNull() | (gap > max_gap + 1), 1)
                     .otherwise(0))
        .withColumn("episode", F.sum("_new").over(
            w.rowsBetween(W.unboundedPreceding, 0)) - 1)
    )
    return ep.groupBy(*keys, "episode").agg(
        F.min(order_col).alias("start_" + order_col),
        F.max(order_col).alias("end_" + order_col),
        F.count("*").alias("n_points"),
        F.max(score_col).alias("peak_score"),
    )


def _period_kernel(
    x: np.ndarray,
    max_period: int | None,
    min_acf: float,
) -> tuple[float, float, float]:
    """Dominant period of ONE gap-free series (numpy).

    Periodogram of the linearly-detrended series (detrending keeps a trend
    ramp from burying the seasonal peak under low-frequency power), peak
    bin → candidate period, then an ACF confirmation at that lag — a pure
    spectral peak can be a harmonic artifact; a real season must also
    autocorrelate at its own lag. Returns ``(period, power_ratio,
    acf_at_period)`` with period NaN when no confirmed season exists
    (the R forecast::findfrequency contract).
    """
    n = x.size
    if n < 8:
        return np.nan, np.nan, np.nan
    t = np.arange(n, dtype=np.float64)
    # linear detrend (closed-form OLS)
    tm, xm = t.mean(), x.mean()
    dt = t - tm
    denom = float(dt @ dt)
    slope = float(dt @ (x - xm)) / denom if denom > 0 else 0.0
    r = x - (xm + slope * dt)
    if not r.any():
        return np.nan, np.nan, np.nan
    spec = np.fft.rfft(r)
    power = np.abs(spec) ** 2
    power[0] = 0.0  # DC carries no period
    # candidate periods are n/k; keep those in [2, max_period or n/2]
    ks = np.arange(1, power.size)
    per = n / ks
    # an explicit max_period TIGHTENS the n/2 fundamental cap, never
    # replaces it — k=1 (period == series length) is always excluded
    cap = n / 2 if max_period is None else min(max_period, n / 2)
    valid = (per >= 2) & (per <= cap)
    if not valid.any():
        return np.nan, np.nan, np.nan
    pw = power[1:]
    k_star = ks[valid][int(np.argmax(pw[valid]))]
    total = float(pw[valid].sum())
    ratio = float(power[k_star] / total) if total > 0 else 0.0
    p = int(round(n / k_star))
    p = max(2, min(p, n - 2))
    # ACF at the candidate lag (biased estimator, the pandas convention)
    v = float(r @ r)
    acf = float(r[:-p] @ r[p:]) / v if v > 0 else 0.0
    if acf < min_acf:
        return np.nan, ratio, acf
    return float(p), ratio, acf


def dominant_period(
    points: DataFrame,
    max_period: int | None = None,
    min_acf: float = 0.2,
    keys: Iterable[str] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
) -> DataFrame:
    """Per-series dominant-period detection: the diagnostic that feeds
    every ``period=``-taking verb here (``seasonal_decompose``,
    ``hw_smooth``/``hw_forecast``, ``seasonal_esd``, ``backtest``) instead
    of asking the caller to know the seasonality up front.

    Output: one row per series — ``period`` (double; NULL when no
    spectral peak survives the ACF confirmation, i.e. the series is
    aperiodic and the seasonal verbs should not be applied), ``power_ratio``
    (peak share of off-DC periodogram power), ``acf_at_period``, ``n``.
    NULLs in ``value_col`` are dropped (ordinal axis, same contract as the
    SR detector). One Arrow crossing on the series-key Exchange.
    """
    if not 0.0 <= min_acf < 1.0:
        raise ValueError(f"min_acf must be in [0, 1), got {min_acf}")
    keys = list(keys)
    fields = [T.StructField(f.name, f.dataType) for f in points.schema.fields
              if f.name in keys]
    schema = T.StructType(fields + [
        T.StructField("period", T.DoubleType()),
        T.StructField("power_ratio", T.DoubleType()),
        T.StructField("acf_at_period", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        x = vals[np.isfinite(vals)]
        p, ratio, acf = _period_kernel(x, max_period, min_acf)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["period"] = [None if np.isnan(p) else p]
        out["power_ratio"] = [None if np.isnan(ratio) else ratio]
        out["acf_at_period"] = [None if np.isnan(acf) else acf]
        out["n"] = [int(x.size)]
        return pd.DataFrame(out)

    return (
        points.select(*keys, order_col, value_col)
        .groupBy(*keys).applyInPandas(per_series, schema)
    )
