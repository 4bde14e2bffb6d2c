"""Outlier detection: global/rolling z-score & IQR, Hampel, LOF.

Reference: ``/root/reference/gensor/analysis/outliers.py`` + the dispatch in
``gensor/core/base.py:207-237``. gensor's contract is *mask, don't delete*:
detected rows move to a side-channel ``outliers`` series. Ours is a boolean
``is_outlier`` column; ``remove=True`` corresponds to ``filter(~is_outlier)``
with the flagged rows preserved by the caller (split_outliers).

Semantics replicated exactly (SURVEY.md §2.5):

- global z-score: ``|x - mean| / std > t`` with **population** std (ddof=0,
  ``outliers.py:104-125``), t default 3.0;
- global IQR: outside ``[q1 - k·iqr, q3 + k·iqr]``, exact quantiles with
  linear interpolation (``np.percentile``; ``outliers.py:77-101``), k=1.5;
- rolling variants flag the **last** point of each trailing window of size
  ``w`` (pandas ``rolling(w).apply`` shape, ``outliers.py:45-67``); windows
  that are incomplete or contain NaN yield "not outlier";
- Hampel: centered window, ``min_periods=1``, median/MAD, strict ``>``
  (``outliers.py:128-160``) — zero-spread windows flag nothing;
- LOF: per-series k-NN local outlier factor (sklearn semantics,
  ``outliers.py:193-219``) as a grouped Arrow UDF with a pure-numpy kernel
  (the sandbox has no sklearn; the kernel replicates
  ``LocalOutlierFactor(contamination=...).fit_predict`` on a 1-D column).

z-score/IQR run fully JVM-side (window frames, whole-stage codegen); Hampel
and LOF are grouped Arrow UDFs — one batch per series, vectorized numpy
inside, no per-row Python. At scale the grouped UDFs shuffle once on the
series key; series are bounded (one doc's points), so batches stay small.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEYS = ("doc_id", "source")


def _whole_series(keys=KEYS):
    return W.partitionBy(*keys).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)


def _trailing(w: int, keys=KEYS):
    return W.partitionBy(*keys).orderBy("seq").rowsBetween(-(w - 1), 0)


def zscore_global(points: DataFrame, threshold: float = 3.0, keys=KEYS) -> DataFrame:
    win = _whole_series(keys)
    z = F.abs(F.col("value") - F.avg("value").over(win)) / F.stddev_pop("value").over(win)
    return points.withColumn("is_outlier", F.coalesce(z > threshold, F.lit(False)))


def iqr_global(points: DataFrame, k: float = 1.5, keys=KEYS) -> DataFrame:
    win = _whole_series(keys)
    q1 = F.expr("percentile(value, 0.25)").over(win)
    q3 = F.expr("percentile(value, 0.75)").over(win)
    iqr = q3 - q1
    out = (F.col("value") < q1 - k * iqr) | (F.col("value") > q3 + k * iqr)
    return points.withColumn("is_outlier", F.coalesce(out, F.lit(False)))


def zscore_rolling(
    points: DataFrame, window: int, threshold: float = 3.0, keys=KEYS
) -> DataFrame:
    win = _trailing(window, keys)
    full = (F.count(F.lit(1)).over(win) == window) & (
        F.count("value").over(win) == window
    )
    z = F.abs(F.col("value") - F.avg("value").over(win)) / F.stddev_pop("value").over(win)
    return points.withColumn(
        "is_outlier", F.when(full, F.coalesce(z > threshold, F.lit(False))).otherwise(False)
    )


def iqr_rolling(points: DataFrame, window: int, k: float = 1.5, keys=KEYS) -> DataFrame:
    win = _trailing(window, keys)
    full = (F.count(F.lit(1)).over(win) == window) & (
        F.count("value").over(win) == window
    )
    q1 = F.expr("percentile(value, 0.25)").over(win)
    q3 = F.expr("percentile(value, 0.75)").over(win)
    iqr = q3 - q1
    out = (F.col("value") < q1 - k * iqr) | (F.col("value") > q3 + k * iqr)
    return points.withColumn(
        "is_outlier", F.when(full, F.coalesce(out, F.lit(False))).otherwise(False)
    )


def split_outliers(flagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """gensor remove=True: kept series + the removed-but-preserved outliers."""
    kept = flagged.filter(~F.col("is_outlier")).drop("is_outlier")
    outs = flagged.filter(F.col("is_outlier")).drop("is_outlier")
    return kept, outs


# ---------------------------------------------------------------------------
# Hampel (grouped Arrow UDF; pandas rolling inside for bit-exact parity)
# ---------------------------------------------------------------------------

_HAMPEL_K = 1.4826  # gensor outliers.py:11


def _hampel_mask(x: np.ndarray, window: int, n_sigma: float) -> np.ndarray:
    """Vectorized centered-window Hampel, exact pandas-rolling parity.

    pandas frame for ``rolling(window, center=True, min_periods=1)`` at row i
    is rows ``[i - window//2, i + (window-1)//2]`` (SURVEY.md §2.5). Edges are
    emulated by NaN-padding + sliding_window_view; pad NaNs are skipped
    everywhere, while *data* NaNs poison the MAD (the reference computes MAD
    with ``rolling.apply(np.median, raw=True)`` which does NOT skip NaN,
    outliers.py:152) but not the median (``rolling.median()`` skips NaN).
    """
    lead, trail = window // 2, (window - 1) // 2
    n = x.size
    pad = np.full(lead, np.nan), np.full(trail, np.nan)
    xp = np.concatenate([pad[0], x, pad[1]])
    wins = np.lib.stride_tricks.sliding_window_view(xp, window)  # (n, window)
    is_pad = np.concatenate(
        [np.ones(lead, bool), np.zeros(n, bool), np.ones(trail, bool)]
    )
    pad_wins = np.lib.stride_tricks.sliding_window_view(is_pad, window)

    with np.errstate(invalid="ignore"):
        med = np.nanmedian(wins, axis=1)
        mad = np.nanmedian(np.abs(wins - med[:, None]), axis=1)
    # windows containing an in-band data NaN → MAD NaN (reference parity)
    data_nan = np.any(np.isnan(wins) & ~pad_wins, axis=1)
    mad[data_nan] = np.nan

    dev = np.abs(x - med)
    thresh = n_sigma * _HAMPEL_K * mad
    with np.errstate(invalid="ignore"):
        return dev > thresh  # strict >: zero-spread flat windows flag nothing


def hampel(points: DataFrame, window: int = 5, n_sigma: float = 3.0, keys=KEYS) -> DataFrame:
    """Centered-window median/MAD filter (gensor outliers.py:128-160).

    Runs through the batched per-series kernel runner (udfkernel.py) — one
    Arrow crossing per ~10k rows instead of per series, which matters when
    series are short and numerous.
    """
    from gensor_spark.operators.udfkernel import per_series_map

    schema = T.StructType(points.schema.fields + [T.StructField("is_outlier", T.BooleanType())])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.reset_index(drop=True)
        out["is_outlier"] = _hampel_mask(
            out["value"].to_numpy(dtype=float), window, n_sigma
        )
        return out

    return per_series_map(points, per_series, schema, keys=keys)


# ---------------------------------------------------------------------------
# LOF (grouped Arrow UDF; numpy k-NN kernel, sklearn-parity on 1-D data)
# ---------------------------------------------------------------------------

def _lof_scores(x: np.ndarray, k: int) -> np.ndarray:
    """negative_outlier_factor_ for 1-D points, sklearn definitions.

    O(n²) broadcast distances — per-series n is bounded (one doc), and the
    whole thing runs vectorized inside one Arrow batch.
    """
    n = x.size
    k = min(k, n - 1)
    d = np.abs(x[:, None] - x[None, :])
    np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    kdist = np.take_along_axis(d, idx[:, -1:], axis=1)[:, 0]
    # reachability distance of i w.r.t. neighbor j: max(kdist[j], d(i,j))
    ndist = np.take_along_axis(d, idx, axis=1)
    reach = np.maximum(kdist[idx], ndist)
    lrd = 1.0 / (reach.mean(axis=1) + 1e-300)
    lof = (lrd[idx].mean(axis=1)) / lrd
    return -lof  # sklearn sign convention


def lof(
    points: DataFrame,
    n_neighbors: int = 20,
    contamination: float | str = "auto",
    keys=KEYS,
) -> DataFrame:
    """LOF outlier mask per series (gensor outliers.py:193-219).

    contamination='auto' flags scores < -1.5 (sklearn's offset_); a float c
    flags the lowest 100·c % of scores (sklearn's percentile rule).
    Batched per-series kernel (udfkernel.py) — see hampel().
    """
    from gensor_spark.operators.udfkernel import per_series_map

    schema = T.StructType(points.schema.fields + [T.StructField("is_outlier", T.BooleanType())])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.reset_index(drop=True)
        x = out["value"].to_numpy(dtype=float)
        ok = ~np.isnan(x)
        flags = np.zeros(len(x), dtype=bool)
        if ok.sum() > n_neighbors:
            scores = _lof_scores(x[ok], n_neighbors)
            if contamination == "auto":
                flags[ok] = scores < -1.5
            else:
                cut = np.percentile(scores, 100.0 * contamination)
                flags[ok] = scores <= cut
        out["is_outlier"] = flags
        return out

    return per_series_map(points, per_series, schema, keys=keys)


def isolation_forest(points: DataFrame, keys=KEYS, **kwargs) -> DataFrame:
    """sklearn IsolationForest per series (gensor outliers.py:162-191).

    sklearn is not in the sandbox image; gated behind an import-try per the
    environment rules. On a real cluster with sklearn shipped via --py-files
    this runs as the same grouped-Arrow-UDF pattern as lof().
    """
    try:
        from sklearn.ensemble import IsolationForest  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "isolation_forest requires scikit-learn on the executors"
        ) from e

    schema = T.StructType(points.schema.fields + [T.StructField("is_outlier", T.BooleanType())])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        from sklearn.ensemble import IsolationForest

        pdf = pdf.sort_values("seq").reset_index(drop=True)
        out = pdf.copy()
        x = pdf["value"].to_numpy(dtype=float).reshape(-1, 1)
        pred = IsolationForest(random_state=0, **kwargs).fit_predict(x)
        out["is_outlier"] = pred == -1
        return out

    return points.groupBy(*keys).applyInPandas(per_series, schema=schema)
