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
    # 1e-10 is sklearn's exact regularizer in _local_reachability_density —
    # keeps all-duplicate neighborhoods (reach 0) at lrd 1e10 as sklearn does
    lrd = 1.0 / (reach.mean(axis=1) + 1e-10)
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


# ---------------------------------------------------------------------------
# Isolation forest (grouped Arrow UDF; wheel-free numpy kernel)
# ---------------------------------------------------------------------------

def _avg_path_length(m) -> np.ndarray:
    """c(m): average BST unsuccessful-search depth (Liu et al. 2008, eq. 1).

    Same piecewise definition sklearn uses (c(≤1)=0, c(2)=1) so the anomaly
    scores live on the same scale and the 0.5 'auto' threshold transfers.
    """
    m = np.asarray(m, dtype=float)
    out = np.zeros_like(m)
    out[m == 2] = 1.0
    big = m > 2
    mb = m[big]
    euler = 0.5772156649015329
    out[big] = 2.0 * (np.log(mb - 1.0) + euler) - 2.0 * (mb - 1.0) / mb
    return out


def _iforest_scores(x: np.ndarray, n_trees: int = 100, psi: int = 256,
                    seed: int = 0) -> np.ndarray:
    """Anomaly scores s(x) = 2^(-E[h(x)]/c(psi)) for 1-D data.

    Standard isolation forest (Liu, Ting & Zhou 2008): each tree trains on a
    ``psi``-point subsample without replacement, splits at a uniform random
    value between the node's min and max, and stops at the depth limit
    ceil(log2(psi)) — path lengths below the limit are completed with the
    average-BST term c(|node|).

    1-D specialization: an isolation tree over scalars is exactly an
    interval partition of the real line — its leaves, in value order, are
    the gaps between the sorted split values. So tree *construction* walks
    index ranges of the sorted subsample (O(1) per node: one bisect, no
    array copies), and *scoring* is a single vectorized ``searchsorted`` of
    all points into the tree's split boundaries — per-node query
    partitioning (the naive recursion) is eliminated, ~50× less per-node
    overhead. Deterministic: fixed seed, ``random.Random`` sampling.

    gensor analogue: ``detect_outliers('isolation_forest')``
    (``/root/reference/gensor/analysis/outliers.py:162-191``) which wraps
    sklearn; sklearn is not in this image, so this kernel makes the operator
    actually runnable — scores follow the same construction and scale, but
    tree randomness differs from sklearn's, so parity is behavioral (the
    same spikes flag), not bitwise.
    """
    import bisect
    import random

    n = x.size
    rng = random.Random(seed)
    psi = min(psi, n)
    depth_limit = int(np.ceil(np.log2(max(psi, 2))))
    path = np.zeros(n)
    xs = x.tolist()
    uniform, bis = rng.uniform, bisect.bisect_left

    for _ in range(n_trees):
        s = sorted(rng.sample(xs, psi)) if psi < n else sorted(xs)
        splits: list[float] = []  # in-order == ascending: leaf boundaries
        leaf_path: list[float] = []  # depth + c(size) per leaf, value order

        def grow(i: int, j: int, depth: int) -> None:
            lo, hi = s[i], s[j - 1]
            if depth >= depth_limit or j - i <= 1 or lo == hi:
                leaf_path.append(depth + _AVG_PL[j - i] if j - i < _AVG_PL.size
                                 else depth + float(_avg_path_length(j - i)))
                return
            split = uniform(lo, hi)
            # first index with s[m] >= split; clamp so both children are
            # non-empty even if uniform() lands exactly on lo
            m = min(max(bis(s, split, i, j), i + 1), j - 1)
            grow(i, m, depth + 1)
            splits.append(split)
            grow(m, j, depth + 1)

        grow(0, psi, 0)
        # leaf of value v: how many boundaries are <= v (ties go right,
        # matching the `sample < split` left-branch rule)
        idx = np.searchsorted(np.asarray(splits), x, side="right")
        path += np.asarray(leaf_path)[idx]

    expected = path / n_trees
    return np.power(2.0, -expected / _avg_path_length(psi))


#: c(m) lookup for leaf sizes (leaves are ≤ psi ≤ 256 + slack)
_AVG_PL = _avg_path_length(np.arange(4096))


def isolation_forest(points: DataFrame, n_trees: int = 100, psi: int = 256,
                     contamination: float | str = "auto", seed: int = 0,
                     keys=KEYS) -> DataFrame:
    """Isolation-forest outlier mask per series (gensor outliers.py:162-191).

    contamination='auto' flags scores > 0.5 (the iForest paper's "clearly
    anomalous" line, the same decision boundary sklearn's 'auto' offset
    implements); a float c flags the top 100·c % of scores. NaNs are never
    flagged (they carry no value to isolate). Batched per-series kernel
    (udfkernel.py) — one Arrow crossing per ~10k rows, see hampel().
    """
    from gensor_spark.operators.udfkernel import per_series_map

    schema = T.StructType(points.schema.fields + [T.StructField("is_outlier", T.BooleanType())])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.reset_index(drop=True)
        x = out["value"].to_numpy(dtype=float)
        ok = ~np.isnan(x)
        flags = np.zeros(len(x), dtype=bool)
        if ok.sum() > 1:
            scores = _iforest_scores(x[ok], n_trees=n_trees, psi=psi, seed=seed)
            if contamination == "auto":
                flags[ok] = scores > 0.5
            else:
                cut = np.percentile(scores, 100.0 * (1.0 - contamination))
                flags[ok] = scores >= cut
        out["is_outlier"] = flags
        return out

    return per_series_map(points, per_series, schema, keys=keys)
