"""Matrix profile (STOMP): exact all-subsequence nearest-neighbor search.

The matrix profile (Yeh et al., ICDM 2016 "Matrix Profile I"; Zhu et al.,
ICDM 2016 "Matrix Profile II" — the STOMP O(n²) recursion implemented
here) is the modern workhorse for motif discovery (the two most similar
subsequences anywhere in a series) and discord/anomaly discovery (the
subsequence farthest from everything else). gensor has no analogue — its
anomaly verbs are distribution tests (z-score/IQR/Hampel/LOF,
``operators/outliers.py``) which are blind to *shape* anomalies; the SAX
index (``operators/sax.py``) finds motif *candidates* but is approximate.
This is the exact instrument both feed into.

Definition: for window length ``m``, position ``i`` of series ``x``,
``mp[i]`` is the z-normalized Euclidean distance between subsequence
``x[i:i+m]`` and its nearest neighbor ``x[j:j+m]`` over all ``j`` outside
the trivial-match exclusion zone ``|i-j| <= excl`` (default ``ceil(m/4)``,
the standard choice); ``mp_index[i]`` is that ``j``. Low ``mp`` = motif,
high ``mp`` = discord.

Spark-first shape: ONE ``applyInPandas`` crossing partitioned by series —
the O(n_i²) STOMP recursion runs vectorized per series, series are
embarrassingly parallel, and no shuffle beyond the per-series grouping
(which reuses the point view's natural key). For web-scale *long* series
the honest lever is ``max_points`` (profile the most recent tail — the
usual monitoring deployment) or chunked AB-joins; the per-series kernel is
the right unit either way because the matrix profile is defined within a
series, never across the corpus.

Determinism/parity: distances are exact float64 with the canonical
constant-subsequence convention (both flat → 0, one flat → sqrt(m)); ties
in the argmin are broken toward the SMALLEST neighbor index among
candidates within ``tie_eps`` of the minimum, so the kernel and the pure
SQL oracle (tests/test_matrixprofile.py replays the full definition in
DuckDB via a lag-product window formulation) agree bit-for-bit after
rounding.

NaN policy (mask, don't crash): any subsequence containing a non-finite
value is invalid — it gets a NULL profile row and is skipped as a
neighbor; series shorter than ``m + excl + 1`` yield NULL profiles (no
valid non-trivial neighbor exists).
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

__all__ = ["matrix_profile", "pattern_search", "top_discords", "top_motifs"]


def _mp_kernel(
    x: np.ndarray, m: int, excl: int, tie_eps: float
) -> tuple[np.ndarray, np.ndarray]:
    """STOMP over one series. Returns (mp, mp_index) of length n-m+1;
    invalid positions carry NaN / -1."""
    n = len(x)
    p = n - m + 1
    mp = np.full(max(p, 0), np.nan)
    mpi = np.full(max(p, 0), -1, dtype=np.int64)
    if p < 1:
        return mp, mpi

    finite = np.isfinite(x)
    xf = np.where(finite, x, 0.0)
    # window validity: all m members finite
    cnt = np.cumsum(np.concatenate([[0], finite.astype(np.int64)]))
    valid = (cnt[m:] - cnt[:-m]) == m

    # sliding mean / std (population) over the zero-filled series; only
    # consumed where valid, so the fill never leaks into a result
    c1 = np.cumsum(np.concatenate([[0.0], xf]))
    c2 = np.cumsum(np.concatenate([[0.0], xf * xf]))
    mu = (c1[m:] - c1[:-m]) / m
    var = np.maximum((c2[m:] - c2[:-m]) / m - mu * mu, 0.0)
    sig = np.sqrt(var)
    flat = sig <= 1e-13 * np.maximum(np.abs(mu), 1.0)

    if not valid.any() or p - 1 <= excl:
        return mp, mpi  # no position can have a non-trivial neighbor

    # QT_0[j] = <x[0:m], x[j:j+m]>; by symmetry QT_i[0] = QT_0[i]
    qt0 = np.correlate(xf, xf[:m], mode="valid")
    qt = qt0.copy()
    idx = np.arange(p)
    sqm = math.sqrt(m)
    for i in range(p):
        if i > 0:
            qt[1:] = qt[: p - 1] - xf[i - 1] * xf[: p - 1] \
                + xf[i + m - 1] * xf[m : m + p - 1]
            qt[0] = qt0[i]
        if not valid[i]:
            continue
        # z-normalized distance row; constant-subsequence convention
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (qt - m * mu[i] * mu) / (m * sig[i] * sig)
        d = np.sqrt(np.maximum(2.0 * m * (1.0 - corr), 0.0))
        if flat[i]:
            d = np.where(flat, 0.0, sqm)
        else:
            d[flat] = sqm
        d[~valid] = np.inf
        lo, hi = max(0, i - excl), min(p, i + excl + 1)
        d[lo:hi] = np.inf
        dmin = d.min()
        if not np.isfinite(dmin):
            continue
        cand = idx[d <= dmin + tie_eps]
        mp[i] = dmin
        mpi[i] = int(cand[0])  # smallest index within tie_eps of the min
    return mp, mpi


def matrix_profile(
    points: DataFrame,
    m: int,
    keys: Iterable[str] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    exclusion: int | None = None,
    max_points: int | None = None,
    tie_eps: float = 1e-9,
) -> DataFrame:
    """Per-series self-join matrix profile.

    Output grain: one row per (keys..., pos) for every subsequence start
    ``pos`` (ordinal in ``order_col`` order), columns ``mp`` (z-normalized
    Euclidean NN distance; NULL where no valid neighbor exists) and
    ``mp_index`` (the neighbor's start, NULL with mp). ``max_points``
    bounds per-series cost to the most recent tail — the O(L²) kernel is
    inherent to the exact profile, so the web-scale contract is "bounded L
    per series, unbounded series count".
    """
    if m < 2:
        raise ValueError(f"window m must be >= 2, got {m}")
    excl = int(exclusion) if exclusion is not None else max(1, math.ceil(m / 4))
    keys = list(keys)

    fields = [T.StructField(f.name, f.dataType) for f in points.schema.fields
              if f.name in keys]
    schema = T.StructType(fields + [
        T.StructField("pos", T.LongType()),
        T.StructField("mp", T.DoubleType()),
        T.StructField("mp_index", T.LongType()),
    ])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        if max_points is not None and len(pdf) > max_points:
            pdf = pdf.iloc[-max_points:]
        x = pdf[value_col].to_numpy(dtype=np.float64)
        mp, mpi = _mp_kernel(x, m, excl, tie_eps)
        out = pd.DataFrame({"pos": np.arange(len(mp), dtype=np.int64)})
        for k in keys:
            out[k] = pdf[k].iloc[0]
        out["mp"] = mp
        out["mp_index"] = pd.array(
            np.where(mpi >= 0, mpi, 0), dtype="Int64")
        out.loc[mpi < 0, "mp_index"] = pd.NA
        out.loc[~np.isfinite(mp), "mp"] = None
        return out[[*keys, "pos", "mp", "mp_index"]]

    return (
        points.select(*keys, order_col, value_col)
        .groupBy(*keys).applyInPandas(per_series, schema)
    )


def _dp_kernel(x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Distance profile of query ``q`` against one series: z-normalized
    Euclidean distance at every subsequence start (MASS semantics, direct
    dot products — m is small and broadcast). NaN windows → NaN."""
    m = len(q)
    n = len(x)
    p = n - m + 1
    if p < 1:
        return np.empty(0)
    finite = np.isfinite(x)
    xf = np.where(finite, x, 0.0)
    cnt = np.cumsum(np.concatenate([[0], finite.astype(np.int64)]))
    valid = (cnt[m:] - cnt[:-m]) == m
    c1 = np.cumsum(np.concatenate([[0.0], xf]))
    c2 = np.cumsum(np.concatenate([[0.0], xf * xf]))
    mu = (c1[m:] - c1[:-m]) / m
    sig = np.sqrt(np.maximum((c2[m:] - c2[:-m]) / m - mu * mu, 0.0))
    flat = sig <= 1e-13 * np.maximum(np.abs(mu), 1.0)
    mq, sq = float(q.mean()), float(q.std())
    qflat = sq <= 1e-13 * max(abs(mq), 1.0)
    qt = np.correlate(xf, q, mode="valid")
    sqm = math.sqrt(m)
    if qflat:
        d = np.where(flat, 0.0, sqm)
    else:
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (qt - m * mq * mu) / (m * sq * sig)
        d = np.sqrt(np.maximum(2.0 * m * (1.0 - corr), 0.0))
        d[flat] = sqm
    d[~valid] = np.nan
    return d


def pattern_search(
    points: DataFrame,
    query,
    keys: Iterable[str] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    max_dist: float | None = None,
    per_series_k: int | None = None,
) -> DataFrame:
    """Query-by-shape across EVERY series (the MASS/"UCR suite" search):
    z-normalized distance between the broadcast ``query`` pattern and each
    subsequence of each series. The 100 TB plan: the query ships in the
    kernel closure (a handful of floats), each series computes its profile
    row-locally on the existing series-key Exchange, and the output is cut
    EARLY — ``per_series_k`` keeps only each series' best matches inside
    the kernel and ``max_dist`` drops non-matches before anything wide
    happens, so a global top-k over the result plans as
    TakeOrderedAndProject on a frame already bounded by series count.

    Output grain: (keys..., pos, dist) — one row per surviving
    subsequence start; ``dist`` NULL never emitted (invalid windows are
    dropped, they cannot match). Scale invariance is inherited from
    z-normalization: a pattern is found at any offset/amplitude.
    """
    q = np.asarray(query, dtype=np.float64)
    if q.ndim != 1 or len(q) < 2:
        raise ValueError("query must be a 1-D pattern of length >= 2")
    if not np.isfinite(q).all():
        raise ValueError("query must be finite")
    keys = list(keys)
    fields = [T.StructField(f.name, f.dataType) for f in points.schema.fields
              if f.name in keys]
    schema = T.StructType(fields + [
        T.StructField("pos", T.LongType()),
        T.StructField("dist", T.DoubleType()),
    ])

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        d = _dp_kernel(x, q)
        pos = np.arange(len(d), dtype=np.int64)
        keep = np.isfinite(d)
        if max_dist is not None:
            keep &= d <= max_dist
        pos, d = pos[keep], d[keep]
        if per_series_k is not None and len(d) > per_series_k:
            cut = np.argsort(d, kind="stable")[:per_series_k]
            cut.sort()
            pos, d = pos[cut], d[cut]
        out = pd.DataFrame({"pos": pos})
        for k in keys:
            out[k] = pdf[k].iloc[0] if len(pdf) else None
        out["dist"] = d
        return out[[*keys, "pos", "dist"]]

    return (
        points.select(*keys, order_col, value_col)
        .groupBy(*keys).applyInPandas(per_series, schema)
    )


def top_discords(
    mp_df: DataFrame, k: int = 1, keys: Iterable[str] = KEYS
) -> DataFrame:
    """Per-series k strongest discords: the positions with the LARGEST
    nearest-neighbor distance (shape anomalies). Two partial-agg shuffles
    (rank window over the per-series grain); ties broken by position."""
    from pyspark.sql import Window as W

    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(F.desc("mp"), F.asc("pos"))
    return (
        mp_df.filter(F.col("mp").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def top_motifs(
    mp_df: DataFrame, k: int = 1, keys: Iterable[str] = KEYS
) -> DataFrame:
    """Per-series k strongest motifs: the positions with the SMALLEST
    nearest-neighbor distance, paired with that neighbor (``mp_index``)."""
    from pyspark.sql import Window as W

    keys = list(keys)
    w = W.partitionBy(*keys).orderBy(F.asc("mp"), F.asc("pos"))
    return (
        mp_df.filter(F.col("mp").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
