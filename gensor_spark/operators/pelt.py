"""PELT multi-changepoint detection (Killick, Fearnhead & Eckley 2012).

Series-stats extension: the reference's trend/outlier kit
(gensor/analysis/outliers.py) locates level SHIFTS only indirectly; the
repo's CUSUM verb (operators/seriesstats.cusum_changepoint) finds the
single strongest shift. PELT finds the OPTIMAL set of multiple changepoints
— the exact minimizer of ``Σ segment_cost + β·(#changepoints)`` — in
amortized O(n) per series via inequality pruning, and is the standard
algorithm behind the `ruptures`/`changepoint` packages.

Cost model here: Gaussian mean-shift (within-segment sum of squared
deviations from the segment mean), computed O(1) per candidate from prefix
sums — the classic "normal mean" cost whose pruning constant is K = 0.
NaNs are dropped per series before detection (positions reported in the
series' non-null ordinal AND original ``seq``).

Shape at scale: one shuffle on the series key into the batched Arrow
kernel (`udfkernel.per_series_map` — many series per JVM↔Python crossing);
the DP is per-series work. Output is one row per changepoint plus one
summary row (cp_index = -1) carrying the segment count and total cost, so
empty results still prove the series was scanned.

Exactness: PELT's pruning is provably lossless for additive costs with
K = 0; the test suite pins kernel output against an UNPRUNED O(n²)
exhaustive DP — equality, not approximation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gensor_spark.operators.udfkernel import KEYS, per_series_map


def _seg_cost_factory(values: np.ndarray):
    """O(1) Gaussian mean-shift segment cost from prefix sums.

    cost(a, b) over values[a:b] = Σ v² − (Σ v)²/n  (SSE around the mean).
    """
    c1 = np.concatenate(([0.0], np.cumsum(values)))
    c2 = np.concatenate(([0.0], np.cumsum(values * values)))

    def cost(a: int, b: int) -> float:
        n = b - a
        s = c1[b] - c1[a]
        return (c2[b] - c2[a]) - (s * s) / n

    return cost


def pelt_changepoints_np(values: np.ndarray, penalty: float) -> list[int]:
    """Changepoint positions (segment START indices, excluding 0) that
    exactly minimize total SSE + penalty·(#segments−1). Pure numpy/python;
    the distributed operator calls this per series inside the Arrow kernel.
    """
    n = len(values)
    if n == 0:
        return []
    cost = _seg_cost_factory(values)
    f = np.full(n + 1, np.inf)
    f[0] = -penalty
    prev = np.zeros(n + 1, dtype=np.int64)
    candidates = [0]
    for t in range(1, n + 1):
        best, arg = np.inf, 0
        for s in candidates:
            c = f[s] + cost(s, t) + penalty
            if c < best:
                best, arg = c, s
        f[t] = best
        prev[t] = arg
        # PELT pruning (K = 0 for additive SSE): a candidate whose partial
        # objective already exceeds f[t] can never win later
        candidates = [s for s in candidates if f[s] + cost(s, t) <= f[t]]
        candidates.append(t)
    cps = []
    t = n
    while t > 0:
        s = int(prev[t])
        if s > 0:
            cps.append(s)
        t = s
    return sorted(cps)


PELT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("cp_index", T.IntegerType()),   # -1 = summary row
    T.StructField("cp_seq", T.LongType()),        # seq of first row AFTER cp
    T.StructField("n_segments", T.IntegerType()),
    T.StructField("total_cost", T.DoubleType()),
])


def pelt_changepoints(
    points: DataFrame,
    penalty: float = 10.0,
    keys: tuple[str, ...] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    min_points: int = 2,
) -> DataFrame:
    """Optimal multi-changepoint segmentation per series.

    One row per changepoint (``cp_index`` = position in the series'
    non-null ordinal; ``cp_seq`` = the ``order_col`` of the first point of
    the new segment) plus one summary row per series (``cp_index = -1``)
    with the segment count and the total SSE cost. Series with fewer than
    ``min_points`` non-null values emit only the summary row.
    """
    pen = float(penalty)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        did = pdf["doc_id"].iloc[0]
        src = pdf["source"].iloc[0]
        sub = pdf[pdf[value_col].notna()]
        v = sub[value_col].to_numpy(dtype=float)
        seqs = sub[order_col].to_numpy()
        rows = []
        cps = pelt_changepoints_np(v, pen) if len(v) >= min_points else []
        cost = _seg_cost_factory(v) if len(v) else None
        total = 0.0
        bounds = [0] + cps + [len(v)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            if b > a:
                total += cost(a, b)
        for i in cps:
            rows.append((did, src, int(i), int(seqs[i]), len(cps) + 1, total))
        rows.append((did, src, -1, -1, len(cps) + 1 if len(v) else 0, total))
        return pd.DataFrame(rows, columns=[f.name for f in PELT_SCHEMA.fields])

    return per_series_map(points, kern, PELT_SCHEMA, keys=keys,
                          sort_col=order_col)


def segmented_trend(
    points: DataFrame,
    penalty: float = 10.0,
    keys: tuple[str, ...] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    min_points: int = 2,
) -> DataFrame:
    """Per-regime OLS trends: PELT segmentation composed with per-segment
    regression — "the mean shifted at t₁, t₂; what is each regime doing?".

    Output one row per (series, segment): ``segment`` ordinal, the segment's
    ``start_/end_`` ``order_col`` bounds, ``n`` points, OLS ``slope``/
    ``intercept`` over (order_col, value) via Catalyst ``regr_*`` (the
    ``trend_ols`` machinery, per segment), and the segment ``mean``.
    Constant segments get slope 0; single-point segments NULL slope
    (``regr_slope`` needs 2 points). Series below ``min_points`` fall into
    one whole-series segment 0.

    Shape at scale: the PELT Arrow kernel's one Exchange, then the tiny
    per-series changepoint arrays join back on the series key (linear, no
    skew added — arrays are #changepoints long), segment ids assigned
    row-locally by counting boundaries ≤ seq, and ONE partial-agged groupBy
    computes every regression moment. No window over raw points.
    """
    from pyspark.sql import functions as F

    cps = pelt_changepoints(points, penalty=penalty, keys=keys,
                            value_col=value_col, order_col=order_col,
                            min_points=min_points)
    cp_arr = (
        cps.filter(F.col("cp_index") >= 0)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("cp_seq")).alias("_cps"))
    )
    pts = points.filter(F.col(value_col).isNotNull())
    seg = F.when(F.col("_cps").isNull(), F.lit(0)).otherwise(
        F.size(F.filter("_cps", lambda c: c <= F.col(order_col)))
    )
    o = F.col(order_col).cast("double")
    return (
        pts.join(cp_arr, list(keys), "left")
        .withColumn("segment", seg)
        .groupBy(*keys, "segment")
        .agg(
            F.count("*").alias("n"),
            F.min(order_col).alias(f"start_{order_col}"),
            F.max(order_col).alias(f"end_{order_col}"),
            F.regr_slope(F.col(value_col), o).alias("slope"),
            F.regr_intercept(F.col(value_col), o).alias("intercept"),
            F.avg(value_col).alias("mean"),
        )
    )


def forecast_segmented(
    points: DataFrame,
    horizon: int,
    penalty: float = 10.0,
    keys: tuple[str, ...] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    min_points: int = 2,
) -> DataFrame:
    """h-step forecasts by EXTENDING THE CURRENT REGIME: the last PELT
    segment's OLS line, evaluated ``horizon`` steps past the series end.

    The broken-trend counterpart of the exponential family: after a level
    shift, Holt/EWMA drag history from the old regime into the forecast
    for ~1/alpha steps, while the segmented forecast uses ONLY the points
    since the last changepoint (on a clean post-break ramp it is exact —
    tested). Falls back per series: a single-point final segment (NULL
    ``regr_slope``) forecasts flat at that point's value.

    Output: one row per (series, step 1..horizon) — ``step``, ``yhat``,
    ``segment`` (the regime extended), ``n`` (its size). Shape at scale:
    ``segmented_trend``'s plan + a max_by aggregate at the series grain +
    a ``sequence`` explode of h rows per series — nothing corpus-scale
    beyond the PELT pass itself.
    """
    from pyspark.sql import functions as F

    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    segs = segmented_trend(points, penalty=penalty, keys=keys,
                           value_col=value_col, order_col=order_col,
                           min_points=min_points)
    end_col = f"end_{order_col}"
    last = segs.groupBy(*keys).agg(
        F.max_by(
            F.struct("segment", "n", "slope", "intercept", "mean", end_col),
            F.col("segment"),
        ).alias("_s")
    ).select(*keys, "_s.*")
    step = F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("step")
    stepped = last.select(*keys, "segment", "n", "slope", "intercept",
                          "mean", end_col, step)
    t = (F.col(end_col).cast("double") + F.col("step"))
    yhat = F.when(F.col("slope").isNotNull(),
                  F.col("intercept") + F.col("slope") * t) \
            .otherwise(F.col("mean"))
    return stepped.select(*keys, "step", yhat.alias("yhat"), "segment", "n")
