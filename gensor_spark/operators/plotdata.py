"""Plot-data endpoints: the DataFrames behind gensor's plot surfaces.

gensor renders matplotlib figures (``gensor/core/dataset.py:486,698,860``,
``gensor/core/base.py:375``: per-series lines faceted by variable/location,
optional outlier overlay). A distributed engine exposes the *data shapes*
those plots consume and leaves rendering to the client — shipping raw
points to a renderer is exactly what does not survive 10^12 rows.

Three endpoints, all pure Catalyst plans:

- ``m4_downsample`` — the M4 aggregation (Jugel et al., VLDB 2014): per
  series and per pixel-column time bin keep the first, last, min-value and
  max-value points. Renders pixel-identical line plots with ≤ 4·width
  points per series regardless of input size; one shuffle, map-side
  partial aggregation, no window.
- ``outlier_overlay`` — the scatter overlay behind ``include_outliers=True``:
  the flagged points of any detector in ``operators/outliers``.
- ``coverage_segments`` — the span bars behind the coverage/facet layouts:
  per-series contiguous segments split at gaps > ``gap_seconds`` (reuses
  the gap-sessionization shape, queries.q_gap_sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

KEYS = ("doc_id", "source")


def m4_downsample(
    points: DataFrame,
    bins: int = 1000,
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """M4 plot downsampling: ≤ 4 points per (series, time bin).

    ``bins`` is the target pixel width. Bin edges are per-series (each
    series' own [min ts, max ts] span divided into ``bins`` equal slots), so
    every series uses its full pixel budget like a faceted plot does.
    Output: one row per kept point ``(keys..., bin, ts, value, role)`` with
    role ∈ {first,last,min,max} (a point kept for several roles appears once
    with the lexicographically-first role — renderers only need the points).

    Plan: two shuffles on the series keys (span aggregate, then the M4
    aggregate on (keys, bin)), both with map-side partials; no windows, no
    Python. At 10^12 points this reduces to 4·bins rows per series before
    anything leaves the executors.
    """
    v, t = F.col(value_col), F.col(ts_col)
    nn = points.filter(v.isNotNull())
    spans = nn.groupBy(*keys).agg(
        F.min(t).alias("_lo"), F.max(t).alias("_hi")
    )
    binned = nn.join(spans, list(keys)).withColumn(
        "bin",
        F.least(
            F.lit(bins - 1),
            F.floor(
                (F.unix_micros(t) - F.unix_micros(F.col("_lo")))
                * bins
                / F.greatest(
                    F.unix_micros(F.col("_hi")) - F.unix_micros(F.col("_lo")),
                    F.lit(1),
                )
            ),
        ).cast("int"),
    )
    agged = binned.groupBy(*keys, "bin").agg(
        F.min_by(t, t).alias("_t_first"), F.min_by(v, t).alias("_v_first"),
        F.max_by(t, t).alias("_t_last"), F.max_by(v, t).alias("_v_last"),
        # value ties broken on the point's ts via a (value, ts) struct —
        # deterministic, and struct ordering is supported by min_by/max_by
        F.min(F.struct(v.alias("v"), t.alias("t"))).alias("_min"),
        F.max(F.struct(v.alias("v"), t.alias("t"))).alias("_max"),
    )
    pts4 = agged.select(
        *keys, "bin",
        F.explode(
            F.array(
                F.struct(F.col("_t_first").alias("ts"),
                         F.col("_v_first").alias("value"),
                         F.lit("first").alias("role")),
                F.struct(F.col("_t_last").alias("ts"),
                         F.col("_v_last").alias("value"),
                         F.lit("last").alias("role")),
                F.struct(F.col("_min.t").alias("ts"),
                         F.col("_min.v").alias("value"),
                         F.lit("min").alias("role")),
                F.struct(F.col("_max.t").alias("ts"),
                         F.col("_max.v").alias("value"),
                         F.lit("max").alias("role")),
            )
        ).alias("p"),
    )
    flat = pts4.select(*keys, "bin", "p.ts", "p.value", "p.role")
    # a point kept under several roles collapses to one row (first role
    # alphabetically — 'first' < 'last' < 'max' < 'min')
    return flat.groupBy(*keys, "bin", "ts", "value").agg(
        F.min("role").alias("role")
    )


def outlier_overlay(
    points: DataFrame,
    method: str = "zscore_global",
    keys: tuple[str, ...] = KEYS,
    **kwargs,
) -> DataFrame:
    """The ``include_outliers=True`` scatter layer: flagged points only.

    ``method`` selects any detector from ``operators/outliers`` (zscore_
    global/rolling, iqr_global/rolling, hampel, lof, isolation_forest);
    kwargs forward to it. Output: the flagged rows with a ``method`` tag.
    """
    from gensor_spark.operators import outliers as O

    fns = {
        "zscore_global": O.zscore_global,
        "zscore_rolling": O.zscore_rolling,
        "iqr_global": O.iqr_global,
        "iqr_rolling": O.iqr_rolling,
        "hampel": O.hampel,
        "lof": O.lof,
        "isolation_forest": O.isolation_forest,
    }
    if method not in fns:
        raise ValueError(f"unknown outlier method {method!r}; one of {sorted(fns)}")
    flagged = fns[method](points, keys=keys, **kwargs)
    return flagged.filter("is_outlier").drop("is_outlier").withColumn(
        "method", F.lit(method)
    )


def coverage_segments(
    points: DataFrame,
    gap_seconds: int = 3600,
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-series contiguous coverage segments (the span-bar layer).

    A new segment starts wherever the time delta to the previous point
    exceeds ``gap_seconds`` — the same lag + running-sum sessionization as
    q_gap_sessions. Output: ``(keys..., segment, start_ts, end_ts,
    n_points)``, ordered segments per series.
    """
    t = F.col(ts_col)
    w = W.partitionBy(*keys).orderBy(ts_col)
    lagged = points.withColumn("_prev", F.lag(ts_col).over(w))
    marked = lagged.withColumn(
        "_new",
        (F.col("_prev").isNull()
         | (F.unix_timestamp(t) - F.unix_timestamp("_prev") > gap_seconds))
        .cast("int"),
    )
    seg = marked.withColumn(
        "segment",
        F.sum("_new").over(
            W.partitionBy(*keys).orderBy(ts_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return seg.groupBy(*keys, "segment").agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.count("*").alias("n_points"),
    )


def _lttb_select(ts: "np.ndarray", vals: "np.ndarray", k: int) -> "np.ndarray":
    """Indices kept by Largest-Triangle-Three-Buckets (Steinarsson 2013).

    First and last points always kept; the n−2 middle points split into
    k−2 equal buckets; from each bucket keep the point forming the largest
    triangle with the previously KEPT point and the NEXT bucket's average
    (the last bucket's "next" is the final point). Ties take the first
    point — np.argmax semantics, same as the reference JS implementation.
    """
    import numpy as np

    n = ts.size
    if n <= k:
        return np.arange(n)
    # k-1 edges over the middle points [1, n-1): bucket i = [edges[i], edges[i+1])
    edges = np.linspace(1, n - 1, k - 1).astype(np.int64)
    out = np.empty(k, dtype=np.int64)
    out[0], out[-1] = 0, n - 1
    a = 0
    for i in range(k - 2):
        lo, hi = edges[i], edges[i + 1]
        if i + 2 < k - 1:
            nx_t, nx_v = ts[edges[i + 1]:edges[i + 2]].mean(), vals[edges[i + 1]:edges[i + 2]].mean()
        else:
            nx_t, nx_v = ts[n - 1], vals[n - 1]
        # 2·area of triangle (a, candidate, next-avg) for every candidate
        area = np.abs(
            (ts[a] - nx_t) * (vals[lo:hi] - vals[a])
            - (ts[a] - ts[lo:hi]) * (nx_v - vals[a])
        )
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    return out


def lttb_downsample(
    points: DataFrame,
    k: int = 1000,
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """LTTB plot downsampling: exactly min(k, n) points per series.

    The perceptual companion to ``m4_downsample``: M4 is pixel-exact for
    line rendering at a known width; LTTB picks the k visually dominant
    points independent of render width. Unlike M4 it is a sequential
    per-series recurrence (each kept point depends on the previous one), so
    it runs through the batched Arrow kernel runner — the engine's
    sanctioned shape for imperative per-series logic (one shuffle on the
    series key, one JVM↔Python crossing per ~10k-row batch).

    Null values are dropped first (they cannot anchor a triangle), matching
    ``m4_downsample``. Output: the selected rows of the input, original
    columns preserved.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (first + last + at least one bucket)")
    import numpy as np  # noqa: F401  (kernel dependency, imported lazily)
    import pandas as pd

    from gensor_spark.operators.udfkernel import per_series_map

    nn = points.filter(F.col(value_col).isNotNull())

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = pdf.reset_index(drop=True)
        ts = g[ts_col].astype("int64").to_numpy().astype(np.float64)
        vals = g[value_col].to_numpy(dtype=np.float64)
        return g.iloc[_lttb_select(ts, vals, k)]

    return per_series_map(nn, per_series, points.schema, keys=keys, sort_col=ts_col)
