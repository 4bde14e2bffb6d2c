"""Similar-series search by shape: PAA sketches + LB_Keogh + banded DTW.

"Which series move like this one?" — with phase tolerance. Pearson
correlation (``seriesstats.series_corr``) needs the series aligned on a
shared clock; Dynamic Time Warping scores shape similarity even when one
series lags, stretches, or drifts against the other. The engine's pipeline
is the classic indexing stack from the time-series literature (PAA
dimensionality reduction, Sakoe-Chiba banding, LB_Keogh lower-bound
pruning — Keogh et al.'s UCR method family), re-expressed Spark-first:

1. **PAA sketch** (pure Catalyst): each series is reduced to a fixed-length
   vector of bin means via an integer bin key (``r·L DIV n``) + one
   aggregation — the only pass over the raw points, one shuffle on the
   series key. Optional per-sketch z-normalization makes the distance
   scale-free.
2. **Envelopes** (row-local): the Sakoe-Chiba upper/lower envelope of each
   sketch is a per-row ``transform`` over positions — O(L·band), no shuffle.
3. **LB_Keogh pruning** (JVM-side): all candidate pairs are scored with the
   cheap O(L) lower bound first; only pairs with ``lb ≤ eps`` ever reach
   the DTW kernel. Lossless by the lower-bound property: LB_Keogh(a,b) ≤
   DTW(a,b), so no pair within ``eps`` is ever pruned (property-tested).
4. **Banded DTW** (batched Arrow kernel): the O(L·band) DP runs in numpy
   only on survivors.

Scale shape (100 TB): the raw corpus is touched exactly once (step 1);
everything after operates on S sketch rows of L doubles. The pair space is
quadratic in S by nature — callers at web scale pre-select (top-coverage,
one tenant, one source) exactly as ``series_corr`` documents, and the
``max_series`` guard makes the quadratic stage an explicit opt-in rather
than an accident. Within the budget the sketch table broadcasts and the
pair scoring is embarrassingly parallel; the expensive kernel only sees the
lb-surviving fraction.

gensor has no similarity surface at all; this is the time-series
counterpart of the embedding near-dup family (``operators/similarity.py``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEYS = ("doc_id", "source")


def paa_sketch(
    points: DataFrame,
    length: int = 64,
    keys: tuple[str, ...] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    normalize: bool = True,
    min_points: int | None = None,
) -> DataFrame:
    """Piecewise Aggregate Approximation: each series → ``length`` bin means.

    Bin assignment is pure integer arithmetic (``rank·L DIV n``), so every
    series maps onto the same [0, L) grid regardless of its raw length; a
    series shorter than ``min_points`` (default ``length``) is dropped —
    a sketch with empty bins is not comparable. With ``normalize`` the
    sketch is z-normalized (ddof=0) making DTW scale/offset-invariant.

    One shuffle on the series key; the sketch rows are (sid, sketch) with
    ``sid = doc_id|source`` matching ``series_corr``'s pair id convention.
    """
    if length < 2:
        raise ValueError(f"length must be >= 2, got {length}")
    min_points = length if min_points is None else min_points
    part = W.partitionBy(*keys)
    nn = points.filter(F.col(value_col).isNotNull())
    ranked = nn.select(
        *keys,
        F.col(value_col).cast("double").alias("_v"),
        (F.row_number().over(part.orderBy(order_col)) - 1).alias("_r"),
        F.count(F.lit(1)).over(part).alias("_n"),
    ).filter(F.col("_n") >= min_points)
    binned = ranked.selectExpr(
        *keys, "_v", "_n", f"(_r * {int(length)}) DIV _n AS _b"
    )
    per_bin = binned.groupBy(*keys, "_b").agg(
        F.avg("_v").alias("_m"), F.max("_n").alias("_n")
    )
    sk = per_bin.groupBy(*keys).agg(
        F.max("_n").alias("n_points"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_b", "_m"))), lambda s: s["_m"]
        ).alias("sketch"),
    )
    if normalize:
        mu = F.aggregate(
            "sketch", F.lit(0.0), lambda a, x: a + x
        ) / F.size("sketch")
        sk = sk.withColumn("_mu", mu).withColumn(
            "_sd",
            F.sqrt(
                F.aggregate(
                    "sketch", F.lit(0.0),
                    lambda a, x: a + (x - F.col("_mu")) * (x - F.col("_mu")),
                ) / F.size("sketch")
            ),
        ).withColumn(
            "sketch",
            # constant series: sd == 0 -> all-zero sketch, not NaN spray
            F.when(
                F.col("_sd") > 0,
                F.transform("sketch", lambda x: (x - F.col("_mu")) / F.col("_sd")),
            ).otherwise(F.transform("sketch", lambda x: x * 0.0)),
        ).drop("_mu", "_sd")
    sid = F.concat_ws("|", *[F.col(k) for k in keys])
    return sk.select(sid.alias("sid"), "n_points", "sketch")


def _envelope_cols(df: DataFrame, length: int, band: int) -> DataFrame:
    """Sakoe-Chiba envelopes of ``sketch``: upper/lower running extrema over
    a ±band window, as row-local array HOFs (no shuffle, no Python)."""
    idx = F.sequence(F.lit(0), F.lit(length - 1))

    def win(i):
        # positions are 0-based, slice() is 1-based: element i covers
        # sketch indices [i-band, i+band] clamped to the array
        start = F.greatest(i - band + 1, F.lit(1))
        stop = F.least(i + band + 1, F.lit(length))
        return F.slice("sketch", start, stop - start + 1)

    return df.withColumn(
        "env_u", F.transform(idx, lambda i: F.array_max(win(i)))
    ).withColumn(
        "env_l", F.transform(idx, lambda i: F.array_min(win(i)))
    )


def _lb_keogh(q: str, u: str, lo: str) -> F.Column:
    """LB_Keogh(query, candidate-envelope): Σ of squared excursions of q
    outside [lo, u], square-rooted — a lower bound on banded DTW."""
    over = F.zip_with(
        q, u, lambda x, ub: F.when(x > ub, (x - ub) * (x - ub)).otherwise(F.lit(0.0))
    )
    under = F.zip_with(
        q, lo, lambda x, lb: F.when(x < lb, (lb - x) * (lb - x)).otherwise(F.lit(0.0))
    )
    s = F.aggregate(over, F.lit(0.0), lambda a, x: a + x) + F.aggregate(
        under, F.lit(0.0), lambda a, x: a + x
    )
    return F.sqrt(s)


def _dtw_kernel(a: np.ndarray, b: np.ndarray, band: int) -> float:
    """Exact Sakoe-Chiba-banded DTW distance (squared-point cost, sqrt at
    the end — the metric LB_Keogh lower-bounds)."""
    n = len(a)
    big = np.inf
    prev = np.full(n + 1, big)
    prev[0] = 0.0
    cur = np.empty(n + 1)
    for i in range(1, n + 1):
        cur[:] = big
        j0 = max(1, i - band)
        j1 = min(n, i + band)
        ai = a[i - 1]
        for j in range(j0, j1 + 1):
            d = ai - b[j - 1]
            cur[j] = d * d + min(prev[j], prev[j - 1], cur[j - 1])
        prev, cur = cur, prev
    return float(np.sqrt(prev[n]))


def dtw_pairs(
    points: DataFrame,
    eps: float,
    length: int = 64,
    band: int = 8,
    keys: tuple[str, ...] = KEYS,
    value_col: str = "value",
    order_col: str = "seq",
    normalize: bool = True,
    max_series: int = 2000,
) -> DataFrame:
    """All series pairs whose banded-DTW sketch distance is ≤ ``eps``.

    Exact under pruning: every pair's LB_Keogh (both directions — the bound
    is asymmetric, either direction lower-bounds DTW, so requiring
    ``min(lb_ab, lb_ba) ≤ eps`` keeps every qualifying pair) is evaluated
    JVM-side; only survivors reach the numpy DP. ``max_series`` guards the
    quadratic stage: exceeding it raises rather than silently launching an
    S² job — pre-select (one source, top coverage) and re-run.

    Returns (sid_a, sid_b, lb, dtw) with sid_a < sid_b, dtw ≤ eps.
    """
    if eps < 0:
        raise ValueError(f"eps must be >= 0, got {eps}")
    if band < 1:
        raise ValueError(f"band must be >= 1, got {band}")
    sk = paa_sketch(points, length, keys, value_col, order_col, normalize)
    sk = _envelope_cols(sk, length, band).localCheckpoint(eager=True)
    n_series = sk.count()
    if n_series > max_series:
        raise ValueError(
            f"{n_series} series exceed max_series={max_series}: the pair "
            f"space is quadratic — pre-select series (one source / top "
            f"coverage, cf. series_corr) or raise max_series explicitly"
        )
    a = sk.select(
        F.col("sid").alias("sid_a"), F.col("sketch").alias("sk_a"),
        F.col("env_u").alias("u_a"), F.col("env_l").alias("l_a"),
    )
    b = sk.select(
        F.col("sid").alias("sid_b"), F.col("sketch").alias("sk_b"),
        F.col("env_u").alias("u_b"), F.col("env_l").alias("l_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("sid_a") < F.col("sid_b"))
    lb = F.least(
        _lb_keogh("sk_a", "u_b", "l_b"), _lb_keogh("sk_b", "u_a", "l_a")
    )
    cand = pairs.withColumn("lb", lb).filter(F.col("lb") <= eps).select(
        "sid_a", "sid_b", "lb", "sk_a", "sk_b"
    )

    out_schema = T.StructType([
        T.StructField("sid_a", T.StringType()),
        T.StructField("sid_b", T.StringType()),
        T.StructField("lb", T.DoubleType()),
        T.StructField("dtw", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            d = [
                _dtw_kernel(
                    np.asarray(ra, dtype=float), np.asarray(rb, dtype=float), band
                )
                for ra, rb in zip(pdf["sk_a"], pdf["sk_b"])
            ]
            out = pdf[["sid_a", "sid_b", "lb"]].copy()
            out["dtw"] = d
            yield out

    scored = cand.mapInPandas(score, out_schema)
    return scored.filter(F.col("dtw") <= eps)
