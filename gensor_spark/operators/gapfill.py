"""Gap-fill: LOCF, NOCB, and linear/time interpolation as window plans.

gensor exposes these through pandas delegation —
``ts.interpolate(method='linear'|'time'|'ffill')`` invoked e.g. at
``/root/reference/gensor/processing/compensation.py:216-219`` and via
``__getattr__`` forwarding (``gensor/core/base.py:89-120``). Semantics:

- ``locf``  = pandas ``ffill``: last non-null value carried forward;
- ``nocb``  = pandas ``bfill``: next non-null carried back;
- ``linear`` = pandas ``interpolate('linear')``: **position-weighted**
  between the surrounding non-null points (equal spacing assumed);
- ``time``  = pandas ``interpolate('time')``: **timestamp-weighted**.
  Both leave leading nulls unfilled (no extrapolation backwards) and fill
  trailing nulls with the last value (pandas default limit_direction
  'forward' fills forward past the last known value).

Spark realization: pure window functions — a forward frame carrying
``(last non-null value, its ts/seq)`` and a reverse frame carrying the next
ones, then the affine blend. No UDFs, single shuffle on the series key.

Performance note: the "next non-null" lookup is expressed as a DESCENDING
sort with an unbounded-PRECEDING frame, never ``rowsBetween(0,
unboundedFollowing)`` — Spark's UnboundedFollowingWindowFunctionFrame
re-aggregates the remaining frame for every row (O(n²) per partition; 100×
slowdown measured on month-long 15-min dense grids), while the preceding
frame is maintained incrementally (O(n)). Both sorts share one shuffle on
the series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

KEYS = ("doc_id", "source")


def _fwd(keys, seq_col: str = "seq"):
    return W.partitionBy(*keys).orderBy(seq_col).rowsBetween(W.unboundedPreceding, 0)


def _bwd(keys, seq_col: str = "seq"):
    # descending order + preceding frame == "current row to end" in ascending
    # order, but incremental instead of quadratic (see module docstring)
    return (
        W.partitionBy(*keys)
        .orderBy(F.desc(seq_col))
        .rowsBetween(W.unboundedPreceding, 0)
    )


def locf(points: DataFrame, keys=KEYS, value_col: str = "value",
         seq_col: str = "seq") -> DataFrame:
    """Last observation carried forward (pandas ffill parity)."""
    filled = F.last(value_col, ignorenulls=True).over(_fwd(keys, seq_col))
    return points.withColumn(value_col, filled)


def nocb(points: DataFrame, keys=KEYS, value_col: str = "value",
         seq_col: str = "seq") -> DataFrame:
    """Next observation carried backward (pandas bfill parity)."""
    filled = F.last(value_col, ignorenulls=True).over(_bwd(keys, seq_col))
    return points.withColumn(value_col, filled)


def interpolate(
    points: DataFrame,
    method: str = "linear",
    keys=KEYS,
    value_col: str = "value",
    ts_col: str = "ts",
    seq_col: str = "seq",
) -> DataFrame:
    """pandas ``Series.interpolate(method='linear'|'time')`` parity.

    'linear' weights by row position (pandas ignores the index), 'time'
    weights by the timestamp. Interior nulls blend prev/next; trailing nulls
    carry the last value forward; leading nulls stay null.
    """
    if method not in ("linear", "time"):
        raise ValueError(f"unsupported interpolation method: {method}")
    x = F.col(seq_col).cast("double") if method == "linear" else (
        F.unix_micros(F.col(ts_col)).cast("double")
    )
    v = F.col(value_col)
    fwd, bwd = _fwd(keys, seq_col), _bwd(keys, seq_col)

    prev_v = F.last(v, ignorenulls=True).over(fwd)
    prev_x = F.last(F.when(v.isNotNull(), x), ignorenulls=True).over(fwd)
    next_v = F.last(v, ignorenulls=True).over(bwd)
    next_x = F.last(F.when(v.isNotNull(), x), ignorenulls=True).over(bwd)

    blended = prev_v + (next_v - prev_v) * (x - prev_x) / (next_x - prev_x)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), F.lit(None))          # leading nulls: no backfill
        .when(next_v.isNull(), prev_v)               # trailing nulls: ffill
        .otherwise(blended)
    )
    return points.withColumn(value_col, filled)
