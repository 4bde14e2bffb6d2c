"""Series algebra: mask_with (semi/anti), concatenate (keep-first dedup),
smoothing, and the Dataset filter/pop predicates.

References:
- ``mask_with``     — ``/root/reference/gensor/core/base.py:239-267``
- ``concatenate``   — ``gensor/core/base.py:134-145`` (sort, dedup keep-first:
  self wins over other)
- ``smooth_data``   — ``gensor/processing/smoothing.py:10-66`` (centered
  rolling mean/median, window=5, edges null because min_periods defaults to
  the window size)
- ``Dataset.filter``/``Where`` — ``gensor/core/dataset.py:341-392`` / ``:37-90``
  (attribute equality/IN filters, ``~`` negation) → plain Column algebra
- ``Dataset.pop``   — ``gensor/core/dataset.py:394-439`` → semi/anti split
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

KEYS = ("doc_id", "source")


def mask_with(
    points: DataFrame, other: DataFrame, mode: str = "keep", on: str = "ts"
) -> DataFrame:
    """Keep/remove rows whose timestamps occur in ``other`` (base.py:239-267).

    Pure semi/anti join on the timestamp — Catalyst/AQE picks broadcast when
    the mask side is small (the common case: a fieldwork log or a short
    reference series).
    """
    if mode not in ("keep", "remove"):
        raise ValueError("mode must be 'keep' or 'remove'")
    how = "left_semi" if mode == "keep" else "left_anti"
    return points.join(other.select(on).distinct(), on, how)


def concatenate(
    first: DataFrame, second: DataFrame, keys=KEYS, ts_col: str = "ts"
) -> DataFrame:
    """Union two point sets; on duplicate (series, ts) the FIRST input wins.

    gensor: ``pd.concat([self, other])`` + sort + ``~index.duplicated('first')``
    (base.py:134-145). Spark: priority-tagged union + row_number window.
    """
    a = first.withColumn("_prio", F.lit(0))
    b = second.withColumn("_prio", F.lit(1))
    w = W.partitionBy(*keys, ts_col).orderBy("_prio")
    return (
        a.unionByName(b)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )


def smooth(
    points: DataFrame,
    window: int = 5,
    method: str = "rolling_mean",
    keys=KEYS,
    value_col: str = "value",
) -> DataFrame:
    """Centered rolling mean/median; edge rows null (min_periods = window).

    pandas centered frame for even windows takes one extra row BEFORE
    (SURVEY.md §2.5): rows [i - w//2, i + (w-1)//2].
    """
    lead, trail = window // 2, (window - 1) // 2
    win = W.partitionBy(*keys).orderBy("seq").rowsBetween(-lead, trail)
    full = (F.count(F.lit(1)).over(win) == window) & (
        F.count(value_col).over(win) == window
    )
    if method == "rolling_mean":
        sm = F.avg(value_col).over(win)
    elif method == "rolling_median":
        # exact percentile supports window frames where median() does not;
        # linear interpolation at 0.5 == the median
        sm = F.expr(f"percentile({value_col}, 0.5)").over(win)
    else:
        raise ValueError(f"unsupported smoothing method: {method}")
    return points.withColumn(value_col, F.when(full, sm))


def where(include: dict[str, list | str] | None = None,
          exclude: dict[str, list | str] | None = None) -> Column:
    """gensor ``Where``/``Dataset.filter`` predicates as Column algebra.

    Attribute conditions AND-ed; values may be scalars or IN-lists; exclude
    is the ``~``-prefixed negation path (dataset.py:19-34, :37-90).
    """
    cond = F.lit(True)
    for attr, vals in (include or {}).items():
        vals = vals if isinstance(vals, (list, tuple)) else [vals]
        cond = cond & F.col(attr).isin(list(vals))
    for attr, vals in (exclude or {}).items():
        vals = vals if isinstance(vals, (list, tuple)) else [vals]
        cond = cond & ~F.col(attr).isin(list(vals))
    return cond


def pop(points: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """gensor Dataset.pop: (remaining, popped) split by a predicate."""
    return points.filter(~predicate), points.filter(predicate)
