"""Pandas re-implementation of gensor semantics, used as the differential oracle.

Each function mirrors the reference behavior exactly (citations inline) so a
Spark operator can be checked per series: run both on the same points, compare.
This is the test strategy SURVEY.md §5 derives from the reference's own suite
(which trusts pandas/scipy/sklearn as oracles, tests/test_transformation.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def to_series(pdf: pd.DataFrame) -> pd.Series:
    """One series' points → the gensor pd.Series shape (UTC index, float64)."""
    s = pd.Series(
        pdf["value"].to_numpy(dtype=float),
        index=pd.DatetimeIndex(pd.to_datetime(pdf["ts"], utc=True)),
    )
    return s.sort_index()


def resample(s: pd.Series, freq: str, agg: str = "mean") -> pd.Series:
    """gensor resample: pd.Series.resample(freq).apply(agg) — core/base.py:147-170."""
    agg_fn = {
        "mean": pd.Series.mean,
        "min": pd.Series.min,
        "max": pd.Series.max,
        "sum": pd.Series.sum,
        "count": pd.Series.count,
        "median": pd.Series.median,
        "std": pd.Series.std,
        "last": lambda x: x.dropna().iloc[-1] if x.notna().any() else np.nan,
        "first": lambda x: x.dropna().iloc[0] if x.notna().any() else np.nan,
    }[agg]
    return s.resample(freq).apply(agg_fn)


def rollup_tiers(pdf: pd.DataFrame, freq: str) -> pd.DataFrame:
    """count/min/max/mean/last per bin — the retention-tier reference output."""
    s = to_series(pdf)
    g = s.resample(freq)
    out = pd.DataFrame(
        {
            "count": g.count(),
            "min": g.min(),
            "max": g.max(),
            "mean": g.mean(),
            "last": g.apply(lambda x: x.dropna().iloc[-1] if x.notna().any() else np.nan),
        }
    )
    out.index.name = "bin_ts"
    return out.reset_index()
