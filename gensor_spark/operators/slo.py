"""SLO error-budget burn-rate alerting (the Google SRE workbook rule).

The production question a tier store of service events ultimately serves:
"is this series burning its error budget fast enough to page?". The
standard robust answer is MULTI-WINDOW burn-rate alerting (SRE Workbook
ch. 5): the burn rate over a window is

    burn = error_ratio_over_window / (1 - slo_target)

(burn 1 = exactly exhausting the budget over the SLO period; 14.4 = a
99.9% SLO's 30-day budget gone in 2 days), and an alert fires only when
BOTH a long window and a short window exceed the threshold — the long
window supplies significance (no paging on blips), the short window
supplies reset (the alert clears quickly once the incident ends).

Implementation is pure event-time window algebra — trailing RANGE frames
over epoch seconds keyed on the series — so it runs identically over the
batch point view and (via the usual foreachBatch lift) a stream:

- one Exchange on the series key; both windows share the one Sort
  (same partitioning, same ordering, different frames);
- counts, not pre-aggregated rates, are summed per frame — the ratio is
  taken once per row, so irregular sampling weights events, not wall time
  (counter-rate semantics live in operators/twa.py / counter_rate).

Reference: public SRE workbook multiwindow multi-burn-rate recipe; no
gensor analogue (the reference stops at threshold masks).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

KEYS = ("doc_id", "source")


def burn_rate(
    points: DataFrame,
    error_col: str | Column,
    slo_target: float,
    window_seconds: int,
    keys: Iterable[str] = KEYS,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-point trailing burn rate: error ratio over the trailing
    ``window_seconds`` (RANGE frame on event time, inclusive) divided by
    the SLO's error budget ``1 - slo_target``.

    ``error_col`` is a boolean column (or name). Output adds
    ``win_total``, ``win_errors``, ``burn`` to the input rows.
    """
    if not 0.0 < slo_target < 1.0:
        raise ValueError(f"slo_target must be in (0,1), got {slo_target}")
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    err = F.col(error_col) if isinstance(error_col, str) else error_col
    w = (
        W.partitionBy(*keys)
        .orderBy(F.unix_timestamp(F.col(ts_col)))
        .rangeBetween(-(window_seconds - 1), 0)
    )
    total = F.count("*").over(w)
    errors = F.sum(err.cast("int")).over(w)
    budget = 1.0 - slo_target
    return (
        points.withColumn("win_total", total)
        .withColumn("win_errors", errors)
        .withColumn("burn", (F.col("win_errors") / F.col("win_total"))
                    / F.lit(budget))
    )


def multiwindow_burn_alerts(
    points: DataFrame,
    error_col: str | Column,
    slo_target: float,
    long_seconds: int = 3600,
    short_seconds: int = 300,
    threshold: float = 14.4,
    keys: Iterable[str] = KEYS,
    ts_col: str = "ts",
) -> DataFrame:
    """The two-window rule: a point is ALERTING when the burn rate over
    BOTH the long and the short trailing windows exceeds ``threshold``.
    Default numbers are the workbook's fast-burn page (1h + 5m at 14.4×
    for a 30-day SLO). Output: input rows + ``burn_long``, ``burn_short``,
    ``alerting``. Both frames share one Sort (same window partitioning).
    """
    if short_seconds >= long_seconds:
        raise ValueError(
            f"short window ({short_seconds}s) must be shorter than the "
            f"long one ({long_seconds}s)")
    err = F.col(error_col) if isinstance(error_col, str) else error_col
    budget = 1.0 - slo_target
    if not 0.0 < slo_target < 1.0:
        raise ValueError(f"slo_target must be in (0,1), got {slo_target}")

    def frame(secs: int):
        return (
            W.partitionBy(*keys)
            .orderBy(F.unix_timestamp(F.col(ts_col)))
            .rangeBetween(-(secs - 1), 0)
        )

    e = err.cast("int")
    wl, ws = frame(long_seconds), frame(short_seconds)
    burn_l = (F.sum(e).over(wl) / F.count("*").over(wl)) / F.lit(budget)
    burn_s = (F.sum(e).over(ws) / F.count("*").over(ws)) / F.lit(budget)
    # ONE projection for both frames: chained withColumns would extract
    # the order key into two different attributes, splitting the plan
    # into two Window nodes with two Sorts — a single select collapses
    # all four window functions into one Window over one Sort
    out = points.select(
        "*", burn_l.alias("burn_long"), burn_s.alias("burn_short"))
    return out.withColumn(
        "alerting", (F.col("burn_long") > threshold)
        & (F.col("burn_short") > threshold))
