"""Time-weighted average rollups over irregularly-sampled series.

Plain ``mean`` per bin is wrong on irregular samples: a sensor that reports
once an hour and then bursts 100 readings in a minute should not have the
burst dominate the hourly average. The standard fix (TimescaleDB
``time_weight`` + ``average``, InfluxDB ``integral``) weights each
observation by how long it was the current value. gensor has no analogue —
its ``resample`` (``/root/reference/gensor/core/base.py:147-170``) is a
plain per-bin ``mean`` — but its groundwater series are exactly the
irregular-sample shape this operator exists for, so the engine offers it as
a sibling of the tier rollups.

Semantics (both methods, no extrapolation past the last observation):

- each consecutive observation pair ``(t_i, v_i) → (t_{i+1}, v_{i+1})`` of a
  key defines a segment; null values are dropped first (the observed-value
  series carries the weight, matching ``time_weight``'s treatment);
- ``locf``: the segment holds ``v_i`` for its whole span (step function);
- ``linear``: the value ramps linearly between the endpoints (trapezoid);
- a segment is **clipped to the bin grid**: each spanned bin receives only
  the integral over its overlap, so bin results are exact regardless of how
  segments straddle boundaries;
- per bin: ``twa = ∫ v dt / covered``, where ``covered`` is the overlapped
  duration actually observed inside the bin (not the full bin width —
  leading/trailing uncovered time does not dilute the average).

Physical shape (pure Catalyst, no UDFs): ONE window (``lead`` over the key)
→ explode each segment over the bins it spans (``sequence``; segments are
short relative to bins in practice, and ``max_bins_per_segment`` refuses
degenerate inputs the same way operators/intervaljoin.py does) → one
partial-aggregated ``groupBy (keys, bin)``. Two shuffles total, both on
high-cardinality keys; a hot key spreads across its bins before the final
shuffle, so per-key skew dies at the explode. At 100 TB the explode factor
is bounded by span/bin — the same guarded-grid contract as the interval
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.resample import freq_to_seconds

US = 1_000_000


def time_weighted_avg(
    points: DataFrame,
    freq: str = "1h",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "ts",
    value_col: str = "value",
    max_bins_per_segment: int = 100_000,
) -> DataFrame:
    """Per-``keys``, per-``freq``-bin time-weighted averages.

    Returns ``(*keys, bin_ts, covered_s, twa_locf, twa_linear)`` — one row
    per (key, bin) with at least one covered microsecond. ``covered_s`` is
    the observed duration inside the bin in seconds; ``twa_locf`` /
    ``twa_linear`` are the step-function and trapezoidal time-weighted
    means over that covered span. Keys with fewer than two non-null
    observations produce no rows (no span to weight — same contract as
    ``pandas.Series.diff``-style operators).
    """
    from gensor_spark.operators.rollup import TIER_SECONDS

    step_us = (TIER_SECONDS.get(freq) or freq_to_seconds(freq)) * US
    key_cols = [F.col(k) for k in keys]

    from pyspark.sql import Window

    win = Window.partitionBy(*key_cols).orderBy("_e0")
    seg = (
        points.filter(F.col(value_col).isNotNull())
        .select(
            *keys,
            # cast tolerates TIMESTAMP_NTZ sources (asof.py:51 precedent)
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_e0"),
            F.col(value_col).cast("double").alias("_v0"),
        )
        .withColumn("_e1", F.lead("_e0").over(win))
        .withColumn("_v1", F.lead("_v0").over(win))
        .filter(F.col("_e1").isNotNull() & (F.col("_e1") > F.col("_e0")))
    )

    b0 = (F.col("_e0") / step_us).cast("long")
    # a segment ending exactly on a boundary contributes nothing to the
    # next bin: last spanned bin indexes the final microsecond inside it
    b1 = ((F.col("_e1") - 1) / step_us).cast("long")
    n_bins = b1 - b0 + 1
    guarded = seg.withColumn(
        "_nb",
        F.when(n_bins <= F.lit(max_bins_per_segment), n_bins).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("time_weighted_avg: segment spans "),
                    n_bins.cast("string"),
                    F.lit(f" bins > max_bins_per_segment={max_bins_per_segment}; "
                          "coarsen freq or raise the guard"),
                )
            )
        ),
    )

    b = F.col("_b")
    lo = F.greatest(F.col("_e0"), b * step_us)
    hi = F.least(F.col("_e1"), (b + 1) * step_us)
    dur = (hi - lo).cast("double")
    span = (F.col("_e1") - F.col("_e0")).cast("double")
    # linear value at clip points; contribution = mean of endpoints × dur
    v_at = lambda x: F.col("_v0") + (F.col("_v1") - F.col("_v0")) * (  # noqa: E731
        (x - F.col("_e0")).cast("double") / span
    )
    exploded = (
        guarded.select(
            *keys, "_e0", "_e1", "_v0", "_v1",
            F.explode(F.sequence(b0, b0 + F.col("_nb") - 1)).alias("_b"),
        )
        .select(
            *keys,
            F.col("_b"),
            dur.alias("_dur"),
            (F.col("_v0") * dur).alias("_w_locf"),
            ((v_at(lo) + v_at(hi)) / F.lit(2.0) * dur).alias("_w_lin"),
        )
    )

    return (
        exploded.groupBy(*keys, "_b")
        .agg(
            F.sum("_dur").alias("_cov"),
            F.sum("_w_locf").alias("_sl"),
            F.sum("_w_lin").alias("_sn"),
        )
        .select(
            *keys,
            F.timestamp_micros(F.col("_b") * step_us).alias("bin_ts"),
            (F.col("_cov") / US).alias("covered_s"),
            (F.col("_sl") / F.col("_cov")).alias("twa_locf"),
            (F.col("_sn") / F.col("_cov")).alias("twa_linear"),
        )
    )


def time_in_state(
    points: DataFrame,
    freq: str = "1h",
    keys: tuple[str, ...] = ("doc_id", "source"),
    ts_col: str = "ts",
    state_col: str = "value",
    max_bins_per_segment: int = 100_000,
) -> DataFrame:
    """Duration per (key, bin, STATE): how long each discrete state held
    within each bin, LOCF semantics (a state holds from its observation
    until the next one) — TimescaleDB ``state_agg``'s question ("uptime
    per hour", "seconds in each severity level") answered at the tier
    grain. NULL states are dropped (unknown ≠ a state).

    Output: ``(*keys, bin_ts, state, seconds, frac)`` — ``frac`` is the
    state's share of the bin's COVERED time (uncovered leading/trailing
    time does not dilute, same stance as ``time_weighted_avg``). The last
    observation of a key carries no span (no extrapolation), matching the
    TWA contract.

    Physical shape: the exact ``time_weighted_avg`` plan — one lead
    window, guarded bin explode, one partial-agged groupBy — with the
    state in the grouping key, plus one bin-grain window for the share.
    """
    from pyspark.sql import Window

    from gensor_spark.operators.rollup import TIER_SECONDS

    step_us = (TIER_SECONDS.get(freq) or freq_to_seconds(freq)) * US
    win = Window.partitionBy(*keys).orderBy("_e0")
    seg = (
        points.filter(F.col(state_col).isNotNull())
        .select(
            *keys,
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_e0"),
            F.col(state_col).cast("string").alias("_st"),
        )
        .withColumn("_e1", F.lead("_e0").over(win))
        .filter(F.col("_e1").isNotNull() & (F.col("_e1") > F.col("_e0")))
    )
    b0 = (F.col("_e0") / step_us).cast("long")
    b1 = ((F.col("_e1") - 1) / step_us).cast("long")
    n_bins = b1 - b0 + 1
    guarded = seg.withColumn(
        "_nb",
        F.when(n_bins <= F.lit(max_bins_per_segment), n_bins).otherwise(
            F.raise_error(F.concat(
                F.lit("time_in_state: segment spans "),
                n_bins.cast("string"),
                F.lit(f" bins > max_bins_per_segment={max_bins_per_segment}; "
                      "coarsen freq or raise the guard"),
            ))
        ),
    )
    b = F.col("_b")
    lo = F.greatest(F.col("_e0"), b * step_us)
    hi = F.least(F.col("_e1"), (b + 1) * step_us)
    per_state = (
        guarded.select(
            *keys, "_st",
            F.explode(F.sequence(b0, b0 + F.col("_nb") - 1)).alias("_b"),
            "_e0", "_e1",
        )
        .select(*keys, "_st", "_b", (hi - lo).cast("double").alias("_dur"))
        .groupBy(*keys, "_b", "_st")
        .agg(F.sum("_dur").alias("_us"))
    )
    wbin = Window.partitionBy(*keys, "_b")
    return per_state.select(
        *keys,
        F.timestamp_micros(F.col("_b") * step_us).alias("bin_ts"),
        F.col("_st").alias("state"),
        (F.col("_us") / US).alias("seconds"),
        (F.col("_us") / F.sum("_us").over(wbin)).alias("frac"),
    )
