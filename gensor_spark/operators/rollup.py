"""Retention-tier rollups: 1m → 1h → 1d continuous aggregates.

The north rule requires ``count/min/max/mean/last`` per tier, each coarser
tier derivable from the finer one, and incremental maintenance. The trick is
to materialize **partial states**, not finalized values: mean is carried as
``(sum, cnt)`` (never average-of-averages), and ``last`` is carried with its
timestamp so the cascade can ``max_by`` it. All partials are associative and
commutative, which is also what makes the salted two-phase aggregation and
the incremental merge (plans/incremental.py) correct.

gensor analogue: ``Timeseries.resample`` applied at three frequencies
(``/root/reference/gensor/core/base.py:147-170``) — except gensor recomputes
from raw every call, while these tiers compose: 1h is an 8,640× smaller input
read than the raw points when derived from 1m.

Partial-state schema per (doc_id, source, bin_ts)::

    cnt   bigint   -- non-null point count (pandas .count semantics)
    vmin  double
    vmax  double
    vsum  double
    last  double   -- last non-null value in the bin ...
    last_ts timestamp -- ... and when it occurred (cascade orders by this)

``finalize_tier`` turns partials into the user-facing
``count/min/max/mean/last`` frame.

Skew: one hot series (giant token array / hot doc_id) lands every point in
the same ``(doc_id, source)`` hash bucket. The rollup key includes
``bin_ts`` so cardinality is already high, but a single hot *bin* can still
skew the 1d tier; ``rollup_tier(salt=N)`` splits each key N ways on a
deterministic hash of ``seq`` first (map-side partials stay small), then
merges the N sub-partials — classic salted two-phase aggregation. AQE skew
handling covers the join side; this covers the agg side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.resample import bin_ts, freq_to_seconds

PARTIAL_COLS = ("cnt", "vmin", "vmax", "vsum", "last", "last_ts")

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def rollup_tier(
    points: DataFrame,
    tier: str = "1m",
    keys: tuple[str, ...] = ("doc_id", "source"),
    salt: int = 0,
) -> DataFrame:
    """Aggregate the point view into partial states at ``tier`` granularity."""
    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    v = F.col("value")
    binned = points.withColumn("bin_ts", bin_ts(F.col("ts"), step))

    partials = [
        F.count(v).alias("cnt"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v).alias("vsum"),
        F.max_by(v, F.when(v.isNotNull(), F.col("ts"))).alias("last"),
        F.max(F.when(v.isNotNull(), F.col("ts"))).alias("last_ts"),
    ]

    if salt > 1:
        # two-phase: partial-agg on a salted key, then merge the sub-partials
        salted = binned.withColumn(
            "_salt", F.pmod(F.xxhash64("seq"), F.lit(salt))
        )
        sub = salted.groupBy(*keys, "bin_ts", "_salt").agg(*partials)
        return _merge_partials(sub, [*keys, "bin_ts"])
    return binned.groupBy(*keys, "bin_ts").agg(*partials)


def _merge_partials(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Combine partial states — associative, so safe at any nesting level."""
    return partials.groupBy(*group_cols).agg(
        F.sum("cnt").alias("cnt"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("vsum").alias("vsum"),
        F.max_by("last", F.when(F.col("cnt") > 0, F.col("last_ts"))).alias("last"),
        F.max(F.when(F.col("cnt") > 0, F.col("last_ts"))).alias("last_ts"),
    )


def cascade_tier(
    finer: DataFrame,
    tier: str,
    keys: tuple[str, ...] = ("doc_id", "source"),
) -> DataFrame:
    """Derive a coarser tier from a finer tier's partial states.

    Reads the (much smaller) finer tier instead of raw points — the
    incremental-maintenance property the north rule asks for. Correct because
    every partial is associative; mean in particular is re-derived from
    (vsum, cnt), never averaged across bins.
    """
    step = TIER_SECONDS.get(tier) or freq_to_seconds(tier)
    rebinned = finer.withColumn("bin_ts", bin_ts(F.col("bin_ts"), step))
    return _merge_partials(rebinned, [*keys, "bin_ts"])


def finalize_tier(partials: DataFrame) -> DataFrame:
    """Partial states → user-facing count/min/max/mean/last columns.

    All-null bins (cnt=0) finalize to null aggregates, matching pandas
    ``resample`` NaN semantics for empty/all-NaN bins.
    """
    nz = F.col("cnt") > 0
    return partials.select(
        *[c for c in partials.columns if c not in PARTIAL_COLS],
        F.col("cnt").alias("count"),
        F.when(nz, F.col("vmin")).alias("min"),
        F.when(nz, F.col("vmax")).alias("max"),
        F.when(nz, F.col("vsum") / F.col("cnt")).alias("mean"),
        F.when(nz, F.col("last")).alias("last"),
    )
