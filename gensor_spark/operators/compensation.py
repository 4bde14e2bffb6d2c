"""Barometric compensation: the reference's flagship pipeline, as one DAG.

gensor (``/root/reference/gensor/processing/compensation.py:67-190``):
resample raw + barometric series to an alignment period with mean, subtract
index-aligned, ÷100 (cmH2O→mH2O), dropna, mask fieldwork days to NaN, split
out the out-of-water rows (signed comparison: ``wc < 0 | wc <= cutoff``),
then ``head = water_column + sensor_alt``. gensor loops this per series in
Python (``compensation.py:222-227``); here the loop disappears into the
grouping keys, and the whole thing is one lazy Catalyst plan:

  two rollup aggregates → one inner equi-join on bin timestamp →
  column arithmetic → two `when` masks → split.

The barometric side is one series (or a scalar): the join is a broadcast
join at any scale; a float baro skips the join entirely (lit arithmetic),
exactly like the reference's float path (``compensation.py:106-109``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.resample import resample

KEYS = ("doc_id", "source")


def water_column(
    raw: DataFrame,
    baro: DataFrame | float,
    alignment_period: str = "h",
    threshold_wc: float | None = None,
    fieldwork_dates: list[str] | None = None,
    keys=KEYS,
) -> DataFrame:
    """Barometrically compensated water column (m) with outlier split.

    Returns a frame with ``keys..., bin_ts, water_column, is_outlier`` where
    ``is_outlier`` marks the out-of-water rows gensor moves to ``.outliers``
    (mask, don't delete — callers use split_outliers to reproduce the drop).
    Fieldwork-day rows survive as null gaps, not drops
    (``compensation.py:117-124``).
    """
    # dense=False: the reference's dense NaN bins are dropped by its own
    # .dropna() two lines later, so the grid would be synthesized then thrown
    # away — skip it (same output, one less shuffle)
    raw_rs = resample(raw, alignment_period, aggs="mean", keys=keys, dense=False)

    if isinstance(baro, (int, float)):
        joined = raw_rs.withColumn("_baro", F.lit(float(baro)))
    else:
        # baro is a single reference series: aggregate per bin only, then
        # broadcast — the reference's index-aligned subtraction is an inner
        # equi-join on the bin timestamp
        baro_rs = (
            resample(baro, alignment_period, aggs="mean", keys=(), dense=False)
            .select("bin_ts", F.col("mean").alias("_baro"))
        )
        joined = raw_rs.join(F.broadcast(baro_rs), "bin_ts", "inner")

    wc = (F.col("mean") - F.col("_baro")) / 100.0
    out = joined.select(*keys, "bin_ts", wc.alias("water_column"))
    # pandas .dropna(): bins where either side was empty disappear
    out = out.filter(F.col("water_column").isNotNull())

    if fieldwork_dates:
        days = [d[:10] for d in fieldwork_dates]
        out = out.withColumn(
            "water_column",
            F.when(
                F.date_format("bin_ts", "yyyy-MM-dd").isin(days), F.lit(None)
            ).otherwise(F.col("water_column")),
        )

    cutoff = 0.0 if threshold_wc is None else float(threshold_wc)
    wc_col = F.col("water_column")
    invalid = (wc_col < 0) | (wc_col <= cutoff)  # signed, not abs — base quirk
    return out.withColumn("is_outlier", F.coalesce(invalid, F.lit(False)))


def compensate(
    raw: DataFrame,
    baro: DataFrame | float,
    sensor_alt: DataFrame | float,
    alignment_period: str = "h",
    threshold_wc: float | None = None,
    fieldwork_dates: list[str] | None = None,
    interpolate_method: str | None = None,
    keys=KEYS,
) -> DataFrame:
    """head = water_column + sensor_alt (``compensation.py:155-190``).

    ``sensor_alt`` may be a scalar or a per-series metadata frame
    ``(keys..., sensor_alt)`` — the latter joins broadcast (small dim).
    Optional gap-fill afterwards mirrors ``compensate(interpolate=...)``
    (``compensation.py:216-219``).
    """
    wc = water_column(raw, baro, alignment_period, threshold_wc, fieldwork_dates, keys)
    valid = wc.filter(~F.col("is_outlier")).drop("is_outlier")

    if isinstance(sensor_alt, (int, float)):
        head = valid.withColumn(
            "head", F.col("water_column") + F.lit(float(sensor_alt))
        )
    else:
        head = valid.join(F.broadcast(sensor_alt), list(keys), "inner").withColumn(
            "head", F.col("water_column") + F.col("sensor_alt")
        )
    head = head.drop("water_column", "sensor_alt")

    if interpolate_method:
        from pyspark.sql import Window as W

        from gensor_spark.operators import gapfill

        seqd = head.withColumn(
            "seq",
            F.row_number().over(W.partitionBy(*keys).orderBy("bin_ts")) - F.lit(1),
        ).withColumnRenamed("bin_ts", "ts")
        filled = gapfill.interpolate(
            seqd, method=interpolate_method, keys=keys, value_col="head"
        )
        return filled.withColumnRenamed("ts", "bin_ts").drop("seq")
    return head
