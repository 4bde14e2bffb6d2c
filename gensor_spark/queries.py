"""Headline queries over the driver testdata, paired with DuckDB oracle SQL.

Each entry re-expresses one operator family from SURVEY.md §2 over the
``events`` table (the natural time-series table in the testdata: one series
per ``(user_id, event_type)``), or over ``documents``/``embeddings`` for the
training-data-pipeline operators. The Spark side goes through the engine's
operator modules; the SQL side is plain ANSI for DuckDB.

Comparator contract (driver): row-count + schema + order-insensitive value
hash, columns matched by name. Hence every computed column is aliased
identically on both sides, floats are rounded to 6 decimals on both sides,
and timestamps are serialized to strings on both sides (Spark timestamps are
session-TZ objects, DuckDB's are naive — string form is the stable meeting
point).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gensor_spark.operators.points import events_to_points
from gensor_spark.operators.resample import resample
from gensor_spark.operators.rollup import finalize_tier, rollup_tier
from gensor_spark.sources.tables import load_table

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
TS_FMT_SPARK_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK_US = "%Y-%m-%d %H:%M:%S.%f"

# DuckDB point view: identical to operators/points.events_to_points
_PTS_SQL = """
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         event_type AS source,
         ts,
         value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) - 1 AS seq
  FROM events
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_to_points(load_table(spark, sf_dir, "events"))


def _r6(c):
    return F.round(c, 6)


def _fmt_bin(df: DataFrame) -> DataFrame:
    return df.withColumn("bin_ts", F.date_format("bin_ts", TS_FMT_SPARK))


# --------------------------------------------------------------------------
# tier rollups (SURVEY §2.4; gensor resample core/base.py:147-170)
# --------------------------------------------------------------------------

def _q_rollup(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = finalize_tier(rollup_tier(_points(spark, sf_dir), tier))
        return _fmt_bin(out).select(
            "doc_id",
            "source",
            "bin_ts",
            F.col("count").alias("cnt"),
            _r6(F.col("min")).alias("vmin"),
            _r6(F.col("max")).alias("vmax"),
            _r6(F.col("mean")).alias("vmean"),
            _r6(F.col("last")).alias("vlast"),
        )

    return q


def _sql_rollup(unit: str) -> str:
    return f"""
    WITH pts AS ({_PTS_SQL})
    SELECT doc_id, source,
           strftime(date_trunc('{unit}', ts), '{TS_FMT_DUCK}') AS bin_ts,
           COUNT(value) AS cnt,
           ROUND(MIN(value), 6) AS vmin,
           ROUND(MAX(value), 6) AS vmax,
           ROUND(AVG(value), 6) AS vmean,
           ROUND(arg_max(value, ts) FILTER (WHERE value IS NOT NULL), 6) AS vlast
    FROM pts GROUP BY 1, 2, 3
    """


# --------------------------------------------------------------------------
# dense resample (pandas parity: empty bins materialize as NULL)
# --------------------------------------------------------------------------

def q_resample_15min_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = resample(_points(spark, sf_dir), "15min", aggs=["mean", "count"])
    return _fmt_bin(out).select(
        "doc_id", "source", "bin_ts", _r6(F.col("mean")).alias("vmean"),
        F.coalesce(F.col("count"), F.lit(0)).alias("cnt"),
    )


SQL_RESAMPLE_15MIN = f"""
WITH pts AS ({_PTS_SQL}),
b AS (
  SELECT doc_id, source,
         to_timestamp(floor(epoch(ts) / 900) * 900) AS bin,
         ROUND(AVG(value), 6) AS vmean, COUNT(value) AS cnt
  FROM pts GROUP BY 1, 2, 3
),
s AS (SELECT doc_id, source, MIN(bin) AS lo, MAX(bin) AS hi FROM b GROUP BY 1, 2),
grid AS (
  SELECT s.doc_id, s.source, g.g AS bin
  FROM s, LATERAL (SELECT unnest(generate_series(s.lo::TIMESTAMP, s.hi::TIMESTAMP,
                                                 INTERVAL 15 MINUTE)) AS g) g
)
SELECT grid.doc_id, grid.source,
       strftime(grid.bin, '{TS_FMT_DUCK}') AS bin_ts,
       b.vmean AS vmean, COALESCE(b.cnt, 0) AS cnt
FROM grid LEFT JOIN b
  ON b.doc_id = grid.doc_id AND b.source = grid.source AND b.bin = grid.bin
"""


# --------------------------------------------------------------------------
# coverage / info (gensor Dataset.info dataset.py:229-261, Coverage :664-744)
# --------------------------------------------------------------------------

def q_coverage_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return pts.groupBy("doc_id", "source").agg(
        F.count("value").alias("cnt"),
        F.date_format(F.min("ts"), TS_FMT_SPARK_US).alias("start_ts"),
        F.date_format(F.max("ts"), TS_FMT_SPARK_US).alias("end_ts"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


SQL_COVERAGE_INFO = f"""
WITH pts AS ({_PTS_SQL})
SELECT doc_id, source, COUNT(value) AS cnt,
       strftime(MIN(ts), '{TS_FMT_DUCK_US}') AS start_ts,
       strftime(MAX(ts), '{TS_FMT_DUCK_US}') AS end_ts,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM pts GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# trend: OLS slope/intercept of value vs sample ordinal
# (gensor analysis/stats.py:21-28 — np.polyfit(arange(n), values, 1))
# --------------------------------------------------------------------------

def q_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return pts.groupBy("doc_id", "source").agg(
        _r6(F.regr_slope("value", F.col("seq").cast("double"))).alias("slope"),
        _r6(F.regr_intercept("value", F.col("seq").cast("double"))).alias("intercept"),
    )


SQL_TREND_OLS = f"""
WITH pts AS ({_PTS_SQL})
SELECT doc_id, source,
       ROUND(regr_slope(value, seq), 6) AS slope,
       ROUND(regr_intercept(value, seq), 6) AS intercept
FROM pts GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rollup_1m": _q_rollup("1m"),
    "rollup_1h": _q_rollup("1h"),
    "rollup_1d": _q_rollup("1d"),
    "resample_15min_dense": q_resample_15min_dense,
    "coverage_info": q_coverage_info,
    "trend_ols": q_trend_ols,
}

ORACLES: dict[str, str] = {
    "rollup_1m": _sql_rollup("minute"),
    "rollup_1h": _sql_rollup("hour"),
    "rollup_1d": _sql_rollup("day"),
    "resample_15min_dense": SQL_RESAMPLE_15MIN,
    "coverage_info": SQL_COVERAGE_INFO,
    "trend_ols": SQL_TREND_OLS,
}
