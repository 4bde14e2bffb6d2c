"""Calendar tiers (operators/rollup.py rollup_calendar/cascade_calendar):
month/quarter/year/week bins via date_trunc + the same associative partial
merge — cascaded from the 1d tier, never from raw points. Pinned: cascade ≡
direct (bitwise), pandas monthly-resample parity, DuckDB date_trunc oracle,
week-from-1d correctness, flag carry-through."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.rollup import (
    cascade_calendar,
    finalize_tier,
    rollup_calendar,
    rollup_tier,
)

KEY = ["doc_id", "source", "bin_ts"]


@pytest.fixture(scope="module")
def long_pdf():
    """Multi-month span (the conftest points span only days)."""
    rng = np.random.default_rng(5)
    frames = []
    for d in range(3):
        n = 700
        ts = pd.date_range("2024-01-03", periods=n, freq="5h", tz="UTC")
        vals = rng.normal(50, 8, n)
        vals[rng.random(n) < 0.04] = np.nan
        frames.append(pd.DataFrame({
            "doc_id": f"doc_{d}", "source": f"s{d % 2}",
            "seq": np.arange(n), "ts": ts, "value": vals}))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def long_sdf(spark, long_pdf):
    sdf = spark.createDataFrame(long_pdf).cache()
    yield sdf
    sdf.unpersist()


@pytest.mark.parametrize("unit", ["week", "month", "quarter", "year"])
def test_cascade_from_1d_equals_direct(spark, long_sdf, unit):
    """Every fixed tier ≤ 1d nests in all four calendar units, so the
    cascade must reproduce the direct rollup exactly (same float sums in
    possibly different order — compare at 1e-12; min/max/cnt/first/last
    are order-exact)."""
    direct = (
        finalize_tier(rollup_calendar(long_sdf, unit, with_first=True,
                                      with_sumsq=True))
        .orderBy(*KEY).toPandas().reset_index(drop=True)
    )
    cascaded = (
        finalize_tier(cascade_calendar(
            rollup_tier(long_sdf, "1d", with_first=True, with_sumsq=True),
            unit))
        .orderBy(*KEY).toPandas().reset_index(drop=True)
    )
    assert len(direct) == len(cascaded) > 0
    for col in ("count", "min", "max", "open", "last"):
        pd.testing.assert_series_equal(direct[col], cascaded[col], obj=col)
    for col in ("mean", "std"):
        np.testing.assert_allclose(
            direct[col].to_numpy(float), cascaded[col].to_numpy(float),
            rtol=1e-12, atol=1e-14, err_msg=col)


def test_month_matches_pandas_resample(spark, long_sdf, long_pdf):
    got = (
        finalize_tier(rollup_calendar(long_sdf, "month"))
        .orderBy(*KEY).toPandas().reset_index(drop=True)
    )
    exp = (
        long_pdf.set_index("ts")
        .groupby(["doc_id", "source"])["value"]
        .resample("MS")
        .agg(["count", "min", "max", "mean"])
        .reset_index().rename(columns={"ts": "bin_ts"})
        .sort_values(KEY).reset_index(drop=True)
    )
    exp = exp[exp["count"] > 0].reset_index(drop=True)
    got = got[got["count"] > 0].reset_index(drop=True)
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got["count"], exp["count"])
    for col in ("min", "max", "mean"):
        np.testing.assert_allclose(got[col].to_numpy(float),
                                   exp[col].to_numpy(float),
                                   rtol=1e-12, err_msg=col)


@pytest.mark.parametrize("unit", ["week", "month", "quarter"])
def test_matches_duckdb_date_trunc(spark, long_sdf, long_pdf, unit):
    got = (
        finalize_tier(rollup_calendar(long_sdf, unit, with_first=True))
        .orderBy(*KEY).toPandas().reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pts", long_pdf)
    exp = con.execute(f"""
        SELECT doc_id, source, date_trunc('{unit}', ts) AS bin_ts,
               COUNT(value) AS cnt, MIN(value) AS vmin, MAX(value) AS vmax,
               AVG(value) AS vmean,
               arg_min(value, ts) FILTER (WHERE value IS NOT NULL) AS vopen,
               arg_max(value, ts) FILTER (WHERE value IS NOT NULL) AS vlast
        FROM pts GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(got["count"], exp["cnt"])
    for g, e in (("min", "vmin"), ("max", "vmax"), ("open", "vopen"),
                 ("last", "vlast")):
        np.testing.assert_array_equal(got[g].to_numpy(float),
                                      exp[e].to_numpy(float), err_msg=g)
    np.testing.assert_allclose(got["mean"].to_numpy(float),
                               exp["vmean"].to_numpy(float), rtol=1e-12)


def test_week_straddles_months(spark, long_sdf):
    """The documented nesting caveat: a month-tier cascade to week would be
    WRONG (ISO weeks straddle month boundaries) — demonstrate the grain
    difference is real on this data, and that week-from-1d is what equals
    the direct week rollup (covered by the parametrized cascade test)."""
    from pyspark.sql import functions as F

    wk = long_sdf.select(
        F.date_trunc("week", "ts").alias("w"),
        F.date_trunc("month", F.date_trunc("week", "ts")).alias("m_of_w"),
        F.date_trunc("month", "ts").alias("m"),
    )
    assert wk.filter("m_of_w <> m").count() > 0


def test_validation(spark, long_sdf):
    with pytest.raises(ValueError, match="unit"):
        rollup_calendar(long_sdf, "fortnight")
    with pytest.raises(ValueError, match="unit"):
        cascade_calendar(long_sdf, "1h")


def test_store_calendar_refresh_and_range_router(spark, long_sdf, tmp_path):
    """refresh_calendar materializes the month tier from the stored 1d
    state (equal to the direct calendar rollup), re-folds after new waves,
    and read_range routes a wide-span/small-budget query to it."""
    from gensor_spark.plans.incremental import TierPipeline, read_range

    pipe = TierPipeline(spark, str(tmp_path / "cal_store"), n_batches=2)
    pipe.ingest_points_wave(long_sdf, wave=1)
    n = pipe.refresh_calendar("month")
    got = (pipe.read_tier("month").orderBy(*KEY).toPandas()
           .reset_index(drop=True))
    want = (finalize_tier(rollup_calendar(long_sdf, "month"))
            .orderBy(*KEY).toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert n == len(want)

    # the router: ~5-month span, budget 3 -> month; budget 40 -> 1d
    out, tier = read_range(pipe, "2024-01-01", "2024-06-01", max_points=3)
    assert tier == "month"
    assert out.count() == got[got["bin_ts"] < pd.Timestamp(
        "2024-06-01")].shape[0]
    _, t2 = read_range(pipe, "2024-01-01", "2024-06-01", max_points=40)
    assert t2 == "1d"

    with pytest.raises(ValueError, match="unit"):
        pipe.refresh_calendar("fortnight")


def test_ohlc_facade_matches_pandas(spark, long_sdf, long_pdf):
    from gensor_spark.api import Dataset

    ds = Dataset(long_sdf)
    got = (ds.ohlc("1d").orderBy("doc_id", "source", "bin_ts").toPandas()
           .reset_index(drop=True))
    exp = (
        long_pdf.set_index("ts")
        .groupby(["doc_id", "source"])["value"]
        .resample("1D")
        .ohlc()
        .dropna(how="all")
        .reset_index()
        .rename(columns={"ts": "bin_ts"})
        .sort_values(["doc_id", "source", "bin_ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for col in ("open", "high", "low", "close"):
        np.testing.assert_allclose(got[col].to_numpy(float),
                                   exp[col].to_numpy(float),
                                   rtol=0, atol=0, err_msg=col)


def test_cascade_nesting_enforced(spark, long_sdf):
    """Declared finer units make the nesting rule a hard error: month→week
    (straddles), week→month, and a >1d fixed tier all raise; legal pairs
    pass through."""
    d1 = rollup_tier(long_sdf, "1d")
    # legal: fixed tier into any unit; month into quarter/year
    cascade_calendar(d1, "week", finer_unit="1d")
    m = rollup_calendar(long_sdf, "month")
    cascade_calendar(m, "year", finer_unit="month")
    with pytest.raises(ValueError, match="nest"):
        cascade_calendar(m, "week", finer_unit="month")
    with pytest.raises(ValueError, match="nest"):
        cascade_calendar(rollup_calendar(long_sdf, "week"), "month",
                         finer_unit="week")
    with pytest.raises(ValueError, match="divide"):
        cascade_calendar(d1, "month", finer_unit="25h")
    from gensor_spark.plans.incremental import TierPipeline
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        pipe = TierPipeline(spark, td, n_batches=1)
        pipe.ingest_points_wave(long_sdf, wave=1)
        pipe.refresh_calendar("month")
        with pytest.raises(ValueError, match="nest"):
            pipe.refresh_calendar("week", from_tier="month")
