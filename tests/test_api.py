"""gensor-call-compatible facade (gensor_spark/api.py) vs direct operators.

Each facade verb must be EXACTLY its delegate operator (the operators are
already DuckDB/pandas-oracled; the facade only owes call-surface fidelity),
plus one chained gensor-style workflow exercising the composition.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gensor_spark.api import Dataset

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ds(spark):
    d = Dataset.from_parquet(spark, SF)
    d.df = d.df.cache()
    yield d
    # unpersist on teardown: Spark's CacheManager substitutes cached plans
    # into ANY later query over the same source, which would rewrite the
    # physical plans the plan-guard tests assert on (cross-file pollution)
    d.df.unpersist()


def _same(a, b):
    assert a.schema == b.schema, (a.columns, b.columns)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_filter_and_pop(spark, ds):
    one_src = ds.filter(variable="click")
    assert one_src.df.select("source").distinct().count() == 1
    popped, rest = ds.pop(variable="click")
    _same(popped.df, one_src.df)
    assert popped.df.count() + rest.df.count() == ds.df.count()


def test_loc_iloc(spark, ds):
    sliced = ds.loc("2024-01-02", "2024-01-05")
    lo, hi = sliced.df.selectExpr("min(ts)", "max(ts)").first()
    assert str(lo) >= "2024-01-02" and str(hi) <= "2024-01-05 00:00:00"
    first = ds.iloc(0)
    assert first.df.count() == ds.df.select("doc_id", "source").distinct().count()


def test_iloc_negative_and_post_filter_positions(spark, ds):
    """pandas iloc parity: negative index = from the end of each series,
    and positions are relative to the CURRENT (possibly filtered) view,
    not the original seq ordinals."""
    n_series = ds.df.select("doc_id", "source").distinct().count()
    last = ds.iloc(-1)
    assert last.df.count() == n_series
    # iloc(-1) picks each series' max-ts row
    want = (ds.df.groupBy("doc_id", "source")
            .agg(F.max("ts").alias("ts")))
    got = last.df.select("doc_id", "source", "ts")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # after a filter that removes seq 0, position 0 is the first REMAINING
    # point (pandas semantics), not an empty frame
    trimmed = ds._wrap(ds.df.filter("seq >= 5"))
    head = trimmed.iloc(0)
    assert head.df.count() == trimmed.df.select(
        "doc_id", "source").distinct().count()
    assert head.df.filter("seq <> 5").count() == 0


def test_pop_keeps_null_key_rows_in_rest(spark, ds):
    """A NULL doc_id matches no popped location: it must land in `rest`
    (three-valued ~isin would silently drop it from both halves)."""
    withnull = ds._wrap(ds.df.limit(50).withColumn(
        "doc_id", F.lit(None).cast("string")).unionByName(ds.df))
    loc = ds.df.select("doc_id").first().doc_id
    popped, rest = withnull.pop(location=loc)
    assert popped.df.count() + rest.df.count() == withnull.df.count()
    assert rest.df.filter("doc_id IS NULL").count() == 50
    with pytest.raises(ValueError):
        ds.pop()


def test_resample_named_agg_matches_operator(spark, ds):
    from gensor_spark.operators.resample import resample

    got = ds.resample("1h", agg_func="mean").df
    want = resample(ds.df, "1h", aggs="mean")
    # facade returns the point-view contract; compare values on the bin key
    j = got.join(want.withColumnRenamed("bin_ts", "ts"),
                 ["doc_id", "source", "ts"])
    assert j.filter(~F.col("value").eqNullSafe(F.col("mean"))).count() == 0
    assert got.count() == want.count()


def test_transform_quirks_and_scalers(spark, ds):
    from gensor_spark.operators import transforms as T

    _same(ds.transform("log").df,
          ds.df.withColumn("value", T.log_transform(F.col("value"))))
    _same(ds.transform("standard_scaler").df, T.standard_scaler(ds.df))
    _same(ds.transform("difference").df, T.difference(ds.df))


def test_detect_outliers_remove_and_side_channel(spark, ds):
    from gensor_spark.operators import outliers as O

    out = ds.detect_outliers("zscore", remove=True, threshold=2.5)
    flagged = O.zscore_global(ds.df, threshold=2.5)
    n_out = flagged.filter("is_outlier").count()
    assert n_out > 0
    assert out.outliers.df.count() == n_out
    assert out.df.count() == ds.df.count() - n_out
    # remove=False keeps everything, flags ride the side channel
    kept = ds.detect_outliers("zscore", remove=False, threshold=2.5)
    assert kept.df.count() == ds.df.count()
    assert kept.outliers.df.count() == n_out


def test_mask_smooth_interpolate_chain(spark, ds):
    """A gensor-style chained workflow: filter → smooth → interpolate —
    every step the composition of the (oracled) operators."""
    from gensor_spark.operators.gapfill import interpolate
    from gensor_spark.operators.masking import smooth

    chain = (ds.filter(variable="click")
             .smooth_data(window=5, method="mean")
             .interpolate("linear"))
    direct = interpolate(
        smooth(ds.filter(variable="click").df, window=5,
               method="rolling_mean"),
        method="linear",
    )
    _same(chain.df, direct)


def test_mask_with_modes(spark, ds):
    other = ds.loc("2024-01-02", "2024-01-04")
    kept = ds.mask_with(other, mode="keep").df
    removed = ds.mask_with(other, mode="remove").df
    assert kept.count() + removed.count() == ds.df.count()


def test_add_keep_first(spark, ds):
    shifted = Dataset(ds.df.withColumn("value", F.col("value") + 100.0))
    merged = ds.add(shifted)
    # every (series, ts) present once; the FIRST input's values win
    assert merged.df.count() == ds.df.count()
    assert merged.df.exceptAll(ds.df).count() == 0


def test_info_trend_shapes(spark, ds):
    info = ds.info()
    assert set(info.columns) == {"doc_id", "source", "cnt", "start", "end", "slope"}
    tr = ds.trend()
    assert tr.count() == ds.df.select("doc_id", "source").distinct().count()


def test_analysis_verbs(spark, ds):
    """Round-4 analysis verbs: smoothers return wrapped Datasets with their
    new columns; diagnostics return per-series DataFrames."""
    sm = ds.ewma(alpha=0.4)
    assert "ewma" in sm.df.columns and sm.df.count() == ds.df.count()
    ho = ds.holt(alpha=0.5, beta=0.3)
    assert {"level", "trend"} <= set(ho.df.columns)
    n_series = ds.df.select("doc_id", "source").distinct().count()
    mk = ds.mann_kendall()
    assert set(mk.columns) == {
        "doc_id", "source", "n", "s_stat", "z", "tau", "sen_slope"}
    assert mk.count() == n_series
    cp = ds.changepoint()
    assert cp.count() == n_series
    a = ds.acf(lags=(1, 2)).toPandas()
    assert set(a["lag"]) <= {1, 2} and len(a) > 0
    p = ds.pacf(max_lag=3).toPandas()
    assert set(p["lag"]) <= {1, 2, 3} and len(p) > 0
    de = ds.decompose(period=5)
    assert {"trend", "seasonal", "resid", "phase"} <= set(de.df.columns)
    assert de.df.filter("trend IS NOT NULL").count() > 0
    hw = ds.holt_winters(period=4)
    assert {"level", "trend", "season", "hw_fit"} <= set(hw.df.columns)
    assert hw.df.count() == ds.df.count()
    ks = ds.ks_drift()
    assert set(ks.columns) == {
        "doc_id", "source", "n", "n1", "n2", "ks_d", "ks_stat", "p_asymp"}
    assert ks.count() == n_series
    sim = ds.similar_series(eps=1e9, length=8, band=2)
    assert set(sim.columns) == {"sid_a", "sid_b", "lb", "dtw"}
    assert sim.count() > 0
    ka = ds.kalman(q=0.3)
    assert {"k_filt", "k_smooth", "k_var"} <= set(ka.df.columns)
    assert ka.df.count() == ds.df.count()
    assert ka.df.filter("k_smooth IS NOT NULL").count() > 0


def test_plot_data_methods(spark, ds):
    m4 = ds.plot_data(bins=50, method="m4")
    assert m4.count() > 0
    lttb = ds.plot_data(bins=10, method="lttb")
    assert lttb.count() > 0
    with pytest.raises(ValueError):
        ds.plot_data(method="nope")


def test_to_store_wave(spark, ds, tmp_path):
    from gensor_spark.operators.rollup import finalize_tier, rollup_tier
    from gensor_spark.plans.incremental import TierPipeline

    pipe = TierPipeline(spark, str(tmp_path / "store"), n_batches=2)
    stats = ds.filter(variable="click").to_store(pipe, wave=1)
    assert stats["processed"]
    got = pipe.read_tier("1h").count()
    want = finalize_tier(
        rollup_tier(ds.filter(variable="click").df, "1h")).count()
    assert got == want > 0


def test_locations_contains_one(spark, ds):
    locs = ds.get_locations()
    assert len(locs) > 1 and locs == sorted(locs)
    assert locs[0] in ds
    assert "no-such-location" not in ds
    # the cardinality guard: more distinct series than `limit` must raise
    # with guidance, not silently collect an unbounded list to the driver
    with pytest.raises(ValueError, match="distinct series"):
        ds.get_locations(limit=1)
    assert ds.get_locations(limit=len(locs)) == locs
    assert ds.get_locations(limit=None) == locs
    one = ds.one(location=locs[0], variable="click")
    assert one.df.select("doc_id", "source").distinct().count() == 1
    with pytest.raises(ValueError, match="expected exactly 1"):
        ds.one(variable="click")  # many locations match


def test_detect_outliers_esd_methods(spark, ds):
    """GESD/S-H-ESD through the facade: per-outlier rows become the mask
    split, clean + outliers partition the points exactly."""
    from gensor_spark.operators.esd import gesd_outliers

    out = ds.detect_outliers("gesd", max_anomalies=3, alpha=0.05)
    direct = gesd_outliers(ds.df, max_anomalies=3, alpha=0.05)
    n_out = direct.count()
    assert out.outliers.df.count() == n_out
    assert out.df.count() == ds.df.count() - n_out
    assert out.df.columns == ds.df.columns
    kept = ds.detect_outliers("seasonal_esd", remove=False, period=6,
                              max_anomalies=2)
    assert kept.df.count() == ds.df.count()
    assert kept.outliers.df.count() >= 0  # side channel present
    assert kept.outliers.df.columns == ds.df.columns


def test_shape_and_segment_verbs(spark, ds):
    from gensor_spark.operators.matrixprofile import matrix_profile

    one = ds.one(location=ds.get_locations()[0], variable="click")
    mp = one.matrix_profile(m=8)
    _same(mp, matrix_profile(one.df, m=8))
    d = one.discords(m=8, k=2).toPandas()
    assert len(d) <= 2 and (d["rank"] <= 2).all()
    mo = one.motifs(m=8, k=1).toPandas()
    assert len(mo) <= 1
    q = one.df.orderBy("seq").limit(8).toPandas()["value"].tolist()
    hits = one.find_pattern(q, per_series_k=1).toPandas()
    assert len(hits) == 1 and hits["dist"].iloc[0] < 1e-6

    n_series = ds.df.select("doc_id", "source").distinct().count()
    sx = ds.sax(w=8, alphabet_size=4)
    # series shorter than the word length are skipped by design
    assert 0 < sx.count() <= n_series
    seg = ds.segments(penalty=50.0)
    assert seg.select("doc_id", "source").distinct().count() == n_series
    cps = ds.changepoints(penalty=50.0)
    assert cps.filter("cp_index = -1").count() == n_series
    th = ds.forecast_theta(horizon=3)
    assert th.count() == 3 * n_series


def test_bucketed_roundtrip_facade(spark, ds, tmp_path):
    from gensor_spark.plans.bucketing import is_bucket_satisfied

    ds.save_bucketed("api_bkt", 4, path=str(tmp_path / "b"))
    try:
        back = Dataset.from_bucketed(spark, "api_bkt")
        assert back.df.count() == ds.df.count()
        agg = back.df.groupBy("doc_id", "source").count()
        assert is_bucket_satisfied(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS api_bkt")


def test_spectral_facade(spark, ds):
    from gensor_spark.operators.spectral import spectral_residual

    n_flag = spectral_residual(ds.df, tau=2.0).filter("is_anomaly").count()
    out = ds.detect_outliers("spectral", tau=2.0)
    assert out.outliers.df.count() == n_flag
    assert out.df.count() == ds.df.count() - n_flag
    eps = ds.anomaly_episodes(tau=2.0).toPandas()
    assert len(eps) > 0 and (eps["peak_score"] > 2.0).all()
    assert (eps["end_seq"] >= eps["start_seq"]).all()


def test_period_facade(spark, ds):
    per = ds.period()
    assert set(per.columns) == {
        "doc_id", "source", "period", "power_ratio", "acf_at_period", "n"}
    assert per.count() == ds.df.select("doc_id", "source").distinct().count()


def test_resample_calendar_facade(spark, ds):
    out = ds.resample_calendar("week", ohlc=True)
    assert {"count", "min", "max", "mean", "last", "open"} <= set(out.columns)
    assert out.count() > 0


def test_forecast_segmented_facade(spark, ds):
    n_series = ds.df.select("doc_id", "source").distinct().count()
    fc = ds.forecast_segmented(horizon=2, penalty=100.0)
    assert set(fc.columns) == {"doc_id", "source", "step", "yhat",
                               "segment", "n"}
    assert fc.count() == 2 * n_series
