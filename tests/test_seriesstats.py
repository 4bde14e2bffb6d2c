"""EWMA / series_corr / cusum_changepoint: pandas + DuckDB oracles, plan guards."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.seriesstats import cusum_changepoint, ewma, series_corr

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sensor_points(spark):
    """Real-shaped input: sf0.001 events as (doc_id, source, seq, ts, value)."""
    from gensor_spark.operators.points import events_to_points

    pts = events_to_points(spark.read.parquet(f"{SF}/events.parquet"))
    df = pts.cache()
    yield df
    # see tests/test_api.py ds fixture: cached plans leak into later files'
    # physical plans via the session CacheManager
    df.unpersist()


# ---------------------------------------------------------------- EWMA

@pytest.mark.parametrize("adjust", [True, False])
@pytest.mark.parametrize("alpha", [0.1, 0.5, 0.97])
def test_ewma_matches_pandas(spark, sensor_points, alpha, adjust):
    got = (
        ewma(sensor_points, alpha=alpha, adjust=adjust)
        .select("doc_id", "source", "seq", "ewma")
        .toPandas()
        .sort_values(["doc_id", "source", "seq"])
        .reset_index(drop=True)
    )
    pdf = sensor_points.toPandas().sort_values(["doc_id", "source", "seq"])
    want = (
        pdf.groupby(["doc_id", "source"], sort=False)["value"]
        .transform(lambda s: s.ewm(alpha=alpha, adjust=adjust).mean())
        .to_numpy()
    )
    np.testing.assert_allclose(got["ewma"].to_numpy(), want, rtol=1e-12)


@pytest.mark.parametrize("ignore_na", [True, False])
def test_ewma_nan_semantics(spark, ignore_na):
    vals = [1.0, None, None, 4.0, 2.0, None, 8.0]
    pdf = pd.DataFrame(
        {
            "doc_id": "d", "source": "s",
            "seq": np.arange(len(vals)),
            "ts": pd.date_range("2024-01-01", periods=len(vals), freq="h", tz="UTC"),
            "value": pd.array(vals, dtype=float),
        }
    )
    got = (
        ewma(spark.createDataFrame(pdf), alpha=0.3, adjust=True, ignore_na=ignore_na)
        .orderBy("seq").toPandas()["ewma"].to_numpy()
    )
    want = pdf["value"].ewm(alpha=0.3, adjust=True, ignore_na=ignore_na).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def _ewma_time_loop(vals, ts_sec, hl):
    """Independent recursion (the operator itself delegates to pandas, so
    the oracle must NOT): num/den decay by 0.5**(dt/hl); NaN contributes
    nothing but ages the state by its gap."""
    num = den = 0.0
    prev_t = None
    out = []
    for v, t in zip(vals, ts_sec):
        decay = 0.5 ** ((t - prev_t) / hl) if prev_t is not None else 1.0
        num *= decay
        den *= decay
        prev_t = t
        if not np.isnan(v):
            num += v
            den += 1.0
        out.append(num / den if den > 0 else np.nan)
    return np.array(out)


def test_ewma_halflife_matches_independent_loop(spark, sensor_points):
    from gensor_spark.operators.seriesstats import ewma_halflife

    hl = 1800.0
    got = (ewma_halflife(sensor_points, halflife_seconds=hl)
           .select("doc_id", "source", "ts", "ewma_t").toPandas()
           .sort_values(["doc_id", "source", "ts"]))
    pdf = (sensor_points.toPandas()
           .sort_values(["doc_id", "source", "ts"]))
    for (d, s), g in pdf.groupby(["doc_id", "source"], sort=False):
        want = _ewma_time_loop(
            g["value"].to_numpy(dtype=float),
            g["ts"].astype("int64").to_numpy() / 1e9, hl)
        sub = got[(got.doc_id == d) & (got.source == s)]
        np.testing.assert_allclose(sub["ewma_t"].to_numpy(), want,
                                   rtol=1e-9, equal_nan=True)


def test_ewma_halflife_even_spacing_equals_positional(spark):
    # equal Δt ⇒ time-aware EWMA == positional ewm(alpha=1-0.5^(Δ/h),
    # adjust=True): the sharp cross-check tying both kernels together
    from gensor_spark.operators.seriesstats import ewma_halflife

    rng = np.random.default_rng(5)
    n, step, hl = 60, 600.0, 1800.0
    v = rng.normal(0, 1, n)
    ts = pd.date_range("2024-01-01", periods=n, freq="10min", tz="UTC")
    pts = spark.createDataFrame(
        pd.DataFrame({"doc_id": "a", "source": "s", "seq": range(n),
                      "ts": ts, "value": v}))
    got = (ewma_halflife(pts, halflife_seconds=hl)
           .toPandas().sort_values("ts")["ewma_t"].to_numpy())
    alpha = 1.0 - 0.5 ** (step / hl)
    want = pd.Series(v).ewm(alpha=alpha, adjust=True).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12)
    with pytest.raises(ValueError):
        ewma_halflife(pts, halflife_seconds=0.0)


def test_ewma_rejects_bad_alpha(spark, sensor_points):
    with pytest.raises(ValueError, match="alpha"):
        ewma(sensor_points, alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma(sensor_points, alpha=1.5)


# ---------------------------------------------------------------- series_corr

def test_series_corr_matches_duckdb(spark, sensor_points):
    got = series_corr(sensor_points, bin="day", min_overlap=5).toPandas()
    con = duckdb.connect()
    con.register("p", sensor_points.toPandas())
    want = con.execute("""
        WITH binned AS (
          SELECT doc_id || '|' || source AS sid,
                 date_trunc('day', ts) AS bin_ts,
                 avg(value) AS v
          FROM p GROUP BY 1, 2
        )
        SELECT a.sid AS sid_a, b.sid AS sid_b,
               count(*) AS n_overlap, corr(a.v, b.v) AS corr
        FROM binned a JOIN binned b ON a.bin_ts = b.bin_ts AND a.sid < b.sid
        GROUP BY 1, 2 HAVING count(*) >= 5
    """).df()
    got_s = got.sort_values(["sid_a", "sid_b"]).reset_index(drop=True)
    want_s = want.sort_values(["sid_a", "sid_b"]).reset_index(drop=True)
    assert len(got_s) == len(want_s) > 0
    assert (got_s["sid_a"] == want_s["sid_a"]).all()
    assert (got_s["sid_b"] == want_s["sid_b"]).all()
    np.testing.assert_array_equal(
        got_s["n_overlap"].to_numpy(dtype=np.int64), want_s["n_overlap"].to_numpy(dtype=np.int64)
    )
    # corr: same statistic, different partial-agg order → tight rtol not ulp
    np.testing.assert_allclose(
        got_s["corr"].to_numpy(dtype=float), want_s["corr"].to_numpy(dtype=float),
        rtol=1e-9, atol=1e-12,
    )


def test_series_corr_known_values(spark):
    """Two perfectly correlated, one anti-correlated series on a shared grid."""
    ts = pd.date_range("2024-01-01", periods=20, freq="h", tz="UTC")
    x = np.arange(20, dtype=float)
    frames = []
    for doc, vals in (("a", x), ("b", 3 * x + 7), ("c", -x)):
        frames.append(pd.DataFrame({
            "doc_id": doc, "source": "s", "seq": np.arange(20), "ts": ts, "value": vals,
        }))
    pts = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    out = {(r.sid_a, r.sid_b): r for r in series_corr(pts, bin="hour").collect()}
    assert out[("a|s", "b|s")].corr == pytest.approx(1.0)
    assert out[("a|s", "c|s")].corr == pytest.approx(-1.0)
    assert out[("b|s", "c|s")].corr == pytest.approx(-1.0)
    assert all(r.n_overlap == 20 for r in out.values())


def test_series_corr_plan_no_cartesian(spark, sensor_points):
    plan = series_corr(sensor_points)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ cusum_changepoint

def test_cusum_matches_duckdb(spark, sensor_points):
    got = cusum_changepoint(sensor_points).toPandas()
    con = duckdb.connect()
    con.register("p", sensor_points.toPandas())
    want = con.execute("""
        WITH m AS (
          SELECT doc_id, source, seq,
                 value - avg(value) OVER (PARTITION BY doc_id, source) AS dev
          FROM p
        ),
        c AS (
          SELECT doc_id, source, seq,
                 sum(dev) OVER (PARTITION BY doc_id, source ORDER BY seq
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
          FROM m
        )
        SELECT doc_id, source, count(*) AS n,
               min(CASE WHEN rn = 1 THEN seq END) AS cp_seq,
               max(abs(cu)) AS cusum_absmax,
               max(cu) - min(cu) AS cusum_range
        FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id, source
                                       ORDER BY abs(cu) DESC, seq ASC) AS rn
          FROM c
        ) GROUP BY doc_id, source
    """).df()
    k = ["doc_id", "source"]
    got_s = got.sort_values(k).reset_index(drop=True)
    want_s = want.sort_values(k).reset_index(drop=True)
    assert len(got_s) == len(want_s) > 0
    for c in k + ["n", "cp_seq"]:
        np.testing.assert_array_equal(got_s[c].to_numpy(), want_s[c].to_numpy())
    for c in ("cusum_absmax", "cusum_range"):
        np.testing.assert_allclose(
            got_s[c].to_numpy(dtype=float), want_s[c].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-9,
        )


def test_cusum_finds_a_step(spark):
    """A clean level shift: the argmax of |CUSUM| is the last pre-shift row."""
    vals = [0.0] * 50 + [10.0] * 50
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": np.arange(100),
        "ts": pd.date_range("2024-01-01", periods=100, freq="h", tz="UTC"),
        "value": vals,
    })
    row = cusum_changepoint(spark.createDataFrame(pdf)).collect()[0]
    assert row.cp_seq == 49
    assert row.cusum_absmax == pytest.approx(50 * 5.0)  # 50 rows × |0 − mean(5)|
    # constant series → zero evidence
    flat = pdf.assign(value=3.14)
    row0 = cusum_changepoint(spark.createDataFrame(flat)).collect()[0]
    assert row0.cusum_range == pytest.approx(0.0, abs=1e-9)


def test_cusum_plan_stays_jvm_side(spark, sensor_points):
    plan = cusum_changepoint(sensor_points)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ------------------------------------------------- registry entries (no driver slot)

def test_registry_series_corr_matches_duckdb(spark):
    """q_series_corr (method-tagged union: top-100 day-bin pair corr +
    per-series ACF at lags 1,2,3,5,10 + rolling corr of the top-2 pair)
    vs the registry's own DuckDB oracle."""
    from gensor_spark.queries import ORACLES, q_series_corr

    # bin_ts is needed for a total order: rollcorr rows share
    # (method, sid_a, sid_b, lag) and differ only by window end bin
    order = ["method", "sid_a", "sid_b", "lag", "bin_ts"]
    got = (
        q_series_corr(spark, SF).toPandas()
        .sort_values(order).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = (
        con.execute(ORACLES["series_corr"]).df()
        .sort_values(order).reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for m in ("pair", "acf", "ccf", "rollcorr"):
        assert (got["method"] == m).any(), m
    for c in ("method", "sid_a", "sid_b", "lag", "bin_ts"):
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy())
    np.testing.assert_array_equal(
        got["n"].to_numpy(dtype=np.int64), want["n"].to_numpy(dtype=np.int64))
    np.testing.assert_allclose(
        got["r"].to_numpy(dtype=float), want["r"].to_numpy(dtype=float),
        atol=2e-6)


# ---------------------------------------------------------------- CCF

def test_ccf_recovers_known_lead(spark):
    """b is exactly a shifted one day later -> ccf(a,b) peaks at lag=+1
    with r=1 (a leads b); the mirrored lag carries distinct information."""
    from gensor_spark.operators.seriesstats import ccf

    days = pd.date_range("2024-01-01", periods=40, freq="D", tz="UTC")
    vals = np.sin(np.arange(40) * 2.0)  # decorrelates off the true lag
    rows = [("a", "x", t.to_pydatetime(), float(v))
            for t, v in zip(days, vals)]
    rows += [("b", "x", (t + pd.Timedelta(days=1)).to_pydatetime(), float(v))
             for t, v in zip(days, vals)]
    df = spark.createDataFrame(rows, "doc_id string, source string, ts timestamp, value double")
    got = {(r.sid_a, r.sid_b, r.lag): (r.n_overlap, r["corr"])
           for r in ccf(df, lags=(-1, 1, 2), bin="day").collect()}
    n1, r1 = got[("a|x", "b|x", 1)]
    assert n1 == 40 and r1 == pytest.approx(1.0, abs=1e-12)
    # off the true lag the aligned pairs are one waveform step apart —
    # corr ~= cos(2) ~= -0.42 for this waveform
    assert got[("a|x", "b|x", 2)][1] < 0.5
    assert got[("a|x", "b|x", -1)][1] < 0.5


def test_ccf_guards(spark, sensor_points):
    from gensor_spark.operators.seriesstats import ccf

    for bad in ((), (0,), (1, 1)):
        with pytest.raises(ValueError):
            ccf(sensor_points, lags=bad)
    with pytest.raises(ValueError):
        ccf(sensor_points, bin="week")


# ---------------------------------------------------------------- ACF

def test_acf_matches_pandas(spark, sensor_points):
    """acf == pandas Series.autocorr(k) per series (corr over complete
    pairs), including short-series fallout: a series with no complete pair
    at lag k simply has no row."""
    from gensor_spark.operators.seriesstats import acf

    lags = (1, 2, 5)
    got = acf(sensor_points, lags=lags).toPandas()
    got_ix = got.set_index(["doc_id", "source", "lag"]).sort_index()
    pdf = sensor_points.toPandas().sort_values(["doc_id", "source", "seq"])
    checked = 0
    for (d, s), g in pdf.groupby(["doc_id", "source"]):
        v = g["value"].reset_index(drop=True)
        for k in lags:
            pairs = pd.DataFrame({"a": v, "b": v.shift(k)}).dropna()
            key = (d, s, k)
            if len(pairs) == 0:
                assert key not in got_ix.index
                continue
            row = got_ix.loc[key]
            assert int(row["n_pairs"]) == len(pairs)
            want = v.autocorr(lag=k)
            have = float(row["acf"])
            if np.isnan(want):
                assert np.isnan(have)
            else:
                np.testing.assert_allclose(have, want, rtol=1e-9)
            checked += 1
    assert checked > 0


def test_acf_rejects_bad_lags(spark, sensor_points):
    from gensor_spark.operators.seriesstats import acf

    with pytest.raises(ValueError):
        acf(sensor_points, lags=())
    with pytest.raises(ValueError):
        acf(sensor_points, lags=(1, 0))


def test_registry_ewma_and_cusum_smoke(spark):
    from gensor_spark.queries import q_cusum_changepoint, q_ewma_smooth

    e = q_ewma_smooth(spark, SF)
    assert e.columns == ["doc_id", "source", "seq", "sm", "smt"]
    c = q_cusum_changepoint(spark, SF)
    assert c.columns == [
        "method", "doc_id", "source", "n", "stat_i", "stat_x", "stat_y"]
    cm = {r[0] for r in c.select("method").distinct().collect()}
    assert cm == {"cusum", "mk", "ks", "rate"}
    assert e.count() > 0 and c.count() > 0


# ---------------------------------------------------------------- Holt / PACF

def _holt_loop(x, alpha, beta):
    """Independent loop reference for Holt's linear method."""
    lv, tr = [], []
    obs = [v for v in x if v == v]
    b0 = obs[1] - obs[0] if len(obs) >= 2 else 0.0
    l = b = None
    for v in x:
        if v != v:
            lv.append(float("nan")); tr.append(float("nan"))
            continue
        if l is None:
            l, b = v, b0
        else:
            pl = l
            l = alpha * v + (1 - alpha) * (l + b)
            b = beta * (l - pl) + (1 - beta) * b
        lv.append(l); tr.append(b)
    return lv, tr


def test_holt_matches_loop_reference(spark):
    from gensor_spark.operators.seriesstats import holt_smooth

    rng = np.random.default_rng(11)
    rows, ref = [], {}
    for d in range(6):
        n = int(rng.integers(1, 40))
        vals = rng.normal(0, 1, n).cumsum()
        vals[rng.random(n) < 0.15] = np.nan
        ref[str(d)] = _holt_loop(vals.tolist(), 0.4, 0.2)
        rows += [(str(d), "s", i, None if v != v else float(v))
                 for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    got = holt_smooth(df, alpha=0.4, beta=0.2).toPandas().sort_values(
        ["doc_id", "seq"])
    for d, (lv, tr) in ref.items():
        g = got[got.doc_id == d]
        np.testing.assert_allclose(g["level"].to_numpy(), lv, rtol=1e-12)
        np.testing.assert_allclose(g["trend"].to_numpy(), tr, rtol=1e-12)


def test_holt_tracks_linear_ramp_exactly(spark):
    """On x_t = c + m*t Holt is EXACT (level == x, trend == m) for any
    alpha/beta — the invariant EWMA provably cannot meet (it lags a ramp)."""
    from gensor_spark.operators.seriesstats import ewma, holt_smooth

    rows = [("r", "s", i, 3.0 + 0.7 * i) for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    g = holt_smooth(df, alpha=0.3, beta=0.6).toPandas().sort_values("seq")
    np.testing.assert_allclose(
        g["level"].to_numpy(), g["value"].to_numpy(), rtol=1e-12)
    np.testing.assert_allclose(g["trend"].to_numpy(), 0.7, rtol=1e-12)
    e = ewma(df, alpha=0.3).toPandas().sort_values("seq")
    assert (e["ewma"].to_numpy()[10:] < e["value"].to_numpy()[10:] - 0.5).all()


def test_holt_rejects_bad_params(spark):
    from gensor_spark.operators.seriesstats import holt_smooth

    df = spark.createDataFrame(
        [("a", "s", 0, 1.0)], "doc_id string, source string, seq int, value double")
    for a, b in ((0.0, 0.5), (0.5, 1.2), (-1, 0.5)):
        with pytest.raises(ValueError):
            holt_smooth(df, alpha=a, beta=b)
    with pytest.raises(ValueError):
        holt_smooth(df.withColumnRenamed("value", "level")
                    .withColumnRenamed("seq", "value").withColumn(
                        "seq", F.lit(0)), alpha=0.5, beta=0.5)


def _pacf_yule_walker(x, max_lag):
    """Independent PACF reference: solve the Yule-Walker system per k."""
    x = np.asarray(x, float)
    x = x[~np.isnan(x)]
    n = len(x)
    xc = x - x.mean()
    denom = xc @ xc
    kmax = min(max_lag, n - 1)
    rho = np.array([xc[k:] @ xc[:-k] / denom for k in range(1, kmax + 1)])
    full = np.concatenate([[1.0], rho])
    out = np.full(max_lag, np.nan)
    for k in range(1, kmax + 1):
        R = np.array([[full[abs(i - j)] for j in range(k)] for i in range(k)])
        phi = np.linalg.solve(R, rho[:k])
        out[k - 1] = phi[-1]
    return out


def test_pacf_matches_yule_walker_solve(spark):
    from gensor_spark.operators.seriesstats import pacf

    rng = np.random.default_rng(23)
    rows, ref = [], {}
    for d in range(5):
        n = int(rng.integers(20, 120))
        # AR(2)-ish series so higher-lag pacf is non-trivial
        e = rng.normal(0, 1, n)
        v = np.zeros(n)
        for i in range(n):
            v[i] = 0.6 * v[i - 1] - 0.3 * v[i - 2] + e[i] if i >= 2 else e[i]
        ref[str(d)] = _pacf_yule_walker(v, 8)
        rows += [(str(d), "s", i, float(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    got = pacf(df, max_lag=8).toPandas()
    for d, want in ref.items():
        g = got[got.doc_id == d].sort_values("lag")
        ok = ~np.isnan(want)
        assert list(g["lag"]) == list(np.arange(1, 9)[ok])
        np.testing.assert_allclose(
            g["pacf"].to_numpy(), want[ok], rtol=1e-9, atol=1e-12)


def test_pacf_ar1_cutoff(spark):
    """AR(1): pacf(1) ~= the AR coefficient, pacf(k>=2) ~= 0."""
    from gensor_spark.operators.seriesstats import pacf

    rng = np.random.default_rng(5)
    n = 4000
    v = np.zeros(n)
    e = rng.normal(0, 1, n)
    for i in range(1, n):
        v[i] = 0.75 * v[i - 1] + e[i]
    df = spark.createDataFrame(
        [("a", "s", i, float(x)) for i, x in enumerate(v)],
        "doc_id string, source string, seq int, value double")
    g = pacf(df, max_lag=5).toPandas().sort_values("lag")
    assert abs(g["pacf"].iloc[0] - 0.75) < 0.05
    assert (np.abs(g["pacf"].iloc[1:].to_numpy()) < 0.06).all()


# ---------------------------------------------------------------- Mann-Kendall

def _mk_loop(x):
    """Brute-force loop reference for the MK statistics + Sen's slope."""
    import math
    from collections import Counter

    obs = [(i, v) for i, v in enumerate(x) if v == v]  # drop NaN, keep pos
    n = len(obs)
    s = sum(
        (0 if obs[j][1] == obs[i][1] else (1 if obs[j][1] > obs[i][1] else -1))
        for i in range(n) for j in range(i + 1, n)
    )
    if n < 2:
        return n, 0, None, None, None
    slopes = [
        (obs[j][1] - obs[i][1]) / (obs[j][0] - obs[i][0])
        for i in range(n) for j in range(i + 1, n)
    ]
    sen = float(np.median(slopes))
    ties = Counter(v for _, v in obs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    tau = s / (0.5 * n * (n - 1))
    return n, s, z, tau, sen


def test_mann_kendall_randomized_vs_loop(spark):
    """Exact S/z/tau parity with a brute-force pair loop on randomized
    series with heavy ties and NaNs, crossing the kernel's block boundary."""
    from gensor_spark.operators.seriesstats import mann_kendall

    rng = np.random.default_rng(7)
    rows, expect = [], {}
    for d in range(12):
        n = int(rng.integers(0, 60)) if d < 10 else 5000  # past block=4096
        vals = rng.integers(0, 6, size=n).astype(float)   # heavy ties
        vals[rng.random(n) < 0.1] = np.nan
        expect[str(d)] = _mk_loop(vals.tolist())
        rows += [(str(d), "s", i, None if v != v else float(v))
                 for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    got = {r.doc_id: r for r in mann_kendall(df).collect()}
    checked = 0
    for d, (n, s, z, tau, sen) in expect.items():
        if n == 0:
            # empty series never reaches the kernel (no rows at all) unless
            # it had NaN-only rows; either way a row may exist with n=0
            if d in got:
                assert got[d].n == 0
            continue
        r = got[d]
        assert (r.n, r.s_stat) == (n, s), d
        if z is None:
            assert r.z is None and r.tau is None and r.sen_slope is None
        else:
            np.testing.assert_allclose(
                [r.z, r.tau, r.sen_slope], [z, tau, sen], rtol=1e-12)
        checked += 1
    assert checked >= 10


def test_mann_kendall_directions(spark):
    """Monotone up -> tau=1 and z>0; constant -> S=0, z=0."""
    from gensor_spark.operators.seriesstats import mann_kendall

    up = [("u", "s", i, float(i)) for i in range(30)]
    flat = [("f", "s", i, 2.5) for i in range(30)]
    df = spark.createDataFrame(
        up + flat, "doc_id string, source string, seq int, value double")
    got = {r.doc_id: r for r in mann_kendall(df).collect()}
    assert got["u"].tau == pytest.approx(1.0)
    assert got["u"].s_stat == 30 * 29 // 2 and got["u"].z > 5
    assert got["u"].sen_slope == pytest.approx(1.0, abs=1e-12)
    assert got["f"].s_stat == 0 and got["f"].z == 0.0
    assert got["f"].sen_slope == pytest.approx(0.0, abs=1e-12)


# ------------------------------------------------------ seasonal_decompose

def _ref_decompose(x, period):
    """Loop reference for the classic additive decomposition."""
    x = np.asarray(x, float)
    n = len(x)
    trend = np.full(n, np.nan)
    half = period // 2
    for i in range(n):
        if period % 2:
            lo, hi = i - half, i + half + 1
            if lo >= 0 and hi <= n and not np.isnan(x[lo:hi]).any():
                trend[i] = x[lo:hi].mean()
        else:
            lo1, hi1 = i - half, i + half
            lo2, hi2 = i - half + 1, i + half + 1
            if lo1 >= 0 and hi2 <= n and not np.isnan(x[lo1:hi2]).any():
                trend[i] = (x[lo1:hi1].mean() + x[lo2:hi2].mean()) / 2.0
    det = x - trend
    phases = np.arange(n) % period
    pm = np.full(n, np.nan)
    means = {}
    for j in set(phases.tolist()):
        vals = det[phases == j]
        means[j] = np.nanmean(vals) if (~np.isnan(vals)).any() else np.nan
        pm[phases == j] = means[j]
    obs = [means[j] for j in sorted(means) if not np.isnan(means[j])]
    phbar = np.mean(obs) if obs else np.nan
    seasonal = pm - phbar
    return trend, seasonal, x - trend - seasonal


@pytest.mark.parametrize("period", [5, 6])
def test_seasonal_decompose_vs_loop(spark, period):
    from gensor_spark.operators.seriesstats import seasonal_decompose

    rng = np.random.default_rng(17)
    rows, ref = [], {}
    for d in range(4):
        n = int(rng.integers(3, 80))
        vals = rng.normal(0, 1, n)
        vals[rng.random(n) < 0.1] = np.nan
        ref[str(d)] = _ref_decompose(vals, period)
        rows += [(str(d), "s", i, None if v != v else float(v))
                 for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    got = seasonal_decompose(df, period=period).toPandas().sort_values(
        ["doc_id", "seq"])
    for d, (tr, se, re_) in ref.items():
        g = got[got.doc_id == d]
        for col, want in (("trend", tr), ("seasonal", se), ("resid", re_)):
            have = g[col].to_numpy(dtype=float)
            np.testing.assert_allclose(have, want, rtol=1e-9, atol=1e-12,
                                       equal_nan=True, err_msg=f"{d}/{col}")


@pytest.mark.parametrize("period", [7, 8])
def test_seasonal_decompose_exact_recovery(spark, period):
    """Linear trend + zero-sum seasonal is recovered EXACTLY in the
    interior (centered MA of a line is the line; a full cycle of the
    seasonal averages to zero)."""
    from gensor_spark.operators.seriesstats import seasonal_decompose

    n = 6 * period
    season = np.arange(period, dtype=float)
    season -= season.mean()
    x = 2.0 + 0.5 * np.arange(n) + season[np.arange(n) % period]
    df = spark.createDataFrame(
        [("a", "s", i, float(v)) for i, v in enumerate(x)],
        "doc_id string, source string, seq int, value double")
    g = seasonal_decompose(df, period=period).toPandas().sort_values("seq")
    interior = g["trend"].notna().to_numpy()
    assert interior.sum() == n - 2 * (period // 2)
    np.testing.assert_allclose(
        g["trend"].to_numpy()[interior],
        (2.0 + 0.5 * np.arange(n))[interior], rtol=1e-12)
    np.testing.assert_allclose(
        g["seasonal"].to_numpy(), season[np.arange(n) % period], atol=1e-9)
    np.testing.assert_allclose(
        g["resid"].to_numpy()[interior], 0.0, atol=1e-9)


def test_seasonal_decompose_matches_duckdb_windows(spark, sensor_points):
    """The same decomposition written as DuckDB window SQL (the oracle
    formulation) on real-shaped input, odd period."""
    import duckdb

    from gensor_spark.operators.seriesstats import seasonal_decompose

    got = (
        seasonal_decompose(sensor_points, period=5)
        .select("doc_id", "source", "seq", "trend", "seasonal", "resid")
        .toPandas().sort_values(["doc_id", "source", "seq"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(f"""
        WITH p AS (
          SELECT user_id::VARCHAR AS doc_id, event_type AS source, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) - 1 AS seq
          FROM read_parquet('{SF}/events.parquet')
        ),
        t AS (SELECT *, seq % 5 AS phase,
                     CASE WHEN count(value) OVER w = 5
                          THEN avg(value) OVER w END AS trend
              FROM p
              WINDOW w AS (PARTITION BY doc_id, source ORDER BY seq
                           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        s AS (SELECT *, avg(value - trend) OVER pw AS pm,
                     row_number() OVER (PARTITION BY doc_id, source, phase
                                        ORDER BY seq) = 1 AS rep
              FROM t
              WINDOW pw AS (PARTITION BY doc_id, source, phase)),
        c AS (SELECT *, avg(CASE WHEN rep THEN pm END)
                          OVER (PARTITION BY doc_id, source) AS phbar
              FROM s)
        SELECT doc_id, source, seq, trend,
               pm - phbar AS seasonal,
               value - trend - (pm - phbar) AS resid
        FROM c ORDER BY doc_id, source, seq
    """).df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    for col in ("trend", "seasonal", "resid"):
        np.testing.assert_allclose(
            got[col].to_numpy(dtype=float), want[col].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-12, equal_nan=True)


def test_seasonal_decompose_rejects_bad_period(spark, sensor_points):
    from gensor_spark.operators.seriesstats import seasonal_decompose

    with pytest.raises(ValueError):
        seasonal_decompose(sensor_points, period=1)


# ------------------------------------------------------------ seasonal_anomaly

def test_seasonal_anomaly_matches_duckdb(spark, sensor_points):
    from gensor_spark.operators.seriesstats import seasonal_anomaly

    got = (
        seasonal_anomaly(sensor_points, period="hour_of_day", n_sigma=2.0, min_bucket=5)
        .select("doc_id", "source", "seq", "phase", "season_z", "is_anomaly")
        .toPandas().sort_values(["doc_id", "source", "seq"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", sensor_points.toPandas())
    want = con.execute("""
        SELECT doc_id, source, seq, hour(ts) AS phase,
               CASE WHEN count(value) OVER w >= 5 AND stddev_samp(value) OVER w > 0
                    THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
               END AS season_z
        FROM p
        WINDOW w AS (PARTITION BY doc_id, source, hour(ts))
        ORDER BY doc_id, source, seq
    """).df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    np.testing.assert_array_equal(got["phase"].to_numpy(np.int64), want["phase"].to_numpy(np.int64))
    gz, wz = got["season_z"].to_numpy(float), want["season_z"].to_numpy(float)
    assert np.array_equal(np.isnan(gz), np.isnan(wz))
    m = ~np.isnan(gz)
    np.testing.assert_allclose(gz[m], wz[m], rtol=1e-9, atol=1e-12)
    # flag agrees with the z it was derived from; NULL z never flags
    flagged = got["is_anomaly"].to_numpy(bool)
    assert np.array_equal(flagged, np.nan_to_num(np.abs(gz)) > 2.0)


def test_seasonal_anomaly_sees_phase_local_outlier(spark):
    """A value normal globally but wild for ITS hour must flag; the same
    value at an hour where it is typical must not."""
    import pandas as pd

    # 30 days, hourly: value = hour (perfect daily cycle), plus one 3am
    # reading of 12.0 — dead average globally, 9 sigma for 3am
    ts = pd.date_range("2024-01-01", periods=30 * 24, freq="h", tz="UTC")
    vals = np.array([t.hour for t in ts], dtype=float)
    vals += np.linspace(0, 0.9, vals.size) % 0.1  # tiny jitter: nonzero spread
    pdf = pd.DataFrame({"doc_id": "d", "source": "s",
                        "seq": np.arange(vals.size), "ts": ts, "value": vals})
    pdf.loc[(pdf.seq == 3 + 24 * 10), "value"] = 12.0  # a 3am spike
    from gensor_spark.operators.seriesstats import seasonal_anomaly

    out = seasonal_anomaly(spark.createDataFrame(pdf), n_sigma=3.0).toPandas()
    hit = out[out.is_anomaly]
    assert list(hit["seq"]) == [3 + 24 * 10]
    # global z-score CANNOT see it: |12 - mean(~11.5)| << global std (~6.9)
    g = (12.0 - pdf.value.mean()) / pdf.value.std()
    assert abs(g) < 0.2


def test_seasonal_anomaly_guards(spark, sensor_points):
    from gensor_spark.operators.seriesstats import seasonal_anomaly

    with pytest.raises(ValueError, match="period"):
        seasonal_anomaly(sensor_points, period="fortnight")
    plan = seasonal_anomaly(sensor_points)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    ex = plan.count("Exchange")
    assert ex <= 2, f"expected a single shuffle (+AQE read), saw {ex} Exchanges"


# ------------------------------------------- randomized property sweeps

def test_cusum_randomized_vs_numpy_loop(spark):
    """Random irregular multi-series input with engineered |C| ties: the
    operator must agree with a loop-wise numpy reference on every field."""
    import pandas as pd

    rng = np.random.default_rng(23)
    frames = []
    for d in range(12):
        n = int(rng.integers(2, 120))
        vals = rng.choice([-1.0, 0.0, 1.0, 2.5], size=n)  # discrete → ties
        frames.append(pd.DataFrame({
            "doc_id": f"d{d}", "source": rng.choice(["s1", "s2"]),
            "seq": np.arange(n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="min", tz="UTC"),
            "value": vals,
        }))
    pdf = pd.concat(frames, ignore_index=True)
    got = {(r.doc_id, r.source): r
           for r in cusum_changepoint(spark.createDataFrame(pdf)).collect()}
    for (d, s), g in pdf.groupby(["doc_id", "source"]):
        x = g.sort_values("seq")["value"].to_numpy()
        c = np.cumsum(x - x.mean())
        absc = np.abs(c)
        want_cp = int(np.argmax(absc))  # first max = earliest seq
        r = got[(d, s)]
        assert r.n == x.size
        assert r.cp_seq == want_cp, (d, s)
        np.testing.assert_allclose(r.cusum_absmax, absc.max(), rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(r.cusum_range, c.max() - c.min(), rtol=1e-9, atol=1e-9)


def test_cusum_drops_null_values(spark):
    import pandas as pd

    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": np.arange(6),
        "ts": pd.date_range("2024-01-01", periods=6, freq="h", tz="UTC"),
        "value": [1.0, None, 1.0, 5.0, None, 5.0],
    })
    row = cusum_changepoint(spark.createDataFrame(pdf)).collect()[0]
    x = np.array([1.0, 1.0, 5.0, 5.0])
    c = np.cumsum(x - x.mean())
    assert row.n == 4
    # argmax over the non-null sequence maps back to original seq 2
    assert row.cp_seq == 2
    np.testing.assert_allclose(row.cusum_absmax, np.abs(c).max())


def test_ewma_rejects_colliding_out_col(spark, sensor_points):
    with pytest.raises(ValueError, match="out_col"):
        ewma(sensor_points, alpha=0.5, out_col="value")


# ------------------------------------------------------------ counter_rate

def test_counter_rate_gauge_matches_duckdb(spark, sensor_points):
    """Gauge mode (counter=False) against the literal DuckDB window SQL."""
    from gensor_spark.operators.seriesstats import counter_rate

    got = (
        counter_rate(sensor_points, counter=False)
        .select("doc_id", "source", "seq", "increase", "rate")
        .toPandas()
        .sort_values(["doc_id", "source", "seq"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", sensor_points.toPandas())
    want = con.execute("""
        SELECT doc_id, source, seq,
               value - lag(value) OVER w AS increase,
               CASE WHEN epoch(ts - lag(ts) OVER w) > 0
                    THEN (value - lag(value) OVER w) / epoch(ts - lag(ts) OVER w)
               END AS rate
        FROM p
        WINDOW w AS (PARTITION BY doc_id, source ORDER BY ts, seq)
        ORDER BY doc_id, source, seq
    """).df()
    assert len(got) == len(want) > 0
    for c in ("increase", "rate"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
            rtol=1e-12, equal_nan=True,
        )


def test_counter_rate_reset_semantics(spark):
    """A counter that restarts: increase on the reset row is the new value."""
    from gensor_spark.operators.seriesstats import counter_rate

    vals = [10.0, 25.0, 40.0, 3.0, 9.0, None, 12.0]
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": np.arange(len(vals)),
        "ts": pd.date_range("2024-01-01", periods=len(vals), freq="30s", tz="UTC"),
        "value": pd.array(vals, dtype=float),
    })
    rows = {
        r.seq: r
        for r in counter_rate(spark.createDataFrame(pdf)).collect()
    }
    assert rows[0].increase is None and rows[0].rate is None  # first point
    assert rows[1].increase == pytest.approx(15.0)
    assert rows[1].rate == pytest.approx(15.0 / 30.0)
    assert not rows[1].is_reset
    # seq 3: 40 -> 3 is a reset; increase = the post-reset value itself
    assert rows[3].is_reset
    assert rows[3].increase == pytest.approx(3.0)
    assert rows[3].rate == pytest.approx(3.0 / 30.0)
    # NULL value masks both neighbors' increase, never crashes
    assert rows[5].increase is None and not rows[5].is_reset
    assert rows[6].increase is None
    # per_seconds rescales: per-minute rate
    per_min = {r.seq: r for r in counter_rate(
        spark.createDataFrame(pdf), per_seconds=60.0).collect()}
    assert per_min[1].rate == pytest.approx(60.0 * 15.0 / 30.0)


def test_counter_rate_duplicate_ts_masks_increase(spark):
    """Non-positive Δt (duplicate timestamp) has no time base: increase AND
    rate are NULL and is_reset stays False — the documented mask, so callers
    summing ``increase`` never double-count a duplicated instant."""
    from gensor_spark.operators.seriesstats import counter_rate

    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:00:30",
        "2024-01-01 00:00:30",  # duplicate instant (seq tie-break orders it)
        "2024-01-01 00:01:00",
    ], utc=True)
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": np.arange(4),
        "ts": ts, "value": [10.0, 20.0, 5.0, 8.0],
    })
    rows = {r.seq: r for r in counter_rate(spark.createDataFrame(pdf)).collect()}
    assert rows[1].increase == pytest.approx(10.0)
    # seq 2 shares seq 1's timestamp: dt = 0 — masked even though the value
    # dropped (which would otherwise read as a reset)
    assert rows[2].increase is None and rows[2].rate is None
    assert not rows[2].is_reset
    # the next real interval is measured against the duplicate (lag partner)
    assert rows[3].increase == pytest.approx(3.0)
    assert rows[3].rate == pytest.approx(3.0 / 30.0)


def test_counter_rate_monotone_equals_gauge(spark, sensor_points):
    """On a strictly increasing counter, counter and gauge modes agree."""
    from pyspark.sql import Window

    from gensor_spark.operators.seriesstats import counter_rate

    mono = sensor_points.withColumn(
        "value",
        F.sum(F.abs(F.col("value")) + 1.0).over(
            Window.partitionBy("doc_id", "source")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    a = counter_rate(mono, counter=True).select("doc_id", "source", "seq", "increase", "rate")
    b = counter_rate(mono, counter=False).select("doc_id", "source", "seq", "increase", "rate")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_counter_rate_plan_stays_jvm_side(spark, sensor_points):
    from gensor_spark.operators.seriesstats import counter_rate

    plan = counter_rate(sensor_points)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # one Exchange serves the whole operator; the cached fixture embeds its
    # own (already-executed) Exchange inside the InMemoryRelation string, so
    # count only the plan above the cache boundary
    above_cache = plan.split("InMemoryTableScan")[0]
    assert above_cache.count("Exchange hashpartitioning") <= 1


# ------------------------------------------------------------ ks_split drift

def _ks_ref(a: np.ndarray, b: np.ndarray) -> float:
    """Brute-force two-sample KS D (ECDFs evaluated with ties included) —
    the textbook definition, independent of the windowed-SQL formulation."""
    xs = np.sort(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    return float(np.abs(f1 - f2).max())


def test_ks_split_matches_bruteforce(spark, sensor_points):
    from gensor_spark.operators.seriesstats import ks_split

    got = ks_split(sensor_points).toPandas().set_index(["doc_id", "source"])
    pdf = (
        sensor_points.toPandas()
        .dropna(subset=["value"])
        .sort_values(["doc_id", "source", "ts", "seq"])
    )
    checked = 0
    for (d, s), grp in pdf.groupby(["doc_id", "source"]):
        v = grp["value"].to_numpy()
        m = len(v)
        n1 = int(np.ceil(m * 0.5))
        row = got.loc[(d, s)]
        assert row["n"] == m and row["n1"] == n1 and row["n2"] == m - n1
        if m - n1 == 0:
            assert pd.isna(row["ks_d"]) and pd.isna(row["p_asymp"])
            continue
        want = _ks_ref(v[:n1], v[n1:])
        np.testing.assert_allclose(row["ks_d"], want, rtol=1e-12, atol=1e-12)
        en = np.sqrt(n1 * (m - n1) / m)
        np.testing.assert_allclose(row["ks_stat"], want * en, rtol=1e-12)
        np.testing.assert_allclose(
            row["p_asymp"], min(1.0, 2.0 * np.exp(-2.0 * (want * en) ** 2)), rtol=1e-12
        )
        checked += 1
    assert checked > 10


def test_ks_split_matches_duckdb(spark, sensor_points):
    """The windowed-SQL formulation itself, cross-checked engine-vs-engine
    (same shape the driver oracle uses: RANGE frame on the value ordering)."""
    from gensor_spark.operators.seriesstats import ks_split

    got = ks_split(sensor_points).toPandas()
    con = duckdb.connect()
    con.register("p", sensor_points.toPandas())
    want = con.execute("""
        WITH nn AS (
          SELECT doc_id, source, value,
                 row_number() OVER (PARTITION BY doc_id, source
                                    ORDER BY ts, seq) - 1 AS r,
                 count(*) OVER (PARTITION BY doc_id, source) AS m
          FROM p WHERE value IS NOT NULL
        ),
        g AS (
          SELECT doc_id, source, value, m,
                 CASE WHEN r < ceil(m * 0.5) THEN 1 ELSE 0 END AS g1
          FROM nn
        ),
        t AS (
          SELECT doc_id, source, value, m, g1,
                 sum(g1) OVER (PARTITION BY doc_id, source) AS n1
          FROM g
        ),
        e AS (
          SELECT doc_id, source, m, n1,
                 abs(sum(g1) OVER w / n1::DOUBLE
                     - sum(1 - g1) OVER w
                       / (CASE WHEN m - n1 > 0 THEN (m - n1)::DOUBLE END)) AS d
          FROM t
          WINDOW w AS (PARTITION BY doc_id, source ORDER BY value
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT doc_id, source, max(m) AS n, max(n1) AS n1,
               max(m) - max(n1) AS n2, max(d) AS ks_d
        FROM e GROUP BY doc_id, source
    """).df()
    k = ["doc_id", "source"]
    got_s = got.sort_values(k).reset_index(drop=True)
    want_s = want.sort_values(k).reset_index(drop=True)
    assert len(got_s) == len(want_s) > 0
    for c in k + ["n", "n1", "n2"]:
        np.testing.assert_array_equal(got_s[c].to_numpy(), want_s[c].to_numpy())
    np.testing.assert_allclose(
        got_s["ks_d"].to_numpy(dtype=float), want_s["ks_d"].to_numpy(dtype=float),
        rtol=1e-12, atol=1e-12,
    )


def test_ks_split_sees_what_cusum_cannot(spark):
    """A variance explosion with an unchanged mean: CUSUM's level-shift
    evidence stays near zero while KS flags the drift decisively — the
    fixture that justifies the method's existence in the family."""
    from gensor_spark.operators.seriesstats import ks_split

    rng = np.random.RandomState(7)
    quiet = rng.uniform(-1, 1, 200)
    loud = rng.uniform(-50, 50, 200)
    loud = loud - loud.mean() + quiet.mean()  # pin the means together
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": np.arange(400),
        "ts": pd.date_range("2024-01-01", periods=400, freq="h", tz="UTC"),
        "value": np.concatenate([quiet, loud]),
    })
    df = spark.createDataFrame(pdf)
    ks = ks_split(df).collect()[0]
    assert ks.ks_d > 0.4 and ks.p_asymp < 1e-6
    cu = cusum_changepoint(df).collect()[0]
    # the level-shift evidence normalized per point is tiny vs the KS signal
    assert cu.cusum_absmax / 400 < 2.0  # |mean drift| per point ~ noise scale


def test_ks_split_short_series_masks(spark):
    from gensor_spark.operators.seriesstats import ks_split

    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": [0],
        "ts": pd.to_datetime(["2024-01-01"], utc=True),
        "value": [1.0],
    })
    row = ks_split(spark.createDataFrame(pdf)).collect()[0]
    assert row.n == 1 and row.n1 == 1 and row.n2 == 0
    assert row.ks_d is None and row.ks_stat is None and row.p_asymp is None


def test_ks_split_plan_stays_jvm_side(spark, sensor_points):
    from gensor_spark.operators.seriesstats import ks_split

    plan = ks_split(sensor_points)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    above_cache = plan.split("InMemoryTableScan")[0]
    assert above_cache.count("Exchange hashpartitioning") <= 1


# ------------------------------------------------------------ Holt-Winters

def _hw_loop(x, m, alpha, beta, gamma):
    """Independent loop reference for additive Holt-Winters (same init and
    NaN-skip contract as the kernel docstring, written from the formulas)."""
    n = len(x)
    out = [[float("nan")] * n for _ in range(4)]  # level, trend, season, fit
    obs = [i for i, v in enumerate(x) if v == v]
    if len(obs) < 2 * m:
        return out
    xc = [x[i] for i in obs]
    mean1 = sum(xc[:m]) / m
    mean2 = sum(xc[m:2 * m]) / m
    b = (mean2 - mean1) / m
    l = mean1 + b * (m - 1) / 2.0
    s = [xc[i] - (l - (m - 1 - i) * b) for i in range(m)]
    for i in range(m):
        out[2][obs[i]] = s[i]
    for j in range(m, len(xc)):
        i = obs[j]
        sj = s[j % m]
        out[3][i] = l + b + sj
        pl, pb = l, b
        l = alpha * (xc[j] - sj) + (1 - alpha) * (l + b)
        b = beta * (l - pl) + (1 - beta) * b
        s[j % m] = gamma * (xc[j] - pl - pb) + (1 - gamma) * sj
        out[0][i], out[1][i], out[2][i] = l, b, s[j % m]
    return out


def test_hw_matches_loop_reference(spark):
    from gensor_spark.operators.seriesstats import hw_smooth

    rng = np.random.default_rng(23)
    m = 6
    rows, ref = [], {}
    for d in range(5):
        n = int(rng.integers(3, 80))
        vals = rng.normal(0, 1, n).cumsum() + 3 * np.sin(np.arange(n))
        vals[rng.random(n) < 0.1] = np.nan
        ref[str(d)] = _hw_loop(vals.tolist(), m, 0.4, 0.2, 0.3)
        rows += [(str(d), "s", i, None if v != v else float(v))
                 for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    got = hw_smooth(df, period=m, alpha=0.4, beta=0.2, gamma=0.3).toPandas()
    got = got.sort_values(["doc_id", "seq"])
    for d, (lv, tr, se, ft) in ref.items():
        g = got[got.doc_id == d]
        for col, want in (("level", lv), ("trend", tr),
                          ("season", se), ("hw_fit", ft)):
            np.testing.assert_allclose(
                g[col].to_numpy(), want, rtol=1e-12, atol=1e-12,
                err_msg=f"doc {d} col {col}")


def test_hw_recovers_trend_plus_season_exactly(spark):
    """On x_t = a + b*t + s_{t mod m} (zero-sum season) the trend-adjusted
    init lands on the TRUE state, so the one-step-ahead fit equals x
    exactly from t=m on, for ANY smoothing constants — the invariant Holt
    (no season ring) provably cannot meet."""
    from gensor_spark.operators.seriesstats import holt_smooth, hw_smooth

    m = 8
    s = np.array([5, -3, 2, -1, 4, -2, -6, 1], dtype=float)
    assert s.sum() == 0
    t = np.arange(96)
    x = 2.5 + 0.4 * t + s[t % m]
    df = spark.createDataFrame(
        [("r", "s", int(i), float(v)) for i, v in zip(t, x)],
        "doc_id string, source string, seq int, value double")
    g = hw_smooth(df, period=m, alpha=0.3, beta=0.6, gamma=0.4).toPandas()
    g = g.sort_values("seq")
    fitted = g["hw_fit"].to_numpy()[m:]
    np.testing.assert_allclose(fitted, x[m:], rtol=1e-12)
    np.testing.assert_allclose(g["trend"].to_numpy()[m:], 0.4, rtol=1e-12)
    # Holt on the same series keeps a persistent seasonal residual
    h = holt_smooth(df, alpha=0.3, beta=0.6).toPandas().sort_values("seq")
    resid = np.abs(h["level"].to_numpy()[m:] - x[m:])
    assert resid.max() > 1.0


def test_hw_short_series_masks(spark):
    from gensor_spark.operators.seriesstats import hw_smooth

    df = spark.createDataFrame(
        [("a", "s", i, float(i)) for i in range(7)],
        "doc_id string, source string, seq int, value double")
    g = hw_smooth(df, period=4).toPandas()  # 7 obs < 2*period
    for c in ("level", "trend", "season", "hw_fit"):
        assert g[c].isna().all()


def test_hw_rejects_bad_params(spark):
    from gensor_spark.operators.seriesstats import hw_smooth

    df = spark.createDataFrame(
        [("a", "s", 0, 1.0)], "doc_id string, source string, seq int, value double")
    with pytest.raises(ValueError):
        hw_smooth(df, period=1)
    with pytest.raises(ValueError):
        hw_smooth(df, period=4, gamma=0.0)


def test_hw_forecast_exact_on_pure_series(spark):
    """The exact-recovery invariant extends to forecasting: on
    a + b*t + season the h-step forecast IS the true continuation."""
    from gensor_spark.operators.seriesstats import hw_forecast

    m, h = 6, 15
    s = np.array([3, -1, 2, -4, 1, -1], dtype=float)
    assert s.sum() == 0
    t = np.arange(60)
    x = 1.5 + 0.25 * t + s[t % m]
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": t,
        "ts": pd.date_range("2024-01-01", periods=60, freq="h", tz="UTC"),
        "value": x,
    })
    out = (hw_forecast(spark.createDataFrame(pdf), period=m, horizon=h,
                       alpha=0.4, beta=0.2, gamma=0.6)
           .orderBy("step").toPandas())
    assert len(out) == h
    future = np.arange(60, 60 + h)
    want = 1.5 + 0.25 * future + s[future % m]
    np.testing.assert_allclose(out["yhat"].to_numpy(), want, rtol=1e-12)
    # toPandas under the pinned UTC session yields tz-naive UTC stamps
    assert out["last_ts"].iloc[0] == pdf["ts"].iloc[-1].tz_localize(None)


def test_hw_forecast_matches_state_continuation(spark):
    """On noisy data: forecast equals the loop reference's state rolled
    forward (independent recomputation of l, b, season ring)."""
    from gensor_spark.operators.seriesstats import hw_forecast

    rng = np.random.default_rng(41)
    m, h = 5, 7
    n = 47
    x = rng.normal(0, 1, n).cumsum() + 2 * np.sin(np.arange(n))
    x[rng.random(n) < 0.1] = np.nan
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": np.arange(n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="h", tz="UTC"),
        "value": x,
    })
    got = (hw_forecast(spark.createDataFrame(pdf), period=m, horizon=h,
                       alpha=0.4, beta=0.2, gamma=0.3)
           .orderBy("step").toPandas())
    # roll the loop reference's final state forward by hand
    lv, tr, se, ft = _hw_loop(x.tolist(), m, 0.4, 0.2, 0.3)
    obs = [i for i in range(n) if x[i] == x[i]]
    l, b = lv[obs[-1]], tr[obs[-1]]
    ring = [None] * m
    for j, i in enumerate(obs):
        if se[i] == se[i]:
            ring[j % m] = se[i]
    jn = len(obs)
    want = [l + k * b + ring[(jn + k - 1) % m] for k in range(1, h + 1)]
    np.testing.assert_allclose(got["yhat"].to_numpy(), want, rtol=1e-12)


def test_hw_forecast_short_series_emits_nothing(spark):
    from gensor_spark.operators.seriesstats import hw_forecast

    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "seq": np.arange(5),
        "ts": pd.date_range("2024-01-01", periods=5, freq="h", tz="UTC"),
        "value": np.arange(5, dtype=float),
    })
    out = hw_forecast(spark.createDataFrame(pdf), period=4, horizon=3)
    assert out.count() == 0
    with pytest.raises(ValueError, match="horizon"):
        hw_forecast(spark.createDataFrame(pdf), period=4, horizon=0)


# ------------------------------------------------------- smoother_backtest

def test_backtest_model_selection_on_planted_series(spark):
    """Three planted regimes: a seasonal series picks hw, a ramp picks
    holt over ewma, and a flat noisy series scores ewma competitively —
    the discrimination that justifies the verb."""
    from gensor_spark.operators.seriesstats import smoother_backtest

    rng = np.random.default_rng(3)
    m = 8
    t = np.arange(120)
    season = np.array([8, -4, 6, -10, 2, 4, -2, -4], dtype=float)
    frames = {
        "seasonal": 5 + 0.1 * t + season[t % m] + rng.normal(0, 0.2, len(t)),
        "ramp": 2 + 0.9 * t + rng.normal(0, 0.2, len(t)),
        "flat": 7 + rng.normal(0, 0.5, len(t)),
    }
    rows = []
    for d, vals in frames.items():
        rows += [(d, "s", int(i), float(v)) for i, v in zip(t, vals)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    out = smoother_backtest(df, period=m).toPandas()
    assert len(out) == 18  # 3 series x 6 methods (snaive + kalman incl.)
    best = {d: g.loc[g.best, "method"].iloc[0]
            for d, g in out.groupby("doc_id")}
    assert best["seasonal"] == "hw"
    assert best["ramp"] in ("holt", "hw")  # both track a ramp; never ewma
    mae = out.set_index(["doc_id", "method"])["mae"]
    assert mae[("ramp", "holt")] < mae[("ramp", "ewma")] / 3
    assert mae[("seasonal", "hw")] < mae[("seasonal", "ewma")] / 3
    # the baseline beats ewma on the seasonal series (it IS the season)
    # but loses to hw, which also tracks the trend component
    assert mae[("seasonal", "snaive")] < mae[("seasonal", "ewma")]
    assert mae[("seasonal", "hw")] < mae[("seasonal", "snaive")]
    assert (out.groupby("doc_id")["best"].sum() == 1).all()


def test_backtest_matches_hand_rolled_mae(spark):
    """MAE numbers equal a hand-rolled one-step-ahead evaluation."""
    from gensor_spark.operators.seriesstats import smoother_backtest

    rng = np.random.default_rng(8)
    x = rng.normal(0, 1, 40).cumsum()
    df = spark.createDataFrame(
        [("d", "s", int(i), float(v)) for i, v in enumerate(x)],
        "doc_id string, source string, seq int, value double")
    out = smoother_backtest(df, period=4, eval_fraction=0.25,
                            alpha=0.4, beta=0.2, gamma=0.3).toPandas()
    n_eval = 10
    ew = pd.Series(x).ewm(alpha=0.4).mean().to_numpy()
    want_ewma = np.abs(ew[-n_eval - 1:-1] - x[-n_eval:]).mean()
    got = out.set_index("method")
    np.testing.assert_allclose(got.loc["ewma", "mae"], want_ewma, rtol=1e-12)
    lv, tr = _hw_loop(x.tolist(), 4, 0.4, 0.2, 0.3)[:2]
    # holt via its own loop reference
    hlv, htr = [], []
    l = b = None
    b0 = x[1] - x[0]
    for v in x:
        if l is None:
            l, b = v, b0
        else:
            pl = l
            l = 0.4 * v + 0.6 * (l + b)
            b = 0.2 * (l - pl) + 0.8 * b
        hlv.append(l); htr.append(b)
    pred_holt = np.array(hlv[-n_eval - 1:-1]) + np.array(htr[-n_eval - 1:-1])
    want_holt = np.abs(pred_holt - x[-n_eval:]).mean()
    np.testing.assert_allclose(got.loc["holt", "mae"], want_holt, rtol=1e-12)
    # seasonal-naive: y[t-4] predicts y[t]
    want_sn = np.abs(x[-n_eval - 4:-4] - x[-n_eval:]).mean()
    np.testing.assert_allclose(got.loc["snaive", "mae"], want_sn, rtol=1e-12)
    # kalman local level: independent filter loop, prediction = previous
    # filtered mean (defaults kq=0.1, kr=1.0)
    a = p = None
    kf = []
    for v in x:
        if a is None:
            a, p = v, 1.0
        else:
            pp = p + 0.1
            s = pp + 1.0
            g = pp / s
            a = a + g * (v - a)
            p = (1 - g) * pp
        kf.append(a)
    pred_k = np.array(kf[-n_eval - 1:-1])
    want_k = np.abs(pred_k - x[-n_eval:]).mean()
    np.testing.assert_allclose(got.loc["kalman", "mae"], want_k, rtol=1e-12)


def test_backtest_short_series_hw_masks(spark):
    """A series too short for HW init: hw row reports NULL mae, never best."""
    from gensor_spark.operators.seriesstats import smoother_backtest

    df = spark.createDataFrame(
        [("d", "s", int(i), float(i)) for i in range(10)],
        "doc_id string, source string, seq int, value double")
    out = smoother_backtest(df, period=8).toPandas()  # 10 < 2*8
    got = out.set_index("method")
    assert pd.isna(got.loc["hw", "mae"]) and not bool(got.loc["hw", "best"])
    assert got.loc["holt", "mae"] == pytest.approx(0.0, abs=1e-12)  # exact ramp
    with pytest.raises(ValueError, match="eval_fraction"):
        smoother_backtest(df, period=4, eval_fraction=1.5)


def test_hw_multiplicative_exact_on_pure_seasonal(spark):
    """Trend-free a·s_t (mean-1 season) is recovered exactly from t=m on;
    the forecast continues it exactly for every step."""
    import numpy as np
    import pandas as pd
    from gensor_spark.operators.seriesstats import hw_forecast, hw_smooth

    m, a = 4, 50.0
    s_prof = np.array([1.3, 0.7, 1.1, 0.9])  # mean exactly 1
    n = 40
    vals = a * s_prof[np.arange(n) % m]
    pdf = pd.DataFrame({
        "doc_id": "d0", "source": "s", "seq": np.arange(n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="h", tz="UTC"),
        "value": vals,
    })
    df = spark.createDataFrame(pdf)
    out = hw_smooth(df, period=m, mode="mul").orderBy("seq").toPandas()
    fit = out["hw_fit"].to_numpy()
    assert np.isnan(fit[:m]).all()
    assert np.allclose(fit[m:], vals[m:], rtol=0, atol=1e-9)
    fc = hw_forecast(df, period=m, horizon=8, mode="mul") \
        .orderBy("step").toPandas()
    want = a * s_prof[(np.arange(n, n + 8)) % m]
    assert np.allclose(fc["yhat"], want, atol=1e-9)


def test_hw_multiplicative_matches_loop_reference(spark):
    """Independent loop reference on a noisy trended multiplicative series."""
    import numpy as np
    import pandas as pd
    from gensor_spark.operators.seriesstats import hw_smooth

    rng = np.random.default_rng(21)
    m, n = 6, 60
    al, be, ga = 0.4, 0.2, 0.3
    vals = (20 + 0.5 * np.arange(n)) * (1 + 0.2 * np.sin(
        2 * np.pi * np.arange(n) / m)) + rng.uniform(0.1, 0.5, n)
    # reference
    b0 = (vals[m:2 * m].mean() - vals[:m].mean()) / m
    l = vals[:m].mean() + b0 * (m - 1) / 2
    b = b0
    sring = list(vals[:m] / (l - (m - 1 - np.arange(m)) * b0))
    ref_fit = [np.nan] * m
    for j in range(m, n):
        sj = sring[j % m]
        ref_fit.append((l + b) * sj)
        pl, pb = l, b
        l = al * (vals[j] / sj) + (1 - al) * (l + b)
        b = be * (l - pl) + (1 - be) * b
        sring[j % m] = ga * (vals[j] / (pl + pb)) + (1 - ga) * sj
    pdf = pd.DataFrame({
        "doc_id": "d0", "source": "s", "seq": np.arange(n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="h", tz="UTC"),
        "value": vals,
    })
    out = hw_smooth(spark.createDataFrame(pdf), period=m,
                    alpha=al, beta=be, gamma=ga, mode="mul") \
        .orderBy("seq").toPandas()
    got = out["hw_fit"].to_numpy()
    assert np.allclose(got[m:], ref_fit[m:], rtol=1e-12)


def test_hw_multiplicative_nonpositive_masks(spark):
    import numpy as np
    import pandas as pd
    from gensor_spark.operators.seriesstats import hw_smooth

    n = 30
    pdf = pd.DataFrame({
        "doc_id": "d0", "source": "s", "seq": np.arange(n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="h", tz="UTC"),
        "value": np.r_[np.full(10, 5.0), [0.0], np.full(n - 11, 5.0)],
    })
    out = hw_smooth(spark.createDataFrame(pdf), period=4, mode="mul") \
        .toPandas()
    assert out["hw_fit"].isna().all() and out["level"].isna().all()
    import pytest as _pt
    with _pt.raises(ValueError):
        hw_smooth(spark.createDataFrame(pdf), period=4, mode="bogus")


def test_rolling_corr_matches_pandas_and_duckdb(spark):
    import duckdb
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from gensor_spark.operators.seriesstats import rolling_corr

    rng = np.random.default_rng(12)
    n = 120
    ts = pd.date_range("2024-01-01", periods=n, freq="h", tz="UTC")
    base = rng.normal(0, 1, n)
    rows = []
    for doc, vals in (("x", base + rng.normal(0, 0.2, n)),
                      ("y", base + rng.normal(0, 0.2, n)),
                      ("z", rng.normal(0, 1, n))):
        for t, v in zip(ts, vals):
            rows.append((doc, "s", t, float(v)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "ts", "value"])
    # y drops some hours: tests the co-observed-bins frame
    pdf = pdf[~((pdf.doc_id == "y") & (pdf.ts.dt.hour % 7 == 3))]
    df = spark.createDataFrame(pdf)
    W = 12
    got = (rolling_corr(df, pairs=[("x|s", "y|s"), ("x|s", "z|s")],
                        window=W, bin="hour")
           .orderBy("sid_a", "sid_b", "bin_ts").toPandas())
    # pandas reference on the inner-aligned frame
    wide = pdf.pivot_table(index="ts", columns="doc_id", values="value")
    for pa, pb in (("x", "y"), ("x", "z")):
        al = wide[[pa, pb]].dropna()
        ref = al[pa].rolling(W, min_periods=3).corr(al[pb])
        mine = got[(got.sid_a == f"{pa}|s") & (got.sid_b == f"{pb}|s")]
        assert len(mine) == len(al)
        m = mine["r"].to_numpy(dtype=float)
        rr = ref.to_numpy(dtype=float)
        mask = ~np.isnan(rr)
        assert np.allclose(m[mask], rr[mask], atol=1e-9)
        assert np.isnan(m[~mask]).all()
    # DuckDB oracle for one pair
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(f"""
        WITH b AS (SELECT doc_id || '|' || source AS sid,
                          date_trunc('hour', ts) AS bin_ts,
                          avg(value) AS v
                   FROM t GROUP BY 1, 2),
        j AS (SELECT a.bin_ts, a.v AS x, c.v AS y
              FROM b a JOIN b c USING (bin_ts)
              WHERE a.sid = 'x|s' AND c.sid = 'y|s'),
        w AS (SELECT bin_ts,
               count(*) OVER win AS n, sum(x) OVER win AS sx,
               sum(y) OVER win AS sy, sum(x*y) OVER win AS sxy,
               sum(x*x) OVER win AS sxx, sum(y*y) OVER win AS syy
              FROM j WINDOW win AS (ORDER BY bin_ts
                     ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW))
        SELECT bin_ts,
               CASE WHEN n >= 3 AND (sxx - sx*sx/n) > 0 AND (syy - sy*sy/n) > 0
                    THEN (sxy - sx*sy/n)
                         / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) END AS r
        FROM w ORDER BY bin_ts
    """).df()
    mine = got[(got.sid_a == "x|s") & (got.sid_b == "y|s")]
    m, e = mine["r"].to_numpy(float), exp["r"].to_numpy(float)
    mask = ~np.isnan(e)
    assert np.allclose(m[mask], e[mask], atol=1e-12)
    assert np.isnan(m[~mask]).all()
    # the correlated pair reads high, the independent pair low, post-warmup
    hi = got[(got.sid_b == "y|s")]["r"].dropna().tail(50).mean()
    lo = got[(got.sid_b == "z|s")]["r"].dropna().tail(50).abs().mean()
    assert hi > 0.8 and lo < 0.5


def test_rolling_corr_validation(spark):
    import pytest as _pt
    from gensor_spark.operators.seriesstats import rolling_corr

    df = spark.createDataFrame([], "doc_id string, source string, ts timestamp, value double")
    with _pt.raises(ValueError):
        rolling_corr(df, pairs=[("a", "b")], window=1)
    with _pt.raises(ValueError):
        rolling_corr(df, pairs=[])


# ------------------------------------------------------------ theta method

def _theta_loop(x, h, alpha):
    """Independent loop reference: H&B SES-with-drift theta (theta=2)."""
    v = [float(u) for u in x if not np.isnan(u)]
    n = len(v)
    l = v[0]
    for u in v[1:]:
        l = alpha * u + (1 - alpha) * l
    tbar = (n + 1) / 2.0
    vbar = sum(v) / n
    num = sum((t - tbar) * (u - vbar) for t, u in zip(range(1, n + 1), v))
    den = sum((t - tbar) ** 2 for t in range(1, n + 1))
    b = num / den
    carry = (1 - (1 - alpha) ** n) / alpha
    return [l + 0.5 * b * ((k - 1) + carry) for k in range(1, h + 1)], b


def test_theta_forecast_matches_loop_reference(spark):
    from gensor_spark.operators.seriesstats import theta_forecast

    rng = np.random.default_rng(4)
    x = 3.0 + 0.7 * np.arange(60) + rng.normal(0, 1.5, 60)
    x[7] = np.nan
    df = spark.createDataFrame(
        [("d", "s", int(i), None if np.isnan(v) else float(v))
         for i, v in enumerate(x)],
        "doc_id string, source string, seq int, value double")
    got = (theta_forecast(df, h=5, alpha=0.35)
           .orderBy("step").toPandas())
    want, b = _theta_loop(x, 5, 0.35)
    np.testing.assert_allclose(got["yhat"], want, rtol=1e-12)
    np.testing.assert_allclose(got["slope"], b, rtol=1e-12)
    assert (got["alpha"] == 0.35).all()


def test_theta_ramp_drifts_at_half_trend(spark):
    # theta's signature: the forecast path climbs at HALF the fitted slope
    from gensor_spark.operators.seriesstats import theta_forecast

    df = spark.createDataFrame(
        [("d", "s", int(i), 2.0 + 3.0 * i) for i in range(50)],
        "doc_id string, source string, seq int, value double")
    got = theta_forecast(df, h=4, alpha=0.5).orderBy("step").toPandas()
    np.testing.assert_allclose(np.diff(got["yhat"]), 1.5, rtol=1e-9)
    np.testing.assert_allclose(got["slope"], 3.0, rtol=1e-12)


def test_theta_auto_alpha_and_short_series(spark):
    from gensor_spark.operators.seriesstats import theta_forecast

    rng = np.random.default_rng(12)
    rows = [("long", "s", int(i), float(v))
            for i, v in enumerate(rng.normal(10, 1, 40))]
    rows += [("short", "s", 0, 1.0), ("short", "s", 1, 2.0)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    got = theta_forecast(df, h=2).toPandas()
    lg = got[got.doc_id == "long"]
    assert lg["yhat"].notna().all()
    assert (lg["alpha"].between(0.01, 0.99)).all()
    sh = got[got.doc_id == "short"]
    assert len(sh) == 2 and sh["yhat"].isna().all()


def test_backtest_theta_beats_ewma_on_trend(spark):
    # on a strong ramp the drift term must buy theta a lower MAE than
    # the drift-free ewma (holt may still win; theta >= ewma is the claim)
    from gensor_spark.operators.seriesstats import smoother_backtest

    rng = np.random.default_rng(6)
    x = 1.0 + 2.0 * np.arange(120) + rng.normal(0, 0.3, 120)
    df = spark.createDataFrame(
        [("d", "s", int(i), float(v)) for i, v in enumerate(x)],
        "doc_id string, source string, seq int, value double")
    out = smoother_backtest(df, period=8).toPandas().set_index("method")
    assert out.loc["theta", "mae"] < out.loc["ewma", "mae"]


def test_backtest_theta_matches_hand_rolled(spark):
    from gensor_spark.operators.seriesstats import smoother_backtest

    rng = np.random.default_rng(8)
    x = rng.normal(0, 1, 40).cumsum()
    df = spark.createDataFrame(
        [("d", "s", int(i), float(v)) for i, v in enumerate(x)],
        "doc_id string, source string, seq int, value double")
    out = smoother_backtest(df, period=4, eval_fraction=0.25,
                            alpha=0.4, beta=0.2, gamma=0.3).toPandas()
    # hand-rolled rolling-origin theta h=1 predictions
    n_eval = 10
    preds = []
    for origin in range(len(x) - n_eval, len(x)):
        want, _ = _theta_loop(x[:origin], 1, 0.4)
        preds.append(want[0])
    mae = float(np.abs(np.array(preds) - x[-n_eval:]).mean())
    got = out.set_index("method").loc["theta", "mae"]
    np.testing.assert_allclose(got, mae, rtol=1e-12)


# ------------------------------------------------------------ AR / Yule-Walker

def _yw_direct(x, p):
    """Independent reference: solve the order-p Yule-Walker Toeplitz system
    directly (np.linalg.solve), no Levinson-Durbin shortcuts."""
    v = np.asarray([u for u in x if not np.isnan(u)], dtype=float)
    v = v - v.mean()
    n = len(v)
    g = np.array([float(v[k:] @ v[: n - k]) / n for k in range(p + 1)])
    G = np.array([[g[abs(i - j)] for j in range(p)] for i in range(p)])
    phi = np.linalg.solve(G, g[1 : p + 1])
    return phi, float(g[0] - phi @ g[1 : p + 1])


def _ar_loop_forecast(x, phi, h):
    """Loop reference for the recursive plug-in forecast."""
    v = [float(u) for u in x if not np.isnan(u)]
    mu = sum(v) / len(v)
    ext = [u - mu for u in v]
    out = []
    for _ in range(h):
        pred = sum(phi[j] * ext[-1 - j] for j in range(len(phi)))
        ext.append(pred)
        out.append(mu + pred)
    return out


def _ar2_series(seed=7, n=400):
    rng = np.random.default_rng(seed)
    e = rng.normal(0, 1.0, n + 100)
    x = np.zeros(n + 100)
    for t in range(2, n + 100):
        x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + e[t]
    return x[100:] + 5.0


def test_yule_walker_kernel_matches_direct_solve():
    from gensor_spark.operators.seriesstats import _yule_walker

    x = _ar2_series(n=2000)
    xd = x - x.mean()
    phis, sig2 = _yule_walker(xd, 6)
    for p in (1, 2, 3, 6):
        phi_r, s2_r = _yw_direct(x, p)
        np.testing.assert_allclose(phis[p], phi_r, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(sig2[p], s2_r, rtol=1e-9)


def test_ar_forecast_matches_loop_reference(spark):
    from gensor_spark.operators.seriesstats import ar_forecast

    x = _ar2_series(seed=11, n=120)
    x[13] = np.nan  # NaN observations are dropped, not zeroed
    df = spark.createDataFrame(
        [("d", "s", int(i), None if np.isnan(v) else float(v))
         for i, v in enumerate(x)],
        "doc_id string, source string, seq int, value double")
    got = ar_forecast(df, h=6, p=2).orderBy("step").toPandas()
    phi, s2 = _yw_direct(x, 2)
    want = _ar_loop_forecast(x, phi, 6)
    np.testing.assert_allclose(got["yhat"], want, rtol=1e-10)
    np.testing.assert_allclose(got["sigma2"], s2, rtol=1e-10)
    assert (got["p"] == 2).all()


def test_ar_order_selection_recovers_ar2(spark):
    from gensor_spark.operators.seriesstats import ar_forecast

    df = spark.createDataFrame(
        [("d", "s", int(i), float(v)) for i, v in enumerate(_ar2_series())],
        "doc_id string, source string, seq int, value double")
    got = ar_forecast(df, h=40, max_p=6).orderBy("step").toPandas()
    assert (got["p"] == 2).all()
    # stationary AR: the long-horizon path decays toward the series mean
    mu = float(np.mean(_ar2_series()))
    tail_gap = abs(got["yhat"].iloc[-1] - mu)
    head_gap = abs(got["yhat"].iloc[0] - mu)
    assert tail_gap < max(head_gap, 1e-9) or head_gap < 1e-9
    assert tail_gap < 0.05  # |roots| < 1 => geometric decay over 40 steps


def test_ar_constant_and_short_series(spark):
    from gensor_spark.operators.seriesstats import ar_forecast

    rows = [("const", "s", int(i), 4.25) for i in range(30)]
    rows += [("short", "s", 0, 1.0), ("short", "s", 1, 2.0)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, seq int, value double")
    got = ar_forecast(df, h=3).toPandas()
    c = got[got.doc_id == "const"]
    assert (c["p"] == 0).all()
    np.testing.assert_allclose(c["yhat"], 4.25, rtol=0, atol=0)
    np.testing.assert_allclose(c["sigma2"], 0.0, atol=0)
    sh = got[got.doc_id == "short"]
    assert len(sh) == 3 and sh["yhat"].isna().all() and sh["p"].isna().all()


def test_ar_fixed_p_caps_to_series_length(spark):
    # p larger than n-1: the fit caps at the last order the sweep reached
    from gensor_spark.operators.seriesstats import ar_forecast

    df = spark.createDataFrame(
        [("d", "s", 0, 1.0), ("d", "s", 1, 3.0), ("d", "s", 2, 2.0),
         ("d", "s", 3, 5.0)],
        "doc_id string, source string, seq int, value double")
    got = ar_forecast(df, h=2, p=10).orderBy("step").toPandas()
    assert got["yhat"].notna().all()
    assert (got["p"] <= 3).all()
