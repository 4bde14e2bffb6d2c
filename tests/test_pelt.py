"""PELT: pruning-losslessness vs unpruned exhaustive DP, planted shifts,
penalty monotonicity, distributed==kernel parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.pelt import (
    _seg_cost_factory,
    pelt_changepoints,
    pelt_changepoints_np,
)


def _optimal_unpruned(values, penalty):
    """O(n²) exhaustive optimal-partition DP — no pruning, ground truth."""
    n = len(values)
    cost = _seg_cost_factory(np.asarray(values, dtype=float))
    f = [-penalty] + [np.inf] * n
    prev = [0] * (n + 1)
    for t in range(1, n + 1):
        for s in range(t):
            c = f[s] + cost(s, t) + penalty
            if c < f[t]:
                f[t], prev[t] = c, s
    cps, t = [], n
    while t > 0:
        s = prev[t]
        if s > 0:
            cps.append(s)
        t = s
    return sorted(cps), f[n]


def test_pelt_pruning_is_lossless_randomized():
    rng = np.random.default_rng(17)
    for trial in range(30):
        n = int(rng.integers(5, 120))
        v = rng.normal(0, 1, n)
        # plant 0-3 shifts
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(1, n))
            v[p:] += rng.normal(0, 4)
        pen = float(rng.uniform(1.0, 25.0))
        got = pelt_changepoints_np(v, pen)
        want, _ = _optimal_unpruned(v, pen)
        assert got == want, (trial, n, pen)


def test_pelt_finds_planted_shifts_exactly():
    v = np.concatenate([np.zeros(40), np.full(40, 8.0), np.full(40, -5.0)])
    assert pelt_changepoints_np(v, penalty=10.0) == [40, 80]
    # huge penalty: no changepoints; tiny shifts under penalty: none
    assert pelt_changepoints_np(v, penalty=1e9) == []
    assert pelt_changepoints_np(np.zeros(50), penalty=1.0) == []


def test_pelt_penalty_monotonicity():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, 200)
    v[60:] += 3.0
    v[150:] -= 2.5
    n_small = len(pelt_changepoints_np(v, 5.0))
    n_big = len(pelt_changepoints_np(v, 50.0))
    assert n_small >= n_big >= 1


def test_pelt_distributed_matches_kernel(spark):
    rng = np.random.default_rng(9)
    frames = []
    for d in range(6):
        n = 80 + d * 15
        v = rng.normal(0, 1, n)
        if d % 2 == 0:
            v[n // 2:] += 6.0
        v[3] = np.nan  # NaNs dropped before detection
        frames.append(pd.DataFrame({
            "doc_id": f"d{d}", "source": "s", "seq": np.arange(n), "value": v,
        }))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)
    out = pelt_changepoints(df, penalty=12.0).toPandas()
    for d in range(6):
        sub = pdf[pdf.doc_id == f"d{d}"].sort_values("seq")
        clean = sub[sub.value.notna()]
        want = pelt_changepoints_np(clean["value"].to_numpy(float), 12.0)
        mine = out[(out.doc_id == f"d{d}") & (out.cp_index >= 0)]
        assert sorted(mine["cp_index"]) == want, d
        # cp_seq maps ordinal -> original seq across the dropped NaN
        seqs = clean["seq"].to_numpy()
        assert sorted(mine["cp_seq"]) == [int(seqs[i]) for i in want]
        summary = out[(out.doc_id == f"d{d}") & (out.cp_index == -1)]
        assert len(summary) == 1
        assert summary["n_segments"].iloc[0] == len(want) + 1


def test_pelt_summary_row_for_short_series(spark):
    df = spark.createDataFrame(
        [("tiny", "s", 0, 1.0)], "doc_id string, source string, seq long, value double")
    out = pelt_changepoints(df, penalty=5.0).collect()
    assert len(out) == 1 and out[0].cp_index == -1 and out[0].n_segments == 1


# ----------------------------------------------------------- segmented trend

def _step_trend_pts(spark):
    """Three regimes with well-separated means AND within-regime slopes:
    PELT's mean-shift cost finds the breaks; the per-segment OLS must then
    recover each regime's slope/intercept exactly (noise-free input)."""
    segs = [
        (0, 40, 0.02, 0.0),     # start, n, slope, base level
        (40, 30, -0.05, 50.0),
        (70, 30, 0.0, 20.0),
    ]
    rows = []
    for start, n, m, b in segs:
        for i in range(n):
            rows.append(("d", "s", start + i, b + m * i))
    return (
        spark.createDataFrame(
            rows, "doc_id string, source string, seq long, value double"
        ),
        segs,
    )


def test_segmented_trend_recovers_planted_regimes(spark):
    from gensor_spark.operators.pelt import segmented_trend

    pts, segs = _step_trend_pts(spark)
    out = segmented_trend(pts, penalty=50.0).orderBy("segment").toPandas()
    assert list(out["start_seq"]) == [s[0] for s in segs]
    assert list(out["n"]) == [s[1] for s in segs]
    for row, (start, n, m, b) in zip(out.itertuples(), segs):
        # OLS over value = b + m*(seq-start): slope m, intercept b - m*start
        np.testing.assert_allclose(row.slope, m, atol=1e-9)
        np.testing.assert_allclose(row.intercept, b - m * start, atol=1e-9)


def test_segmented_trend_ols_matches_duckdb_per_segment(spark):
    """Given the operator's own segment bounds, the slope/intercept must
    equal DuckDB's regr_slope/regr_intercept over exactly those points —
    validates the regression independently of the segmentation."""
    import duckdb

    from gensor_spark.operators.pelt import segmented_trend

    rng = np.random.default_rng(11)
    rows = []
    for d in range(4):
        level = 0.0
        for blk in range(3):
            level += rng.normal(0, 40) + 60  # big shifts so PELT segments
            for i in range(25):
                rows.append((f"d{d}", "s", blk * 25 + i,
                             float(level + rng.normal(0, 1))))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "seq", "value"])
    pts = spark.createDataFrame(pdf)
    out = (segmented_trend(pts, penalty=200.0)
           .orderBy("doc_id", "segment").toPandas())
    assert (out.groupby("doc_id")["segment"].count() > 1).any()
    con = duckdb.connect()
    con.register("pts", pdf)
    con.register("segs", out[["doc_id", "segment", "start_seq", "end_seq"]])
    exp = con.execute("""
        SELECT s.doc_id, s.segment,
               regr_slope(p.value, p.seq) AS slope,
               regr_intercept(p.value, p.seq) AS intercept,
               count(*) AS n
        FROM segs s JOIN pts p
          ON p.doc_id = s.doc_id AND p.seq BETWEEN s.start_seq AND s.end_seq
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    np.testing.assert_array_equal(out["n"].to_numpy(), exp["n"].to_numpy())
    for col in ("slope", "intercept"):
        np.testing.assert_allclose(
            out[col].to_numpy(float), exp[col].to_numpy(float),
            rtol=1e-9, atol=1e-9, err_msg=col,
        )


def test_segmented_trend_nulls_and_short_series(spark):
    from gensor_spark.operators.pelt import segmented_trend

    df = spark.createDataFrame(
        [("t", "s", 0, 1.0), ("t", "s", 1, None), ("t", "s", 2, 3.0),
         ("one", "s", 5, 7.0)],
        "doc_id string, source string, seq long, value double",
    )
    out = {r.doc_id: r for r in segmented_trend(df, penalty=5.0).collect()}
    # nulls excluded from n and the regression; short series -> segment 0
    t = out["t"]
    assert t.segment == 0 and t.n == 2 and abs(t.slope - 1.0) < 1e-12
    one = out["one"]
    assert one.segment == 0 and one.n == 1 and one.slope is None


def test_forecast_segmented_extends_current_regime(spark):
    """A level-shifted ramp: the forecast extends ONLY the post-break
    regime (exact on its clean ramp), where Holt would still carry
    pre-break history."""
    import numpy as np

    from gensor_spark.operators.pelt import forecast_segmented

    xs = [float(v) for v in list(np.zeros(40)) + [100 + 2.0 * i
                                                  for i in range(40)]]
    df = spark.createDataFrame(
        [("d", "s", int(i), v) for i, v in enumerate(xs)],
        "doc_id string, source string, seq long, value double")
    fc = forecast_segmented(df, horizon=3, penalty=50.0).orderBy("step") \
        .toPandas()
    assert len(fc) == 3
    # post-break regime: y = 100 + 2*(seq-40) = 2*seq + 20
    for _, r in fc.iterrows():
        want = 2.0 * (79 + r["step"]) + 20.0
        assert abs(r["yhat"] - want) < 1e-9, (r["step"], r["yhat"], want)
    # the constant-mean PELT cost may sub-split the ramp itself; the
    # forecast stays exact because every sub-segment of a clean line
    # carries the same OLS line — assert only that a post-break suffix
    # (never the pre-break zeros) is what got extended
    assert (fc["segment"] >= 1).all() and (fc["n"] <= 40).all()

    # single-point terminal segment forecasts flat at its value
    xs2 = [0.0] * 30 + [50.0]
    df2 = spark.createDataFrame(
        [("d", "s", int(i), v) for i, v in enumerate(xs2)],
        "doc_id string, source string, seq long, value double")
    fc2 = forecast_segmented(df2, horizon=2, penalty=20.0).toPandas()
    if (fc2["n"] == 1).all():  # PELT isolated the jump point
        assert (fc2["yhat"] == 50.0).all()
    import pytest as _pt
    with _pt.raises(ValueError, match="horizon"):
        forecast_segmented(df, horizon=0)
