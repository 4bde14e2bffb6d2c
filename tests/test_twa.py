"""time_weighted_avg (operators/twa.py): hand-checked arithmetic, a
loop-wise numpy integral reference, a full-strength DuckDB oracle on the
real events table, and plan/guard semantics."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from gensor_spark.operators.twa import time_weighted_avg

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def _loop_reference(pdf, step_us, keys=("doc_id",)):
    """Per-segment integral accumulation, clipped to bins — an independent
    O(segments × bins) Python loop, no shared formulation with the
    operator's Catalyst plan or the DuckDB oracle SQL."""
    out = {}
    for key, g in pdf.dropna(subset=["value"]).groupby(list(keys)):
        if isinstance(key, tuple) and len(key) == 1:
            key = key[0]
        g = g.sort_values("ts")
        e = g["ts"].astype("int64").to_numpy()  # ns
        e = e // 1000  # us
        v = g["value"].to_numpy(dtype=float)
        for i in range(len(e) - 1):
            e0, e1, v0, v1 = e[i], e[i + 1], v[i], v[i + 1]
            if e1 <= e0:
                continue
            b = e0 // step_us
            while b * step_us < e1:
                lo = max(e0, b * step_us)
                hi = min(e1, (b + 1) * step_us)
                if hi > lo:
                    dur = hi - lo
                    frac_lo = (lo - e0) / (e1 - e0)
                    frac_hi = (hi - e0) / (e1 - e0)
                    v_lo = v0 + (v1 - v0) * frac_lo
                    v_hi = v0 + (v1 - v0) * frac_hi
                    cell = out.setdefault((key, b), [0.0, 0.0, 0.0])
                    cell[0] += dur
                    cell[1] += v0 * dur
                    cell[2] += (v_lo + v_hi) / 2.0 * dur
                b += 1
    return {
        k: (c[0] / 1e6, c[1] / c[0], c[2] / c[0]) for k, c in out.items()
    }


def _tsdf(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, ts string, value double")
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_hand_checked_single_key(spark):
    # observations at :00 +10, +30, +90 min of value 1, 3, 5 → hour bins
    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 00:30:00", 3.0),
        ("a", "2024-01-01 01:30:00", 5.0),
    ]
    df = _tsdf(spark, rows)
    got = {
        (r.doc_id, r.bin_ts.hour): r
        for r in time_weighted_avg(df, "1h", keys=("doc_id",)).collect()
    }
    # bin 0: seg1 (1.0 for 20min) + seg2's first 30min (locf 3.0);
    # covered 50min; locf = (1*20 + 3*30)/50
    b0 = got[("a", 0)]
    assert b0.covered_s == pytest.approx(50 * 60)
    assert b0.twa_locf == pytest.approx((1 * 20 + 3 * 30) / 50)
    # linear: seg1 ramps 1→3 over 20min (mean 2); seg2 ramps 3→5 over 60min,
    # first half mean = (3 + 4)/2
    assert b0.twa_linear == pytest.approx((2 * 20 + 3.5 * 30) / 50)
    # bin 1: seg2's last 30min; locf still 3; linear second half mean 4.5
    b1 = got[("a", 1)]
    assert b1.covered_s == pytest.approx(30 * 60)
    assert b1.twa_locf == pytest.approx(3.0)
    assert b1.twa_linear == pytest.approx(4.5)


def test_matches_loop_reference_random(spark):
    rng = np.random.default_rng(23)
    frames = []
    for d in range(6):
        n = int(rng.integers(2, 120))
        # irregular gaps from seconds to multiple hours, straddling bins
        gaps = rng.exponential(1800, size=n).astype("int64") + 1
        ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.to_timedelta(
            np.cumsum(gaps), unit="s"
        )
        vals = rng.normal(50, 10, size=n)
        vals[rng.random(n) < 0.1] = np.nan
        frames.append(pd.DataFrame({"doc_id": f"d{d}", "ts": ts, "value": vals}))
    pdf = pd.concat(frames, ignore_index=True)
    sdf = spark.createDataFrame(pdf)
    exp = _loop_reference(pdf, HOUR_US)
    got = time_weighted_avg(sdf, "1h", keys=("doc_id",)).collect()
    assert len(got) == len(exp)
    for r in got:
        b = r.bin_ts.replace(tzinfo=None)
        key = (r.doc_id, int(pd.Timestamp(b).value // 1000) // HOUR_US)
        cov, locf, lin = exp[key]
        assert r.covered_s == pytest.approx(cov, rel=1e-9)
        assert r.twa_locf == pytest.approx(locf, rel=1e-9)
        assert r.twa_linear == pytest.approx(lin, rel=1e-9)


def test_matches_duckdb_oracle_on_events(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "value"
    )
    got = (
        time_weighted_avg(ev, "1h", keys=("user_id",))
        .orderBy("user_id", "bin_ts")
        .toPandas()
    )
    k = HOUR_US
    sql = f"""
    WITH seg AS (
      SELECT user_id, epoch_us(ts) AS e0, value AS v0,
             lead(epoch_us(ts)) OVER w AS e1, lead(value) OVER w AS v1
      FROM read_parquet('{SF}/events.parquet')
      WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    ex AS (
      SELECT *, unnest(generate_series(e0 // {k}, (e1 - 1) // {k})) AS b
      FROM seg WHERE e1 IS NOT NULL AND e1 > e0
    ),
    c AS (
      SELECT user_id, b,
             greatest(e0, b * {k}) AS lo,
             least(e1, (b + 1) * {k}) AS hi,
             e0, e1, v0, v1
      FROM ex
    )
    SELECT user_id, b,
           sum(hi - lo) / 1e6 AS covered_s,
           sum(v0 * (hi - lo)) / sum(hi - lo) AS twa_locf,
           sum(((v0 + (v1 - v0) * (lo - e0) / (e1 - e0))
              + (v0 + (v1 - v0) * (hi - e0) / (e1 - e0))) / 2 * (hi - lo))
             / sum(hi - lo) AS twa_linear
    FROM c GROUP BY user_id, b ORDER BY user_id, b
    """
    exp = duckdb.sql(sql).df()
    assert len(got) == len(exp)
    got_b = got["bin_ts"].astype("int64").to_numpy() // 1000 // k
    np.testing.assert_array_equal(got["user_id"].to_numpy(), exp["user_id"].to_numpy())
    np.testing.assert_array_equal(got_b, exp["b"].to_numpy())
    for col in ("covered_s", "twa_locf", "twa_linear"):
        np.testing.assert_allclose(
            got[col].to_numpy(), exp[col].to_numpy(), rtol=1e-9, err_msg=col
        )


def test_single_observation_and_nulls_yield_no_rows(spark):
    rows = [
        ("lone", "2024-01-01 00:10:00", 7.0),
        ("nullpair", "2024-01-01 00:10:00", None),
        ("nullpair", "2024-01-01 00:20:00", 2.0),
    ]
    df = _tsdf(spark, rows)
    assert time_weighted_avg(df, "1h", keys=("doc_id",)).count() == 0


def test_bin_guard_raises_on_degenerate_span(spark):
    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2025-01-01 00:00:00", 2.0),  # one year apart
    ]
    df = _tsdf(spark, rows)
    with pytest.raises(Exception, match="max_bins_per_segment"):
        time_weighted_avg(
            df, "1m", keys=("doc_id",), max_bins_per_segment=1000
        ).collect()


def test_facade_verb_equals_operator(spark):
    from gensor_spark.api import Dataset

    ds = Dataset.from_parquet(spark, SF)
    via_verb = ds.time_weighted("1h")
    direct = time_weighted_avg(ds.df, "1h", keys=ds.keys)
    assert via_verb.schema == direct.schema
    assert via_verb.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_verb).count() == 0


def test_plan_no_python_and_two_shuffles(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "ts", "value")
    plan = (
        time_weighted_avg(ev, "1h", keys=("user_id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one Exchange for the lead window, partial agg before the final one
    assert plan.count("Exchange") <= 2


# ------------------------------------------------------------ time_in_state

def test_time_in_state_hand_fixture(spark):
    """States A(0s)→B(90s)→A(150s)→end(240s), 60s bins: clip arithmetic by
    hand. Bin0: A 60s. Bin1: A 30s + B 30s. Bin2: B 30s + A 30s.
    Bin3: A 60s (span ends exactly on the 240s boundary)."""
    from datetime import datetime, timedelta

    from gensor_spark.operators.twa import time_in_state

    t0 = datetime(2024, 1, 1)
    rows = [("d", "s", t0 + timedelta(seconds=sec), st)
            for sec, st in ((0, "A"), (90, "B"), (150, "A"), (240, "END"))]
    pts = spark.createDataFrame(
        rows, "doc_id string, source string, ts timestamp, value string")
    out = time_in_state(pts, "1m", state_col="value").toPandas()
    got = {(r["bin_ts"].second + r["bin_ts"].minute * 60, r["state"]):
           (r["seconds"], r["frac"]) for _, r in out.iterrows()}
    assert got[(0, "A")] == (60.0, 1.0)
    assert got[(60, "A")] == (30.0, 0.5) and got[(60, "B")] == (30.0, 0.5)
    assert got[(120, "B")] == (30.0, 0.5) and got[(120, "A")] == (30.0, 0.5)
    assert got[(180, "A")] == (60.0, 1.0)
    # END has no following observation: never a state row
    assert not any(s == "END" for (_, s) in got)
    assert len(got) == 6


def test_time_in_state_matches_duckdb(spark, points_sdf, points_pdf):
    """Quantized states over the conftest series vs a DuckDB lead+clip
    oracle at 1h bins."""
    import duckdb

    from gensor_spark.operators.twa import time_in_state
    from pyspark.sql import functions as F

    pts = points_sdf.filter("value IS NOT NULL").withColumn(
        "state", F.when(F.col("value") > 100, "hi").otherwise("lo"))
    got = (time_in_state(pts, "1h", state_col="state")
           .orderBy("doc_id", "source", "bin_ts", "state").toPandas())
    con = duckdb.connect()
    pdf = points_pdf.copy()
    pdf["state"] = np.where(pdf["value"] > 100, "hi", "lo")
    con.register("pts", pdf.dropna(subset=["value"]))
    exp = con.execute("""
        WITH seg AS (
          SELECT doc_id, source, state,
                 epoch_us(ts) AS e0,
                 lead(epoch_us(ts)) OVER (PARTITION BY doc_id, source
                                          ORDER BY epoch_us(ts)) AS e1
          FROM pts
        ), g AS (
          SELECT doc_id, source, state, e0, e1,
                 unnest(generate_series(e0 // 3600000000,
                                        (e1 - 1) // 3600000000)) AS b
          FROM seg WHERE e1 IS NOT NULL AND e1 > e0
        ), clipped AS (
          SELECT doc_id, source, b, state,
                 (least(e1, (b + 1) * 3600000000)
                  - greatest(e0, b * 3600000000)) AS us
          FROM g
        ), s AS (
          SELECT doc_id, source, b, state, SUM(us) AS us
          FROM clipped GROUP BY 1, 2, 3, 4
        )
        SELECT doc_id, source, make_timestamp(b * 3600000000) AS bin_ts,
               state, us / 1e6 AS seconds,
               us * 1.0 / SUM(us) OVER (PARTITION BY doc_id, source, b)
                 AS frac
        FROM s ORDER BY doc_id, source, bin_ts, state
    """).df()
    assert len(got) == len(exp) > 0
    np.testing.assert_allclose(got["seconds"].to_numpy(float),
                               exp["seconds"].to_numpy(float), rtol=1e-12)
    np.testing.assert_allclose(got["frac"].to_numpy(float),
                               exp["frac"].to_numpy(float), rtol=1e-12)
