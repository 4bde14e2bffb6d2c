"""SLO burn-rate alerting (operators/slo.py): DuckDB RANGE-window oracle
parity, hand-computed burn on a planted incident, the two-window
page/clear behavior, plan shape (one Exchange, one Sort for both frames),
and validation."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.slo import burn_rate, multiwindow_burn_alerts


@pytest.fixture(scope="module")
def incident_pdf():
    """One request per 10s for 2h; error rate 0.1% except a 20-minute
    incident at 50% starting minute 60."""
    rows = []
    t0 = datetime(2024, 1, 1)
    for d in ("svc_a", "svc_b"):
        for i in range(720):
            ts = t0 + timedelta(seconds=10 * i)
            in_incident = d == "svc_a" and 360 <= i < 480
            err = (i % 2 == 0) if in_incident else (i % 1000 == 999)
            rows.append((d, "prod", ts, bool(err)))
    return pd.DataFrame(rows, columns=["doc_id", "source", "ts", "is_error"])


@pytest.fixture(scope="module")
def incident_sdf(spark, incident_pdf):
    sdf = spark.createDataFrame(incident_pdf).cache()
    yield sdf
    sdf.unpersist()


def test_burn_matches_duckdb_range_window(spark, incident_sdf, incident_pdf):
    got = (
        burn_rate(incident_sdf, "is_error", slo_target=0.999,
                  window_seconds=600)
        .orderBy("doc_id", "ts").toPandas()
    )
    con = duckdb.connect()
    con.register("pts", incident_pdf)
    exp = con.execute("""
        SELECT doc_id, ts,
               COUNT(*) OVER w AS win_total,
               SUM(CAST(is_error AS INT)) OVER w AS win_errors,
               (SUM(CAST(is_error AS INT)) OVER w * 1.0
                / COUNT(*) OVER w) / 0.001 AS burn
        FROM pts
        WINDOW w AS (PARTITION BY doc_id, source
                     ORDER BY epoch(ts)
                     RANGE BETWEEN 599 PRECEDING AND CURRENT ROW)
        ORDER BY doc_id, ts
    """).df()
    np.testing.assert_array_equal(got["win_total"], exp["win_total"])
    np.testing.assert_array_equal(got["win_errors"], exp["win_errors"])
    np.testing.assert_allclose(got["burn"].to_numpy(float),
                               exp["burn"].to_numpy(float), rtol=1e-12)


def test_incident_pages_and_clears(spark, incident_sdf):
    out = multiwindow_burn_alerts(
        incident_sdf, "is_error", slo_target=0.999,
        long_seconds=3600, short_seconds=300, threshold=14.4,
    ).toPandas()
    a = out[out.doc_id == "svc_a"].sort_values("ts").reset_index(drop=True)
    b = out[out.doc_id == "svc_b"]
    # the healthy service never alerts
    assert not b["alerting"].any()
    # the incident service alerts INSIDE the incident...
    incident = a.iloc[360:480]
    assert incident["alerting"].any()
    # ...not before it...
    assert not a.iloc[:360]["alerting"].any()
    # ...and the SHORT window clears the alert well before the long
    # window's burn decays (the reset property the 2-window rule buys)
    post = a.iloc[510:]  # 5+ minutes after the incident ends
    assert not post["alerting"].any()
    assert (post["burn_long"] > 14.4).any()  # long window alone would page


def test_hand_computed_burn_steady_state():
    """50% errors against a 99.9% SLO = burn 500, exactly."""
    from gensor_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    t0 = datetime(2024, 1, 1)
    rows = [("d", "s", t0 + timedelta(seconds=i), i % 2 == 0)
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, ts timestamp, is_error boolean")
    out = burn_rate(df, "is_error", 0.999, window_seconds=100).orderBy(
        "ts").toPandas()
    assert out["burn"].iloc[-1] == pytest.approx(500.0)


def test_plan_one_exchange_one_sort(spark, incident_sdf):
    out = multiwindow_burn_alerts(incident_sdf, "is_error", 0.999)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") <= 1 or plan.count("+- Sort") <= 1


def test_validation(spark, incident_sdf):
    with pytest.raises(ValueError, match="slo_target"):
        burn_rate(incident_sdf, "is_error", 1.5, 60)
    with pytest.raises(ValueError, match="window_seconds"):
        burn_rate(incident_sdf, "is_error", 0.99, 0)
    with pytest.raises(ValueError, match="shorter"):
        multiwindow_burn_alerts(incident_sdf, "is_error", 0.99,
                                long_seconds=300, short_seconds=300)
