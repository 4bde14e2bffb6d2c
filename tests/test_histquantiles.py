"""Exact histogram-partial quantile rollups vs DuckDB quantile_cont.

The claim under test: a value-count histogram partial is a LOSSLESS
mergeable state for bounded-integer (token) data, so quantiles derived from
cascaded 1m→1h histograms equal quantiles computed from the raw points —
exactly, not approximately.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from gensor_spark.operators.histquantiles import (
    cascade_hist,
    quantiles_from_hist,
    rollup_hist,
    rollup_quantiles,
)
from gensor_spark.operators.points import events_to_points

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pts(spark):
    df = events_to_points(
        spark.read.parquet(f"{SF}/events.parquet")).cache()
    yield df
    # see test_api.ds: cached plans leak into later files' physical plans
    df.unpersist()


def _duck_quantiles(pdf: pd.DataFrame, step_s: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("p", pdf)
    return con.execute(f"""
        SELECT doc_id, source,
               to_timestamp(floor(epoch(ts) / {step_s}) * {step_s}) AS bin_ts,
               quantile_cont(value, 0.5)  AS p50,
               quantile_cont(value, 0.95) AS p95,
               quantile_cont(value, 0.99) AS p99
        FROM p WHERE value IS NOT NULL
        GROUP BY 1, 2, 3
    """).df()


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    key = ["doc_id", "source", "bin_ts"]
    for df in (got, want):
        # normalize tz repr: Spark hands back session-UTC naive, DuckDB aware
        df["bin_ts"] = pd.to_datetime(df["bin_ts"], utc=True).dt.tz_localize(None)
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) > 0
    for c in key:
        assert (g[c].astype(str) == w[c].astype(str)).all()
    for c in ("p50", "p95", "p99"):
        np.testing.assert_allclose(
            g[c].to_numpy(float), w[c].to_numpy(float), rtol=1e-12
        )


def test_direct_hist_quantiles_match_duckdb(spark, pts):
    got = rollup_quantiles(pts, "1h", via_tier=None).toPandas()
    want = _duck_quantiles(pts.toPandas(), 3600)
    _cmp(got, want)


def test_cascaded_equals_direct_and_duckdb(spark, pts):
    """1m→1h cascaded histograms give the SAME quantiles as histogramming
    at 1h directly, and both equal DuckDB over raw points — the mergeable-
    state property that makes percentiles maintainable incrementally."""
    via = rollup_quantiles(pts, "1h", via_tier="1m").toPandas()
    want = _duck_quantiles(pts.toPandas(), 3600)
    _cmp(via, want)


def test_hist_merge_is_associative_across_splits(spark, pts):
    """Histograms built over ANY disjoint split of the rows merge to the
    same state: quantiles from (half A ∪ half B) partials equal the
    unsplit computation — the backfill/wave compatibility property."""
    a = rollup_hist(pts.filter("pmod(seq, 2) = 0"), "1h")
    b = rollup_hist(pts.filter("pmod(seq, 2) = 1"), "1h")
    from gensor_spark.operators.histquantiles import merge_hist

    merged = merge_hist(a.unionByName(b), ["doc_id", "source", "bin_ts"])
    got = quantiles_from_hist(merged).toPandas()
    want = rollup_quantiles(pts, "1h", via_tier=None).toPandas()
    _cmp(got, want)


def test_known_values_and_interpolation(spark):
    """Hand-checked type-7 interpolation on a tiny fixture, incl. repeated
    values (the histogram's count > 1 path) and a singleton bin."""
    ts = pd.to_datetime(["2024-01-01 00:00:10", "2024-01-01 00:00:20",
                         "2024-01-01 00:00:30", "2024-01-01 00:00:40",
                         "2024-01-01 01:00:05"], utc=True)
    pdf = pd.DataFrame({
        "doc_id": "d", "source": "s", "ts": ts,
        "value": [1.0, 2.0, 2.0, 10.0, 7.0],
        "seq": range(5),
    })
    out = rollup_quantiles(
        spark.createDataFrame(pdf), "1h", ps=(0.5, 0.75), via_tier="1m"
    ).toPandas().sort_values("bin_ts").reset_index(drop=True)
    # bin 0: sorted [1, 2, 2, 10]; p50: h=1.5 -> 2 + 0.5*(2-2) = 2
    #        p75: h=2.25 -> x_2(=2) + 0.25*(x_3(=10) - 2) = 4
    assert out.loc[0, "p50"] == pytest.approx(2.0)
    assert out.loc[0, "p75"] == pytest.approx(4.0)
    # singleton bin: every quantile is the value itself
    assert out.loc[1, "p50"] == pytest.approx(7.0)
    assert out.loc[1, "p75"] == pytest.approx(7.0)


def test_plan_is_jvm_side_single_exchange_finalizer(spark, pts):
    hist = rollup_hist(pts, "1h")
    plan = quantiles_from_hist(hist)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the window and the final agg share the (keys, bin) partitioning: the
    # finalizer adds at most ONE exchange above the histogram build
    above = plan.split("InMemoryTableScan")[0]
    n_hist_exchanges = 2  # groupBy(keys,bin,v) + regroup to map
    assert above.count("Exchange hashpartitioning") <= 1 + n_hist_exchanges


def test_docs_arrow_hist_kernel_equals_explode_path(spark):
    """The affine Arrow histogram kernel is bit-identical to
    rollup_hist(docs_to_points(docs)) — same bins, same value-count maps."""
    from gensor_spark.operators.histquantiles import rollup_hist_docs_arrow
    from gensor_spark.operators.points import docs_to_points
    from gensor_spark.sources.synth import synth_docs

    docs = synth_docs(spark, n_docs=25, seed=11, min_tok=1, max_tok=500)
    fast = rollup_hist_docs_arrow(docs, "1m").toPandas()
    slow = rollup_hist(docs_to_points(docs), "1m").toPandas()
    key = ["doc_id", "source", "bin_ts"]
    f = fast.sort_values(key).reset_index(drop=True)
    s = slow.sort_values(key).reset_index(drop=True)
    assert len(f) == len(s) > 0
    for c in key:
        assert (f[c].astype(str) == s[c].astype(str)).all()
    for hf, hs in zip(f["hist"], s["hist"]):
        assert dict(hf) == dict(hs)


def test_docs_arrow_hist_kernel_rejects_out_of_range(spark):
    from gensor_spark.operators.histquantiles import rollup_hist_docs_arrow

    bad = spark.createDataFrame(
        [("d", "s", [1, 2, -5])], "doc_id string, source string, tokens array<int>")
    import pytest as _pytest

    with _pytest.raises(Exception, match="2\\^24"):
        rollup_hist_docs_arrow(bad, "1m").collect()
