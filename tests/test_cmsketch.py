"""Count-Min sketch tiers: deterministic lower bound, bit-exact cascade/merge,
point-query semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.cmsketch import (
    cascade_cms,
    estimate_cms,
    merge_cms,
    rollup_cms,
)

SF = "/root/testdata/sf0.001"
DEPTH, WIDTH = 4, 256


@pytest.fixture(scope="module")
def item_points(spark):
    """sf0.001 events as (doc_id, source, ts, item) — values floor-quantized
    to long so point queries have a discrete domain."""
    from gensor_spark.operators.points import events_to_points

    pts = (
        events_to_points(spark.read.parquet(f"{SF}/events.parquet"))
        .withColumn("item", F.floor("value").cast("long"))
        .select("doc_id", "source", "ts", "item")
    )
    df = pts.cache()
    yield df
    df.unpersist()


def _epoch(s: pd.Series) -> pd.Series:
    return pd.to_datetime(s).astype("datetime64[ns]").astype("int64") // 10**9


def _exact(pdf: pd.DataFrame, step: int) -> pd.DataFrame:
    out = pdf.dropna(subset=["item"]).copy()
    out["bin_ts"] = (_epoch(out["ts"]) // step) * step
    return (
        out.groupby(["doc_id", "source", "bin_ts", "item"])
        .size()
        .rename("true_cnt")
        .reset_index()
    )


def test_estimate_never_undercounts(spark, item_points):
    cms = rollup_cms(item_points, "1h", of="item", depth=DEPTH, width=WIDTH)
    raw = item_points.toPandas()
    exact = _exact(raw, 3600)
    items = spark.createDataFrame(
        [(int(i),) for i in sorted(exact["item"].unique())], "item long"
    )
    est = estimate_cms(cms, items, depth=DEPTH, width=WIDTH).toPandas()
    est["bin_ts"] = _epoch(est["bin_ts"])
    merged = est.merge(
        exact, on=["doc_id", "source", "bin_ts", "item"], how="left"
    ).fillna({"true_cnt": 0})
    # the CMS one-sided guarantee is DETERMINISTIC: never an undercount
    assert (merged["est"] >= merged["true_cnt"]).all()
    # and on this fixture (fixed data, fixed hash family) the classic
    # eps*N overshoot bound holds for every query at e/width
    n_per_bin = merged.groupby(["doc_id", "source", "bin_ts"])["true_cnt"].transform("sum")
    eps = np.e / WIDTH
    assert ((merged["est"] - merged["true_cnt"]) <= eps * n_per_bin + 1e-9).all()


def test_cascade_is_counter_identical_to_direct(spark, item_points):
    direct = rollup_cms(item_points, "1h", of="item", depth=DEPTH, width=WIDTH)
    cascaded = cascade_cms(
        rollup_cms(item_points, "1m", of="item", depth=DEPTH, width=WIDTH), "1h"
    )
    cols = ["doc_id", "source", "bin_ts", "row", "col", "cnt"]
    a = direct.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    b = cascaded.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_merge_equals_direct_across_contributions(spark, item_points):
    lo = item_points.filter(F.dayofmonth("ts") <= 15)
    hi = item_points.filter(F.dayofmonth("ts") > 15)
    parts = rollup_cms(lo, "1d", of="item", depth=DEPTH, width=WIDTH).unionByName(
        rollup_cms(hi, "1d", of="item", depth=DEPTH, width=WIDTH)
    )
    merged = merge_cms(parts, ["doc_id", "source", "bin_ts"])
    direct = rollup_cms(item_points, "1d", of="item", depth=DEPTH, width=WIDTH)
    cols = ["doc_id", "source", "bin_ts", "row", "col", "cnt"]
    a = merged.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    b = direct.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_small_exact_fixture_and_absent_item(spark):
    # 3 known items in one bin, huge width => collision-free => exact,
    # and an unseen item reads 0 (all its slots empty)
    rows = [("d", "s", "2024-01-01 00:00:05", 7)] * 5 \
        + [("d", "s", "2024-01-01 00:00:10", 8)] * 3 \
        + [("d", "s", "2024-01-01 00:00:20", 9)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, ts string, item long"
    ).withColumn("ts", F.to_timestamp("ts"))
    cms = rollup_cms(df, "1m", of="item", depth=4, width=1 << 20)
    items = spark.createDataFrame([(7,), (8,), (9,), (12345,)], "item long")
    got = (
        estimate_cms(cms, items, depth=4, width=1 << 20)
        .toPandas().set_index("item")["est"].to_dict()
    )
    assert got == {7: 5, 8: 3, 9: 1, 12345: 0}


def test_nulls_ignored_and_param_validation(spark):
    df = spark.createDataFrame(
        [("d", "s", "2024-01-01 00:00:05", None),
         ("d", "s", "2024-01-01 00:00:06", 1)],
        "doc_id string, source string, ts string, item long",
    ).withColumn("ts", F.to_timestamp("ts"))
    cms = rollup_cms(df, "1m", of="item", depth=2, width=64)
    assert cms.agg(F.sum("cnt")).first()[0] == 2  # 1 item x depth 2
    with pytest.raises(ValueError):
        rollup_cms(df, "1m", of="item", depth=0)
    with pytest.raises(ValueError):
        rollup_cms(df, "1m", of="item", width=1)
