"""Purged time-series CV: DuckDB oracle + leakage/coverage invariants."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.cvsplit import purged_time_folds


@pytest.fixture(scope="module")
def ts_df(spark):
    # 1000 points, 1-minute cadence, one NULL timestamp
    pdf = pd.DataFrame({
        "doc_id": [f"d{i % 7}" for i in range(1000)],
        "ts": pd.date_range("2024-01-01", periods=1000, freq="min", tz="UTC"),
        "value": [float(i) for i in range(1000)],
    })
    df = spark.createDataFrame(pdf)
    null_row = spark.createDataFrame(
        [("dnull", None, 0.0)], "doc_id string, ts timestamp, value double")
    return df.unionByName(null_row)


def test_folds_match_duckdb(spark, ts_df):
    n, emb = 5, 600.0
    got = (purged_time_folds(ts_df, n_folds=n, embargo_seconds=emb,
                             keep_purged=True)
           .select("fold", "role", "value")
           .orderBy("fold", "value").toPandas())
    con = duckdb.connect()
    con.register("t", ts_df.toPandas())
    exp = con.execute(f"""
        WITH span AS (SELECT min(epoch(ts)) AS lo, max(epoch(ts)) AS hi
                      FROM t WHERE ts IS NOT NULL),
        folds AS (SELECT unnest(range({n})) AS fold),
        j AS (SELECT t.value, epoch(t.ts) AS e, f.fold,
                     lo + f.fold * (hi - lo) / {n} AS blo,
                     lo + (f.fold + 1) * (hi - lo) / {n} AS bhi
              FROM t, folds f, span WHERE t.ts IS NOT NULL)
        SELECT fold,
               CASE WHEN e >= blo AND (CASE WHEN fold = {n} - 1
                                            THEN e <= bhi ELSE e < bhi END)
                    THEN 'test'
                    WHEN e < blo - {emb} OR e >= bhi + {emb} THEN 'train'
                    ELSE 'purged' END AS role,
               value
        FROM j ORDER BY fold, value
    """).df()
    assert list(got["fold"]) == list(exp["fold"])
    assert list(got["role"]) == list(exp["role"])
    assert list(got["value"]) == list(exp["value"])


def test_every_row_tests_exactly_once(spark, ts_df):
    out = purged_time_folds(ts_df, n_folds=4).where(F.col("role") == "test")
    per_row = out.groupBy("value").count().collect()
    assert len(per_row) == 1000 and all(r["count"] == 1 for r in per_row)
    # null-ts row belongs to no fold
    assert out.where(F.col("doc_id") == "dnull").count() == 0


def test_embargo_purges_boundary_rows(spark, ts_df):
    emb = 1800.0  # 30 min = 30 rows on each side of each test block
    with_p = purged_time_folds(ts_df, n_folds=5, embargo_seconds=emb,
                               keep_purged=True)
    rows = with_p.where(F.col("fold") == 2).orderBy("value").collect()
    by_role = {}
    for r in rows:
        by_role.setdefault(r.role, []).append(r.value)
    test_lo, test_hi = min(by_role["test"]), max(by_role["test"])
    # no train row inside the embargoed halo
    assert all(v < test_lo - 30 or v > test_hi + 30 for v in by_role["train"])
    # purged rows are exactly the halo (interior folds: both sides populated)
    assert by_role["purged"]
    assert all(test_lo - 30 <= v < test_lo or test_hi < v <= test_hi + 30
               for v in by_role["purged"])
    # default drops purged rows
    no_p = purged_time_folds(ts_df, n_folds=5, embargo_seconds=emb)
    assert no_p.where(F.col("role") == "purged").count() == 0


def test_zero_embargo_partitions_cleanly(spark, ts_df):
    out = purged_time_folds(ts_df, n_folds=5, keep_purged=True)
    assert out.where(F.col("role") == "purged").count() == 0
    counts = dict(out.groupBy("fold").count().collect())
    assert counts == {i: 1000 for i in range(5)}
    with pytest.raises(ValueError):
        purged_time_folds(ts_df, n_folds=1)


def test_plan_is_rowlocal_after_span(spark, ts_df):
    plan = (purged_time_folds(ts_df, n_folds=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    # only the 1-row span aggregate shuffles (single-partition exchange)
    assert plan.count("Exchange hashpartitioning") == 0
