"""asof_join vs DuckDB's native ASOF JOIN + pandas merge_asof.

The driver additionally oracle-checks the bucketed backward path as the
`asof_join` registry query; here BOTH physical strategies (per-key window;
bucketed boundary-carry) × every direction/strictness combination are
verified against DuckDB and pandas on events-derived series, plus targeted
edge fixtures and a randomized full-parity sweep.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    base = ev.select(
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("source"),
        "ts", "value",
    )
    left = base.filter("source = 'click'").drop("source") \
               .withColumnRenamed("value", "lv")
    right = base.filter("source = 'view'").drop("source") \
                .withColumnRenamed("value", "rv")
    return left, right


def _oracle(keys_sql="doc_id"):
    return f"""
    SELECT l.doc_id, l.ts, l.lv, r.ts AS right_ts, r.rv
    FROM left_t l ASOF LEFT JOIN right_t r
      ON l.{keys_sql} = r.{keys_sql} AND l.ts >= r.ts
    """


def _duck(left_pdf, right_pdf):
    con = duckdb.connect()
    con.register("left_t", left_pdf)
    con.register("right_t", right_pdf)
    return con.execute(_oracle()).df()


def _canon(pdf):
    pdf = pdf[["doc_id", "ts", "lv", "right_ts", "rv"]].copy()
    for c in ("ts", "right_ts"):
        pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return pdf.sort_values(["doc_id", "ts", "lv"]).reset_index(drop=True)


@pytest.mark.parametrize("bucket", [None, 6 * 3600])
def test_asof_matches_duckdb(spark, sides, bucket):
    left, right = sides
    got = asof_join(left, right, keys=("doc_id",),
                    bucket_seconds=bucket).toPandas()
    want = _duck(left.toPandas(), right.toPandas())
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_asof_ties_and_tolerance(spark):
    left = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 1.0),
         ("a", "2024-01-01 00:20:00", 2.0),
         ("a", "2024-01-01 02:00:00", 3.0),
         ("b", "2024-01-01 00:00:30", 4.0)],
        "doc_id string, ts string, lv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 10.0),   # tie: must match (<=)
         ("a", "2024-01-01 00:15:00", 11.0),
         ("b", "2024-01-01 01:00:00", 12.0)],  # after b's left row: no match
        "doc_id string, ts string, rv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    rows = {(r.doc_id, str(r.ts)): (r.rv, r.right_ts)
            for r in asof_join(left, right, keys=("doc_id",)).collect()}
    assert rows[("a", "2024-01-01 00:10:00")][0] == 10.0   # exact-ts tie
    assert rows[("a", "2024-01-01 00:20:00")][0] == 11.0
    assert rows[("a", "2024-01-01 02:00:00")][0] == 11.0   # stale but matched
    assert rows[("b", "2024-01-01 00:00:30")][0] is None   # nothing prior

    tol = {(r.doc_id, str(r.ts)): r.rv
           for r in asof_join(left, right, keys=("doc_id",),
                              tolerance_seconds=1800).collect()}
    assert tol[("a", "2024-01-01 00:20:00")] == 11.0
    assert tol[("a", "2024-01-01 02:00:00")] is None       # > 30 min stale


def test_asof_bucketed_boundary_carry(spark):
    """The only right row sits many empty buckets before the left rows —
    the carry must propagate it across the hole."""
    left = spark.createDataFrame(
        [("a", "2024-01-05 00:00:00", 1.0),    # bucket start, carry must win
         ("a", "2024-01-09 13:37:00", 2.0)],
        "doc_id string, ts string, lv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:00:01", 42.0)],
        "doc_id string, ts string, rv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(left, right, keys=("doc_id",),
                    bucket_seconds=3600).collect()
    assert sorted((r.lv, r.rv) for r in out) == [(1.0, 42.0), (2.0, 42.0)]
    # the carry is synthetic: the reported match ts must be the REAL right ts
    assert all(str(r.right_ts) == "2024-01-01 00:00:01" for r in out)


# --------------------------------------------------------------------------
# merge_asof parity: direction= and allow_exact_matches= (pandas oracle)
# --------------------------------------------------------------------------

def _pandas_asof(left_pdf, right_pdf, **kw):
    out = pd.merge_asof(
        left_pdf.sort_values("ts"),
        right_pdf.sort_values("ts").rename(columns={"ts": "right_ts"}),
        left_on="ts", right_on="right_ts", by="doc_id", **kw,
    )
    return out[["doc_id", "ts", "lv", "right_ts", "rv"]]


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("bucket", [None, 6 * 3600])
def test_asof_directions_match_pandas(spark, sides, direction, bucket):
    left, right = sides
    got = asof_join(left, right, keys=("doc_id",), direction=direction,
                    bucket_seconds=bucket).toPandas()
    want = _pandas_asof(left.toPandas(), right.toPandas(),
                        direction=direction)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_strict_inequality(spark, direction):
    left = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 1.0)],
        "doc_id string, ts string, lv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 10.0),   # exact tie
         ("a", "2024-01-01 00:05:00", 11.0),   # strictly before
         ("a", "2024-01-01 00:15:00", 12.0)],  # strictly after
        "doc_id string, ts string, rv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    loose = asof_join(left, right, keys=("doc_id",),
                      direction=direction).collect()[0]
    strict = asof_join(left, right, keys=("doc_id",), direction=direction,
                       allow_exact_matches=False).collect()[0]
    assert loose.rv == 10.0                      # tie matches either way
    assert strict.rv == (11.0 if direction == "backward" else 12.0)


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 1.0)],
        "doc_id string, ts string, lv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 00:05:00", 11.0),   # 5 min before
         ("a", "2024-01-01 00:15:00", 12.0)],  # 5 min after: exact tie
        "doc_id string, ts string, rv double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = asof_join(left, right, keys=("doc_id",),
                    direction="nearest").collect()[0]
    assert row.rv == 11.0 and str(row.right_ts) == "2024-01-01 00:05:00"


# --------------------------------------------------------------------------
# randomized property: every (direction, strictness, bucketing) combination
# matches pandas merge_asof on irregular multi-key series with ties
# --------------------------------------------------------------------------

def test_asof_randomized_full_parity(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")

    def mk(n, keys):
        return pd.DataFrame({
            "doc_id": rng.choice(keys, size=n),
            # second-resolution with deliberate collisions across sides
            "ts": base + pd.to_timedelta(rng.integers(0, 5000, size=n) * 7,
                                         unit="s"),
            "v": np.round(rng.normal(size=n), 3),
        })

    left_pdf = mk(400, ["a", "b", "c"]).rename(columns={"v": "lv"})
    # right must be unique per (key, ts): with ties there, "the" as-of match
    # is implementation-defined (pandas keeps its sort-order-last row, a
    # distributed window keeps encounter-order-last) — not a semantics bug
    right_pdf = (
        mk(300, ["a", "b", "d"]).rename(columns={"v": "rv"})
        .drop_duplicates(["doc_id", "ts"]).reset_index(drop=True)
    )
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)

    for direction in ("backward", "forward", "nearest"):
        for exact in (True, False):
            for bucket in (None, 3600):
                got = asof_join(
                    left, right, keys=("doc_id",), direction=direction,
                    allow_exact_matches=exact, bucket_seconds=bucket,
                ).toPandas()
                want = pd.merge_asof(
                    left_pdf.sort_values(["ts", "lv"]),
                    right_pdf.sort_values("ts").rename(
                        columns={"ts": "right_ts"}),
                    left_on="ts", right_on="right_ts", by="doc_id",
                    direction=direction, allow_exact_matches=exact,
                )[["doc_id", "ts", "lv", "right_ts", "rv"]]
                pd.testing.assert_frame_equal(
                    _canon(got), _canon(want),
                    obj=f"{direction}/exact={exact}/bucket={bucket}",
                )


def test_asof_nearest_keeps_null_keys(spark):
    """Left rows with NULL key columns must survive 'nearest' exactly like
    the single-direction paths (regression: the old two-pass form re-joined
    on the keys and silently dropped them only for 'nearest')."""
    left = spark.createDataFrame(
        [(None, "2024-01-01 01:00:00", 1.0),
         ("a", "2024-01-01 01:00:00", 2.0)],
        "doc_id string, ts_s string, lv double",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "lv")
    right = spark.createDataFrame(
        [(None, "2024-01-01 00:30:00", 10.0),
         ("a", "2024-01-01 01:10:00", 11.0)],
        "doc_id string, ts_s string, rv double",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "rv")

    for bucket in (None, 3600):
        got = {r.lv: r.rv for r in asof_join(
            left, right, keys=("doc_id",), direction="nearest",
            bucket_seconds=bucket,
        ).collect()}
        # the null-key left row is PRESENT; window partitioning groups null
        # keys, so it matches the null-key right row (SQL-join semantics
        # would give no match — either is defensible, grouping is what the
        # backward/forward paths already do, so nearest must agree)
        assert set(got) == {1.0, 2.0}, f"bucket={bucket}"
        assert got[2.0] == 11.0
        backward = {r.lv: r.rv for r in asof_join(
            left, right, keys=("doc_id",), direction="backward",
            bucket_seconds=bucket,
        ).collect()}
        assert got[1.0] == backward[1.0] == 10.0
