"""interval_join vs a DuckDB theta-join oracle + edge fixtures."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.intervaljoin import interval_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = ev.select(
        F.col("user_id").cast("string").alias("doc_id"), "ts",
        F.col("value").alias("v"),
    )
    # deterministic synthetic intervals: every 6h window where the user had
    # an error event, padded ±1h — irregular, overlapping-free per key
    ivs = (
        ev.filter("event_type = 'error'")
        .select(
            F.col("user_id").cast("string").alias("doc_id"),
            (F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / 21600) * 21600 - 3600
            )).alias("start_ts"),
            (F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / 21600) * 21600 + 25200
            )).alias("end_ts"),
            F.lit("incident").alias("label"),
        )
        .distinct()
    )
    return pts, ivs


def _canon(pdf):
    pdf = pdf[["doc_id", "ts", "v", "start_ts", "end_ts", "label"]].copy()
    for c in ("ts", "start_ts", "end_ts"):
        pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("bucket", [3600, 86400])
def test_interval_join_matches_duckdb(spark, sides, how, bucket):
    pts, ivs = sides
    got = interval_join(pts, ivs, keys=("doc_id",), how=how,
                        bucket_seconds=bucket).toPandas()
    con = duckdb.connect()
    con.register("p", pts.toPandas())
    con.register("iv", ivs.toPandas())
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    want = con.execute(f"""
        SELECT p.doc_id, p.ts, p.v, iv.start_ts, iv.end_ts, iv.label
        FROM p {join_kw} iv
          ON p.doc_id = iv.doc_id
         AND p.ts >= iv.start_ts AND p.ts < iv.end_ts
    """).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    assert len(got) > 0
    if how == "inner":
        assert len(got) < pts.count()  # join is selective, not degenerate


def test_interval_join_edges(spark):
    pts = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0),   # == start: contained
         ("a", "2024-01-01 06:00:00", 2.0),   # == end: excluded
         ("a", "2024-03-15 12:00:00", 3.0),   # inside a 90-day interval
         ("a", "2024-06-01 00:00:00", 4.0),   # uncovered
         ("b", "2024-01-01 01:00:00", 5.0)],  # other key, overlapping ivs
        "doc_id string, ts_s string, v double",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    ivs = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-01 06:00:00", "short"),
         ("a", "2024-01-10 00:00:00", "2024-04-10 00:00:00", "quarter"),
         ("b", "2024-01-01 00:00:00", "2024-01-01 02:00:00", "x"),
         ("b", "2024-01-01 00:30:00", "2024-01-01 03:00:00", "y")],
        "doc_id string, s string, e string, label string",
    ).select("doc_id", F.col("s").cast("timestamp").alias("start_ts"),
             F.col("e").cast("timestamp").alias("end_ts"), "label")

    inner = interval_join(pts, ivs, keys=("doc_id",), bucket_seconds=3600)
    rows = sorted((r.v, r.label) for r in inner.collect())
    # v=1 in 'short' (start-inclusive); v=2 NOT (end-exclusive); v=3 in the
    # 2160-bucket 'quarter'; v=4 nowhere; v=5 in BOTH b-intervals
    assert rows == [(1.0, "short"), (3.0, "quarter"), (5.0, "x"), (5.0, "y")]

    left = interval_join(pts, ivs, keys=("doc_id",), bucket_seconds=3600,
                         how="left")
    null_vs = sorted(r.v for r in left.collect() if r.label is None)
    assert null_vs == [2.0, 4.0]

    with pytest.raises(Exception, match="buckets"):
        interval_join(pts, ivs, keys=("doc_id",), bucket_seconds=3600,
                      max_buckets_per_interval=10).collect()


def test_interval_join_plan_is_equi(spark, sides):
    """The whole point: containment must ride an EQUI join on the bucket
    grid, never a BroadcastNestedLoopJoin/CartesianProduct."""
    pts, ivs = sides
    plan = interval_join(pts, ivs, keys=("doc_id",))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_null_bounded_intervals_dropped(spark):
    """An interval with a NULL bound is dropped (mask-don't-crash), never
    routed into the too-many-buckets raise_error branch."""
    pts = spark.createDataFrame(
        [("a", "2024-01-01 01:00:00", 1.0)],
        "doc_id string, ts_s string, v double",
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    ivs = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-01 02:00:00", "ok"),
         ("a", None, "2024-01-01 02:00:00", "null_start"),
         ("a", "2024-01-01 00:00:00", None, "null_end")],
        "doc_id string, s string, e string, label string",
    ).select("doc_id", F.col("s").cast("timestamp").alias("start_ts"),
             F.col("e").cast("timestamp").alias("end_ts"), "label")
    got = interval_join(pts, ivs, keys=("doc_id",),
                        bucket_seconds=3600).collect()
    assert [(r.v, r.label) for r in got] == [(1.0, "ok")]


# ------------------------------------------------------- interval_union_length

def _union_ref(spans):
    """Brute-force sweep reference: merge sorted [s, e) spans."""
    spans = sorted(spans)
    total = islands = 0
    cur_s = cur_e = None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
            islands += 1
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total, islands


def test_interval_union_matches_bruteforce(spark):
    import numpy as np

    from gensor_spark.operators.intervaljoin import interval_union_length

    rng = np.random.default_rng(13)
    rows, ref = [], {}
    base = 1_700_000_000_000_000  # us epoch
    for d in range(8):
        spans = []
        for _ in range(int(rng.integers(1, 40))):
            s = base + int(rng.integers(0, 10_000)) * 1_000_000
            e = s + int(rng.integers(1, 2_000)) * 1_000_000
            spans.append((s, e))
        ref[str(d)] = _union_ref(spans)
        rows += [(str(d),
                  pd.Timestamp(s, unit="us", tz="UTC").to_pydatetime(),
                  pd.Timestamp(e, unit="us", tz="UTC").to_pydatetime())
                 for s, e in spans]
    df = spark.createDataFrame(rows, "doc_id string, start_ts timestamp, end_ts timestamp")
    got = {r.doc_id: (r.covered_us, r.n_islands)
           for r in interval_union_length(df).collect()}
    for d, (total, islands) in ref.items():
        assert got[d] == (total, islands), d


def test_interval_union_matches_duckdb(spark):
    """Engine-vs-engine on the derived per-(doc, source) span table: spans
    of one doc's sources genuinely overlap."""
    import duckdb

    from gensor_spark.operators.intervaljoin import interval_union_length
    from gensor_spark.operators.points import events_to_points

    pts = events_to_points(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    spans = pts.groupBy("doc_id", "source").agg(
        F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    got = interval_union_length(spans, keys=("doc_id",)).toPandas()
    con = duckdb.connect()
    con.register("sp", spans.toPandas())
    want = con.execute("""
        WITH iv AS (SELECT doc_id, epoch_us(start_ts) s, epoch_us(end_ts) e
                    FROM sp WHERE end_ts > start_ts),
        o AS (SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pme
              FROM iv),
        isl AS (SELECT doc_id, s, e,
                       sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
                FROM o),
        agg AS (SELECT doc_id, island, count(*) n, max(e) - min(s) len
                FROM isl GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(n) AS BIGINT) n_intervals,
               count(*) n_islands, CAST(sum(len) AS BIGINT) covered_us
        FROM agg GROUP BY 1
    """).df()
    g = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    assert len(g) == len(w) > 0
    for c in ("doc_id", "n_intervals", "n_islands", "covered_us"):
        assert (g[c] == w[c]).all(), c


def test_interval_union_masks_and_plan(spark):
    from gensor_spark.operators.intervaljoin import interval_union_length

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
         ("a", None, "2024-01-01 02:00:00"),          # null start: dropped
         ("a", "2024-01-01 03:00:00", "2024-01-01 03:00:00"),  # empty
         ("a", "2024-01-01 00:30:00", "2024-01-01 00:40:00")],  # contained
        "doc_id string, start_ts string, end_ts string")
    row = interval_union_length(df).collect()[0]
    assert row.n_intervals == 2 and row.n_islands == 1
    assert row.covered_us == 3_600_000_000
    plan = interval_union_length(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
