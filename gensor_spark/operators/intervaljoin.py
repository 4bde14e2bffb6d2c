"""Distributed interval (range) join: points ↔ labeled time intervals.

The second time-series join Spark lacks a scalable native form for
(the first being as-of, ``operators/asof.py``): match every point to the
interval(s) ``[start_ts, end_ts)`` containing it — maintenance windows,
deployment periods, fieldwork campaigns (gensor masks the latter with a
per-day equality trick, ``gensor/processing/compensation.py``; this is the
general containment form).

Why not a plain theta join: ``points JOIN ivs ON p.ts >= iv.start AND
p.ts < iv.end`` has no equi-key, so Catalyst plans BroadcastNestedLoopJoin
— O(points × intervals) comparisons and a broadcast requirement. Fine for
tens of intervals, fatal at millions.

Scale shape (the standard bucket-grid decomposition): pick a bucket width
``B``; each interval EXPLODES to one row per covered bucket (cost:
interval span / B rows — bounded by ``max_buckets_per_interval``); each
point maps to exactly one bucket; the join becomes an EQUI join on
``(keys, bucket)`` followed by the exact containment filter. Shuffle is
linear in points + interval-bucket rows, hot buckets spread like any
equi-join (AQE skew-split applies), and nothing is broadcast. Choose ``B``
near the median interval length: shorter ⇒ more interval rows, longer ⇒
more false candidates filtered after the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ("doc_id",)

_US = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 86400,
    how: str = "inner",
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point to every interval with ``start ≤ ts < end``.

    ``how``: 'inner' (matched points only, one row per (point, interval))
    or 'left' (every point, interval columns NULL when uncovered).
    Intervals wider than ``max_buckets_per_interval × bucket_seconds``
    raise rather than explode unboundedly — raise ``bucket_seconds``
    for genuinely huge spans.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    span = bucket_seconds * _US

    def us(c):
        return F.unix_micros(c.cast("timestamp"))

    iv_cols = [c for c in intervals.columns
               if c not in keys and c not in (start_col, end_col)]

    lo = F.floor(us(F.col(start_col)) / span)
    # end is EXCLUSIVE: an interval ending exactly on a bucket edge does
    # not cover that bucket
    hi = F.floor((us(F.col(end_col)) - 1) / span)
    n_buckets = (hi - lo + 1).cast("long")
    guarded = intervals.withColumn(
        "_nb",
        # null-bounded intervals must NOT fall through to raise_error (a
        # null n_buckets makes the <= condition null): mask-don't-crash —
        # they keep a null _nb and are dropped by the _nb > 0 filter below
        F.when(n_buckets.isNull(), F.lit(None).cast("long"))
        .when(n_buckets <= max_buckets_per_interval, n_buckets)
        .otherwise(
            F.raise_error(F.concat(
                F.lit("interval spans more than "
                      f"{max_buckets_per_interval} buckets of "
                      f"{bucket_seconds}s: "),
                F.col(start_col).cast("string"), F.lit(" .. "),
                F.col(end_col).cast("string"),
            ))
        ),
    )
    iv_b = guarded.filter(F.col("_nb") > 0).select(
        *keys, start_col, end_col, *iv_cols,
        F.explode(F.sequence(lo, hi)).alias("_bkt"),
    )

    pts_b = points.withColumn(
        "_bkt", F.floor(us(F.col(ts_col)) / span)
    ).alias("p")
    iv_b = iv_b.alias("v")

    # containment rides INSIDE the join condition: the planner keeps the
    # (keys, _bkt) equality as SMJ keys and applies the range predicate as
    # the join filter, so 'left' emits its null row exactly when no
    # candidate in the point's bucket contains it — no anti-join round trip
    cond = F.col("p._bkt") == F.col("v._bkt")
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"v.{k}"))
    cond = cond & (
        (us(F.col(f"p.{ts_col}")) >= us(F.col(f"v.{start_col}")))
        & (us(F.col(f"p.{ts_col}")) < us(F.col(f"v.{end_col}")))
    )
    return pts_b.join(iv_b, cond, how).select(
        *[F.col(f"p.{c}") for c in points.columns],
        F.col(f"v.{start_col}").alias(start_col),
        F.col(f"v.{end_col}").alias(end_col),
        *[F.col(f"v.{c}").alias(c) for c in iv_cols],
    )


def interval_union_length(
    intervals: DataFrame,
    keys: tuple[str, ...] = ("doc_id",),
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Total covered time per key with OVERLAPS MERGED — the uptime/SLA
    aggregate: given possibly-overlapping [start, end) intervals (sensor
    deployments, session spans from several sources, maintenance windows),
    how much wall-clock is covered at least once?

    The classic island algebra, pure window form: order intervals by
    (start, end); an interval opens a NEW island iff its start exceeds the
    running max of all previous ends; islands are the running count of
    openers; each island's covered length is ``max(end) − min(start)``
    (within an island the chain overlaps by construction). ONE Exchange on
    the key serves the ordering window and both aggregations — whole-stage
    codegen, no join, no Python; at web scale each key's intervals stream
    through a single sort.

    NULL-bounded and empty (end ≤ start) intervals are dropped first
    (mask-don't-crash — the ``interval_join`` convention above).

    Returns one row per key: (keys..., n_intervals, n_islands,
    covered_us) with microsecond integer arithmetic (exact cross-engine).
    """
    from pyspark.sql import Window as W

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    iv = (
        intervals
        .filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .select(*keys, us(start_col).alias("_s"), us(end_col).alias("_e"))
        .filter(F.col("_e") > F.col("_s"))
    )
    ordered = W.partitionBy(*keys).orderBy("_s", "_e")
    prev_max_end = F.max("_e").over(
        ordered.rowsBetween(W.unboundedPreceding, -1))
    opener = F.when(
        prev_max_end.isNull() | (F.col("_s") > prev_max_end), 1
    ).otherwise(0)
    islanded = iv.select(
        *keys, "_s", "_e",
        F.sum(opener).over(
            ordered.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("_island"),
    )
    per_island = islanded.groupBy(*keys, "_island").agg(
        F.count(F.lit(1)).alias("_n"),
        (F.max("_e") - F.min("_s")).alias("_len"),
    )
    return per_island.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("_n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("_len").alias("covered_us"),
    )
