"""Distributed as-of join: each left row picks the latest right row ≤ its ts.

The time-series join Spark lacks natively (pandas ``merge_asof``, DuckDB
``ASOF JOIN``). gensor's barometric alignment sidesteps it with a 1-minute
bin equi-join (``gensor/processing/compensation.py`` — both series are
resampled first); this operator is the general form: no pre-binning, exact
nearest-prior semantics, optional staleness ``tolerance``.

Two physical strategies, same semantics:

- ``bucket_seconds=None`` (default): union both sides with a side tag and
  LOCF the right row's payload over a per-key window ordered by
  ``(ts, side)`` — right rows sort before left rows at equal ts, so ties
  match (≤, like merge_asof's default ``allow_exact_matches=True``). One
  shuffle on the keys, one O(n) running frame. Correct at any size, but a
  single hot key serializes into one task.
- ``bucket_seconds=B``: the scale path. Rows are windowed per
  ``(key, floor(ts/B))`` so a hot key spreads over many tasks; correctness
  across bucket boundaries is restored by a *boundary carry* — the latest
  right row of each (key, bucket) is LOCF'd over the tiny per-bucket table
  and injected into the NEXT occupied bucket as a synthetic right row
  sorting before everything in it. Cost: one extra aggregate over
  (key, bucket) — rows ≈ keys × occupied buckets, thousands of times
  smaller than the data. This is the shape that survives 10^12 rows with
  zipf-hot series.

Output: every left row + ``right_ts`` + the requested right columns
(NULL when no prior right row exists or it is older than ``tolerance``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

KEYS = ("doc_id", "source")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] | None = None,
    tolerance_seconds: int | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ``keys`` at ``ts_col`` (≤, ties match)."""
    if right_cols is None:
        right_cols = tuple(
            c for c in right.columns if c not in keys and c != ts_col
        )
    payload = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_cols]
    )

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_pay", F.lit(None).cast(
        right.select(payload.alias("_pay")).schema["_pay"].dataType))
    rhs = right.select(
        *keys, ts_col, F.lit(0).alias("_side"), payload.alias("_pay"),
    )

    left_extra = [c for c in left.columns if c not in keys and c != ts_col]

    if bucket_seconds is not None:
        rhs = _with_boundary_carry(rhs, lhs, keys, ts_col, bucket_seconds)
        bucket = (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
        lhs = lhs.withColumn("_bkt", bucket)
        part_cols = [*keys, "_bkt"]
    else:
        part_cols = list(keys)

    # left payload columns ride along on the left rows only
    bkt = [F.col("_bkt")] if bucket_seconds is not None else []
    carried = lhs.select(
        *keys, ts_col, "_side", "_pay", *left_extra, *bkt,
    ).unionByName(
        rhs.select(
            *keys, ts_col, "_side", "_pay",
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_extra],
            *bkt,
        )
    )

    w = (
        W.partitionBy(*part_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = carried.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))

    out = matched.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.col("_m._rts"))
            <= tolerance_seconds
        )
        out = out.withColumn("_m", F.when(fresh, F.col("_m")))
    return out.select(
        *keys, ts_col, *left_extra,
        F.col("_m._rts").alias("right_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def _with_boundary_carry(rhs: DataFrame, lhs: DataFrame,
                         keys: tuple[str, ...], ts_col: str,
                         bucket_seconds: int) -> DataFrame:
    """Add one synthetic right row per occupied LEFT bucket: the latest real
    right row from any EARLIER bucket (LOCF over the tiny per-bucket table),
    timestamped at the bucket's start so it sorts before the bucket's rows.

    The per-(key, bucket) reduction and the LOCF both run over a frame whose
    cardinality is keys × occupied buckets — negligible next to the data —
    so the expensive window stays fully parallel over (key, bucket).
    """
    bucket = (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    rhs_b = rhs.withColumn("_bkt", bucket)

    # latest real right row per (key, right-bucket)
    last_per_bucket = rhs_b.groupBy(*keys, "_bkt").agg(
        F.max_by("_pay", F.col(ts_col)).alias("_pay")
    )
    # every bucket where a LEFT row exists needs a carry candidate
    left_buckets = lhs.select(
        *keys, bucket.alias("_bkt")
    ).distinct()
    grid = (
        left_buckets.unionByName(last_per_bucket.select(*keys, "_bkt"))
        .distinct()
        .join(last_per_bucket, [*keys, "_bkt"], "left")
    )
    w = (
        W.partitionBy(*keys).orderBy("_bkt")
        # strictly earlier buckets: the current bucket's own rows take part
        # in the main window directly
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carries = (
        grid.withColumn("_carry", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_carry").isNotNull())
        .join(left_buckets, [*keys, "_bkt"], "leftsemi")
        .select(
            *keys,
            F.timestamp_seconds(F.col("_bkt") * bucket_seconds).alias(ts_col),
            F.lit(-1).alias("_side"),  # sorts before right(0) and left(1)
            F.col("_carry").alias("_pay"),
            "_bkt",
        )
    )
    return rhs_b.unionByName(carries)
