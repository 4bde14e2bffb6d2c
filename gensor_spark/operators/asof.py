"""Distributed as-of join: pandas ``merge_asof`` semantics at any scale.

The time-series join Spark lacks natively (pandas ``merge_asof``, DuckDB
``ASOF JOIN``). gensor's barometric alignment sidesteps it with a 1-minute
bin equi-join (``gensor/processing/compensation.py`` — both series are
resampled first); this operator is the general form: exact nearest-prior /
nearest-next / nearest semantics, optional staleness ``tolerance``, strict
or tie-matching inequality (``allow_exact_matches``).

Two physical strategies, same semantics:

- ``bucket_seconds=None`` (default): union both sides with a side tag and
  LOCF the right row's payload over a per-key window ordered by
  ``(_ord, side)`` — right rows sort before left rows at equal ts when
  ``allow_exact_matches`` (≤, merge_asof's default) and after them when
  strict. One shuffle on the keys, one O(n) running frame. Correct at any
  size, but a single hot key serializes into one task.
- ``bucket_seconds=B``: the scale path. Rows are windowed per
  ``(key, floor(ord/B))`` so a hot key spreads over many tasks; correctness
  across bucket boundaries is restored by a *boundary carry* — the best
  right row of each (key, bucket) is LOCF'd over the tiny per-bucket table
  and injected into the NEXT occupied bucket as a synthetic right row
  sorting before everything in it. Cost: one extra aggregate over
  (key, bucket) — rows ≈ keys × occupied buckets, thousands of times
  smaller than the data. This is the shape that survives 10^12 rows with
  zipf-hot series.

``direction='forward'`` reuses the backward machinery on a NEGATED time
axis (``_ord = -unix_micros(ts)``): "earliest right ≥ left" is "latest
right ≤ left" in mirrored time, carries included. ``'nearest'`` composes
one pass each way and keeps the closer match per left row (exact-distance
ties go backward, matching pandas).

Output: every left row + ``right_ts`` + the requested right columns
(NULL when no match exists within ``direction``/``tolerance``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

KEYS = ("doc_id", "source")

_US = 1_000_000


def _micros(c):
    # unix_micros rejects TIMESTAMP_NTZ; the cast is a no-op for TIMESTAMP
    # and a session-tz (UTC-pinned, session.py) interpretation for NTZ —
    # monotone either way, and both sides of the join get the same mapping
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] | None = None,
    tolerance_seconds: int | None = None,
    bucket_seconds: int | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ``keys`` at ``ts_col``.

    ``direction``: 'backward' (latest right ≤ left, the default), 'forward'
    (earliest right ≥ left), or 'nearest'. ``allow_exact_matches=False``
    makes the inequality strict (pandas parity). ``tolerance_seconds``
    voids matches farther than the tolerance in either direction.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction: {direction}")
    if right_cols is None:
        right_cols = tuple(
            c for c in right.columns if c not in keys and c != ts_col
        )
    if direction == "nearest":
        return _nearest(left, right, keys, ts_col, right_cols,
                        tolerance_seconds, bucket_seconds,
                        allow_exact_matches)

    sign = 1 if direction == "backward" else -1
    payload = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_cols]
    )

    def ord_of(c):
        return (_micros(c) * sign).cast("long")

    # side ordering at equal _ord: carries (-1) always first (strictly
    # earlier buckets), then right-before-left for tie matching (≤) or
    # right-after-left for strict (<)
    right_tag = 0 if allow_exact_matches else 2
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_pay", F.lit(None).cast(
        right.select(payload.alias("_pay")).schema["_pay"].dataType))
    rhs = right.select(
        *keys, ts_col, F.lit(right_tag).alias("_side"), payload.alias("_pay"),
    )
    lhs = lhs.withColumn("_ord", ord_of(F.col(ts_col)))
    rhs = rhs.withColumn("_ord", ord_of(F.col(ts_col)))

    left_extra = [c for c in left.columns if c not in keys and c != ts_col]

    if bucket_seconds is not None:
        rhs = _with_boundary_carry(rhs, lhs, keys, ts_col, bucket_seconds,
                                   left_extra_types=None)
        bucket = F.floor(F.col("_ord") / (bucket_seconds * _US)).cast("long")
        lhs = lhs.withColumn("_bkt", bucket)
        part_cols = [*keys, "_bkt"]
    else:
        part_cols = list(keys)

    # left payload columns ride along on the left rows only
    bkt = [F.col("_bkt")] if bucket_seconds is not None else []
    carried = lhs.select(
        *keys, ts_col, "_ord", "_side", "_pay", *left_extra, *bkt,
    ).unionByName(
        rhs.select(
            *keys, ts_col, "_ord", "_side", "_pay",
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_extra],
            *bkt,
        )
    )

    w = (
        W.partitionBy(*part_cols)
        .orderBy(F.col("_ord").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = carried.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))

    out = matched.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.abs(_micros(F.col(ts_col)) - _micros(F.col("_m._rts")))
            <= tolerance_seconds * _US
        )
        out = out.withColumn("_m", F.when(fresh, F.col("_m")))
    return out.select(
        *keys, ts_col, *left_extra,
        F.col("_m._rts").alias("right_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def _with_boundary_carry(rhs: DataFrame, lhs: DataFrame,
                         keys: tuple[str, ...], ts_col: str,
                         bucket_seconds: int,
                         left_extra_types=None) -> DataFrame:
    """Add one synthetic right row per occupied LEFT bucket: the best real
    right row from any EARLIER bucket in ``_ord`` space (LOCF over the tiny
    per-bucket table), pinned to the bucket's start so it sorts before the
    bucket's rows.

    The per-(key, bucket) reduction and the LOCF both run over a frame whose
    cardinality is keys × occupied buckets — negligible next to the data —
    so the expensive window stays fully parallel over (key, bucket).
    """
    span = bucket_seconds * _US
    bucket = F.floor(F.col("_ord") / span).cast("long")
    rhs_b = rhs.withColumn("_bkt", bucket)

    # best (max-_ord) real right row per (key, right-bucket)
    last_per_bucket = rhs_b.groupBy(*keys, "_bkt").agg(
        F.max_by("_pay", F.col("_ord")).alias("_pay")
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
            # the carry's position is synthetic (bucket start in _ord
            # space); its REAL timestamp travels inside the payload
            F.lit(None).cast(rhs.schema[ts_col].dataType).alias(ts_col),
            (F.col("_bkt") * span).cast("long").alias("_ord"),
            F.lit(-1).alias("_side"),  # sorts before right and left tags
            F.col("_carry").alias("_pay"),
            "_bkt",
        )
    )
    return rhs_b.unionByName(carries)


def _nearest(left, right, keys, ts_col, right_cols, tolerance_seconds,
             bucket_seconds, allow_exact_matches) -> DataFrame:
    """direction='nearest': one backward and one forward pass, keep the
    closer match per left row (exact ties → backward, pandas parity).

    The left side gets a per-row id (row_number within its series) so the
    two passes re-align row-for-row even with duplicate timestamps; full
    duplicates are interchangeable, so tie order inside the id window is
    irrelevant to the result.
    """
    left_extra = [c for c in left.columns if c not in keys and c != ts_col]
    idw = W.partitionBy(*keys).orderBy(ts_col, *left_extra)
    lid = left.withColumn("_lid", F.row_number().over(idw))

    common = dict(keys=keys, ts_col=ts_col, right_cols=right_cols,
                  tolerance_seconds=tolerance_seconds,
                  bucket_seconds=bucket_seconds,
                  allow_exact_matches=allow_exact_matches)
    b = asof_join(lid, right, direction="backward", **common)
    f = asof_join(lid, right, direction="forward", **common)

    fsel = f.select(
        *keys, "_lid",
        F.col("right_ts").alias("_f_rts"),
        *[F.col(c).alias(f"_f_{c}") for c in right_cols],
    )
    j = b.join(fsel, [*keys, "_lid"])
    dist_b = F.abs(_micros(F.col(ts_col)) - _micros(F.col("right_ts")))
    dist_f = F.abs(_micros(F.col(ts_col)) - _micros(F.col("_f_rts")))
    take_f = F.col("right_ts").isNull() | (
        F.col("_f_rts").isNotNull() & (dist_f < dist_b)
    )
    picked = [
        F.when(take_f, F.col("_f_rts")).otherwise(F.col("right_ts")).alias("right_ts"),
        *[F.when(take_f, F.col(f"_f_{c}")).otherwise(F.col(c)).alias(c)
          for c in right_cols],
    ]
    return j.select(*keys, ts_col, *[c for c in left_extra if c != "_lid"],
                    *picked)
