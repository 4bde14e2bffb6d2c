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
right ≤ left" in mirrored time, carries included. ``'nearest'`` runs ONE
union pass that carries both the nearest-prior and the nearest-next right
payload over the same key partition (two sort orders, one shuffle — the
gapfill-interpolate pattern) and keeps the closer match per left row
(exact-distance ties go backward, matching pandas).

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


def _nullsafe_join(a: DataFrame, b: DataFrame, cols: list[str],
                   how: str) -> DataFrame:
    """Join on ``cols`` with NULL-safe equality (<=>), keeping ``a``'s
    columns plus ``b``'s non-join columns (none for semi joins).

    The carry grids join on the as-of KEY columns; window partitioning
    groups NULL keys into a real group, so the carry plumbing must match
    them too — a plain column-list join would silently drop every null-key
    carry (and with it all cross-bucket null-key matches).
    """
    aa, bb = a.alias("_nsa"), b.alias("_nsb")
    cond = None
    for c in cols:
        e = F.col(f"_nsa.{c}").eqNullSafe(F.col(f"_nsb.{c}"))
        cond = e if cond is None else cond & e
    j = aa.join(bb, cond, how)
    if how in ("leftsemi", "semi", "left_semi", "leftanti", "anti"):
        return j
    keep = [F.col(f"_nsa.{c}") for c in a.columns] + [
        F.col(f"_nsb.{c}") for c in b.columns if c not in cols
    ]
    return j.select(*keep)


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
    grid = _nullsafe_join(
        left_buckets.unionByName(last_per_bucket.select(*keys, "_bkt"))
        .distinct(),
        last_per_bucket, [*keys, "_bkt"], "left",
    )
    w = (
        W.partitionBy(*keys).orderBy("_bkt")
        # strictly earlier buckets: the current bucket's own rows take part
        # in the main window directly
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carries = _nullsafe_join(
        grid.withColumn("_carry", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_carry").isNotNull()),
        left_buckets, [*keys, "_bkt"], "leftsemi",
    )
    carries = (
        carries
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
    """direction='nearest' in ONE window pass: union both sides once, carry
    the nearest-prior right payload (LOCF frame) AND the nearest-next one
    (NOCB frame) over the same key partition — two sort orders over one
    Exchange — then keep the closer match per left row (exact-distance ties
    go backward, pandas parity).

    vs the previous two-plan form (full backward pass + full forward pass
    + row-id re-join): one shuffle instead of three, no synthetic row id,
    and left rows with NULL key columns behave exactly like the
    single-direction paths (window partitioning groups them; the old inner
    re-join silently dropped them only for 'nearest').

    Tie tags per ordering: the backward ordering wants right rows before
    left at equal ts when tie-matching (≤) and after when strict; the
    forward ordering wants the mirror (a frame starting at currentRow sees
    equal-ts rights only if they sort after the left row). Carries pin the
    extremes of both orderings: backward carry (-1, -1) at the bucket
    start, forward carry (3, 3) at the bucket end — each rides its own
    payload column so the LOCF frame can never pick a forward carry (whose
    real ts is later than everything in the bucket) and vice versa.
    """
    payload = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    pay_t = right.select(payload.alias("_p")).schema["_p"].dataType
    left_extra = [c for c in left.columns if c not in keys and c != ts_col]

    tb_right = 0 if allow_exact_matches else 2
    tf_right = 2 if allow_exact_matches else 0

    lhs = left.select(
        *keys, ts_col,
        _micros(F.col(ts_col)).alias("_ord"),
        F.lit(1).alias("_tb"), F.lit(1).alias("_tf"),
        F.lit(None).cast(pay_t).alias("_pb"),
        F.lit(None).cast(pay_t).alias("_pf"),
        *left_extra,
        F.lit(True).alias("_is_left"),
    )
    rhs = right.select(
        *keys, ts_col,
        _micros(F.col(ts_col)).alias("_ord"),
        F.lit(tb_right).alias("_tb"), F.lit(tf_right).alias("_tf"),
        payload.alias("_pb"), payload.alias("_pf"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_extra],
        F.lit(False).alias("_is_left"),
    )

    if bucket_seconds is not None:
        span = bucket_seconds * _US
        bucket = F.floor(F.col("_ord") / span).cast("long")
        carries = _nearest_carries(rhs, lhs, keys, ts_col, span, pay_t,
                                   left_extra, left)
        rows = (
            lhs.withColumn("_bkt", bucket)
            .unionByName(rhs.withColumn("_bkt", bucket))
            .unionByName(carries)
        )
        part = [*keys, "_bkt"]
    else:
        rows = lhs.unionByName(rhs)
        part = list(keys)

    wb = (
        W.partitionBy(*part)
        .orderBy(F.col("_ord").asc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*part)
        .orderBy(F.col("_ord").asc(), F.col("_tf").asc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    m = (
        rows.withColumn("_mb", F.last("_pb", ignorenulls=True).over(wb))
        .withColumn("_mf", F.first("_pf", ignorenulls=True).over(wf))
        .filter(F.col("_is_left"))
    )
    if tolerance_seconds is not None:
        tol = tolerance_seconds * _US
        lts = _micros(F.col(ts_col))
        m = m.withColumn(
            "_mb", F.when(F.abs(lts - _micros(F.col("_mb._rts"))) <= tol,
                          F.col("_mb"))
        ).withColumn(
            "_mf", F.when(F.abs(lts - _micros(F.col("_mf._rts"))) <= tol,
                          F.col("_mf"))
        )
    dist_b = F.abs(_micros(F.col(ts_col)) - _micros(F.col("_mb._rts")))
    dist_f = F.abs(_micros(F.col(ts_col)) - _micros(F.col("_mf._rts")))
    take_f = F.col("_mb").isNull() | (
        F.col("_mf").isNotNull() & (dist_f < dist_b)
    )
    picked = m.withColumn(
        "_m", F.when(take_f, F.col("_mf")).otherwise(F.col("_mb"))
    )
    return picked.select(
        *keys, ts_col, *left_extra,
        F.col("_m._rts").alias("right_ts"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def _nearest_carries(rhs, lhs, keys, ts_col, span, pay_t, left_extra,
                     left) -> DataFrame:
    """Both boundary carries for the nearest single-pass plan from ONE
    (key, bucket) grid: the best earlier-bucket right row pinned to each
    occupied left bucket's start (backward, tags -1/-1, payload in ``_pb``
    only) and the best later-bucket right row pinned to its end (forward,
    tags 3/3, payload in ``_pf`` only). Cardinality: keys × occupied
    buckets — negligible next to the data (same argument as
    ``_with_boundary_carry``).
    """
    bucket = F.floor(F.col("_ord") / span).cast("long")
    rhs_b = rhs.withColumn("_bkt", bucket)
    per_bucket = rhs_b.groupBy(*keys, "_bkt").agg(
        F.max_by("_pb", F.col("_ord")).alias("_last"),
        F.min_by("_pb", F.col("_ord")).alias("_first"),
    )
    left_buckets = lhs.select(*keys, bucket.alias("_bkt")).distinct()
    grid = _nullsafe_join(
        left_buckets.unionByName(per_bucket.select(*keys, "_bkt"))
        .distinct(),
        per_bucket, [*keys, "_bkt"], "left",
    )
    wprev = (W.partitionBy(*keys).orderBy("_bkt")
             .rowsBetween(W.unboundedPreceding, -1))
    wnext = (W.partitionBy(*keys).orderBy("_bkt")
             .rowsBetween(1, W.unboundedFollowing))
    carried = _nullsafe_join(
        grid.select(
            *keys, "_bkt",
            F.last("_last", ignorenulls=True).over(wprev).alias("_cb"),
            F.first("_first", ignorenulls=True).over(wnext).alias("_cf"),
        ),
        left_buckets, [*keys, "_bkt"], "leftsemi",
    )

    def shape(pos, tag, pb, pf, keep):
        return carried.filter(keep).select(
            *keys,
            F.lit(None).cast(left.schema[ts_col].dataType).alias(ts_col),
            pos.cast("long").alias("_ord"),
            F.lit(tag).alias("_tb"), F.lit(tag).alias("_tf"),
            pb.alias("_pb"), pf.alias("_pf"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_extra],
            F.lit(False).alias("_is_left"),
            "_bkt",
        )

    back = shape(F.col("_bkt") * span, -1,
                 F.col("_cb"), F.lit(None).cast(pay_t),
                 F.col("_cb").isNotNull())
    fwd = shape((F.col("_bkt") + 1) * span - 1, 3,
                F.lit(None).cast(pay_t), F.col("_cf"),
                F.col("_cf").isNotNull())
    return back.unionByName(fwd)
