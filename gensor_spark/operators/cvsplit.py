"""Purged time-series cross-validation splits with embargo.

Training-pipeline extension (no gensor analogue). Standard K-fold CV leaks
on serially-correlated data: training rows adjacent in time to the test
block carry test information. The published fix (López de Prado, *Advances
in Financial Machine Learning* ch. 7 — "purged K-fold with embargo") makes
each fold's test block a contiguous time span and removes ("purges") from
the training set every row within an ``embargo`` margin of the block on
either side.

Semantics here: the observed time range is cut into ``n_folds`` equal-span
contiguous blocks (equal TIME spans, not equal counts — rank-free, so no
global sort at any scale; callers wanting equal-count folds resample
first). For fold ``i``, a row is

- ``'test'``  if its timestamp falls inside block ``i``;
- ``'train'`` if it falls outside ``[block_start - embargo,
  block_end + embargo)``;
- purged (emitted with role ``'purged'``) otherwise.

Shape at scale: the global (min, max) timestamp is ONE cheap aggregate
crossed in as a broadcast 1-row relation; fold assignment is a row-local
explode of a literal fold array (output = n_folds × input rows, by
definition of K-fold). Zero corpus-keyed shuffles, zero UDFs — whatever
partitioning the input had survives into every fold's train/test view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purged_time_folds(
    points: DataFrame,
    n_folds: int = 5,
    embargo_seconds: float = 0.0,
    ts_col: str = "ts",
    keep_purged: bool = False,
) -> DataFrame:
    """Every input row × every fold, tagged ``role ∈ {train, test[, purged]}``.

    Adds ``fold`` (0-based) and ``role``; all input columns pass through.
    Rows with NULL timestamps are dropped (mask-don't-crash: they belong to
    no time block). With ``keep_purged`` the embargoed rows are emitted
    with ``role='purged'`` for audit; by default they are filtered out.
    """
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    span = points.filter(F.col(ts_col).isNotNull()).agg(
        F.min(ts_col).cast("double").alias("_lo"),
        F.max(ts_col).cast("double").alias("_hi"),
    )
    ts = F.col(ts_col).cast("double")
    width = (F.col("_hi") - F.col("_lo")) / n_folds
    fold = F.col("fold")
    blk_lo = F.col("_lo") + fold * width
    blk_hi = F.col("_lo") + (fold + 1) * width
    # the last block is right-CLOSED so the max row belongs to fold n-1
    # (an epsilon bump would vanish below one ulp at epoch magnitudes)
    in_block = F.when(fold == n_folds - 1, (ts >= blk_lo) & (ts <= blk_hi)) \
        .otherwise((ts >= blk_lo) & (ts < blk_hi))
    emb = F.lit(float(embargo_seconds))
    role = (
        F.when(in_block, "test")
        .when((ts < blk_lo - emb) | (ts >= blk_hi + emb), "train")
        .otherwise("purged")
    )
    out = (
        points.filter(F.col(ts_col).isNotNull())
        .crossJoin(F.broadcast(span))
        .withColumn("fold", F.explode(F.array(
            *[F.lit(i) for i in range(n_folds)])))
        .withColumn("role", role)
        .drop("_lo", "_hi")
    )
    return out if keep_purged else out.filter(F.col("role") != "purged")
