"""Mergeable point-query frequency tiers: Count-Min sketch partials.

Completes the sketch-tier family (operators/rollup.py numeric partials,
operators/histquantiles.py exact histograms, operators/ddsketch.py
relative-error quantiles, operators/distinctrollup.py HLL distinct,
operators/topkrollup.py Misra-Gries heavy hitters) with the one question
none of them answer: *"how often did THIS item appear in that bin?"* for an
arbitrary, caller-chosen item. Misra-Gries only certifies items heavy
enough to survive truncation; the Count-Min sketch (Cormode & Muthukrishnan
2005) answers any point query with the classic one-sided guarantee::

    true_cnt <= estimate <= true_cnt + eps * N      (w.p. 1 - delta)

with ``width = ceil(e / eps)`` and ``depth = ceil(ln(1 / delta))``; the
lower bound (never an undercount) holds DETERMINISTICALLY, which is what
the tests pin. Counters are pure sums, so sketches merge by addition —
the 1m → 1h → 1d cascade contract of the continuous-aggregate store
(plans/incremental.py) extends bit-exactly: a cascaded sketch is
counter-identical to one built directly at the coarser tier (proven in
tests, unlike HLL's sparse→dense caveat).

Representation: SPARSE counter triplets ``(keys..., bin_ts, row, col,
cnt)`` — one row per NONZERO counter — rather than a dense
``array<long>[depth*width]`` per bin. Sparse is the Spark-native choice:
the build is the word-count shape (map-side partial aggregation compacts
the row-local ×depth explode to nonzero-counter grain before the single
shuffle), merges/cascades are partial-aggregated ``groupBy().sum()``, and
per-bin state is ``min(depth*width, depth*distinct)`` rows — the sketch
bound kicks in exactly when cardinality would hurt. A dense-array
representation would forfeit map-side combine (``collect_list`` has no
partial merge) and ship ``depth*width`` longs per bin even for sparse bins.

Hash family: ``xxhash64(seed_r, item)`` with the row index as a literal
seed column — depth independent 64-bit hashes reduced ``pmod width``, the
same production family the MinHash/LSH stack uses (operators/dedup.py).
Query-side probes recompute the identical expressions, so estimates are
reproducible across sessions and parallelism levels.

Everything is pure Catalyst: explode is row-local, both aggregation stages
partial-aggregate, point queries are one broadcast join on (row, col).
No UDF, no window, no per-row Python.

At 100 TB: the build shuffles nonzero-counter rows (bounded by
depth·width per bin regardless of bin cardinality — the same ≥60:1
reduction argument as the numeric tiers once bins saturate); cascades and
retention folds never re-read raw points; a point query broadcasts
``items × depth`` probe rows against the counter table, pruned by the
store's bin/partition predicates before the join.

No reference analogue: gensor holds whole series in pandas and has no
frequency sketches; this extends its tier/retention design
(gensor/core/timeseries.py resample semantics) to point-queryable
frequencies over unbounded item domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.rollup import TIER_SECONDS, bin_ts, freq_to_seconds

KEYS = ("doc_id", "source")


def _step(tier: str) -> int:
    return TIER_SECONDS.get(tier) or freq_to_seconds(tier)


def _probes(item_col, depth: int, width: int):
    """``array<struct<row,col>>`` of the item's ``depth`` counter slots —
    the ONE hash definition both the build and the query side use."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(F.xxhash64(F.lit(r), item_col), F.lit(width))
                .cast("int")
                .alias("col"),
            )
            for r in range(depth)
        ]
    )


def rollup_cms(
    points: DataFrame,
    tier: str = "1m",
    of: str = "value",
    keys: tuple[str, ...] = KEYS,
    ts_col: str = "ts",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch of ``of`` frequencies per (keys, tier bin).

    Output: sparse nonzero counters ``keys..., bin_ts, row int, col int,
    cnt long``. NULL items are ignored (COUNT semantics). Feed to
    ``cascade_cms`` for coarser tiers, ``merge_cms`` for cross-contribution
    merges and ``estimate_cms`` for point queries. ``depth``/``width``
    must match across everything that will be merged — they are part of
    the sketch's identity, like ``lgk`` for HLL.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}/{width}")
    binned = (
        points.filter(F.col(of).isNotNull())
        .withColumn("bin_ts", bin_ts(F.col(ts_col), _step(tier)))
    )
    slots = binned.select(
        *keys, "bin_ts", F.explode(_probes(F.col(of), depth, width)).alias("_s")
    )
    return slots.groupBy(
        *keys, "bin_ts", F.col("_s.row").alias("row"), F.col("_s.col").alias("col")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cascade_cms(
    finer: DataFrame,
    tier: str,
    keys: tuple[str, ...] = KEYS,
) -> DataFrame:
    """Coarser-tier sketches from finer-tier sketches — never re-reads raw
    points. Counters are sums, so the result is counter-identical to a
    direct ``rollup_cms`` at ``tier`` (bit-exact, tested)."""
    rebinned = finer.withColumn("bin_ts", bin_ts(F.col("bin_ts"), _step(tier)))
    return rebinned.groupBy(*keys, "bin_ts", "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def merge_cms(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge same-bin counter rows from multiple contributions (the store's
    cross-batch read-side merge — associative, order-free)."""
    return partials.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def estimate_cms(
    cms: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    keys: tuple[str, ...] = KEYS,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query estimates: for every (sketch bin, query item) pair,
    ``est = min over the item's depth counters`` (absent counter = 0).

    ``items`` is a one-column DataFrame (``item_col``) whose TYPE must
    match the ``of`` column the sketch was built on — xxhash64 of the
    string '7' and the bigint 7 differ, exactly as with Spark's own hash
    semantics. Output: ``keys..., bin_ts, item, est long`` with
    ``est >= true count`` always and ``est = 0`` exact for items whose
    every slot is empty.

    Plan: items × depth probe rows (row-local), broadcast to a left join
    on (row, col) against the counter table — the corpus-side sketch never
    reshuffles; one min-agg on (bin, item) finishes. Query sets are small
    by definition (a human asked about specific items); a caller with a
    huge item set drops the broadcast hint by pre-marking ``items`` with
    ``F.broadcast``-free repartition, but at that point a plain join
    against raw counts is usually the better plan.
    """
    probes = items.select(
        F.col(item_col).alias("item"),
        F.explode(_probes(F.col(item_col), depth, width)).alias("_s"),
    ).select("item", F.col("_s.row").alias("row"), F.col("_s.col").alias("col"))
    bins = cms.select(*keys, "bin_ts").distinct()
    # every (bin, probe-slot) needs a value — absent counters are zeros,
    # so build the full grid first, then left-join the nonzero counters
    grid = bins.join(F.broadcast(probes), how="cross")
    joined = grid.join(
        cms, on=[*keys, "bin_ts", "row", "col"], how="left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(*keys, "bin_ts", "item").agg(
        F.min("cnt").alias("est")
    )
