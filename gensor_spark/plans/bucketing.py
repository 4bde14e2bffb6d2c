"""Bucketed table layout: pre-shuffled storage for shuffle-free rereads.

Every per-series operator in this engine opens with the same Exchange —
hash-partition the points on the series key (rollups, windows, gapfill,
the Arrow kernels, as-of joins). On a one-shot query that shuffle is the
price of correctness; on a STORE that is read thousands of times, it is
the same work re-done on every read. Spark's answer is bucketing
(`bucketBy` + `saveAsTable`): the writer hash-partitions ONCE into a
fixed number of bucket files per partition, records the layout in the
catalog, and every subsequent scan exposes
``hashpartitioning(bucket_cols, n)`` as its output partitioning — so

- ``groupBy`` on the bucket columns (or any SUPERSET of them — tier
  rollups group on ``(keys, bin_ts)``, salted rollups on ``(keys,
  bin_ts, _salt)``; hash-on-a-subset co-locates both) plans with NO
  Exchange,
- joins between two tables bucketed the same way (same columns, same
  count) are co-located sort-merge joins with NO Exchange on either
  side,
- windows partitioned by the bucket columns re-sort within partitions
  but never reshuffle.

At 100 TB this converts the dominant recurring cost of a point store —
the series-key shuffle of every reader — into a one-time write-side
cost, exactly the continuous-aggregate bargain the tier store
(plans/incremental.py) strikes for aggregation state, applied to the raw
point layout. Bucket count is the usual sizing call: at most
``total_bytes / maxPartitionBytes`` and ideally a multiple of the
cluster's parallelism; it is FIXED at write time (part of the table's
identity, like CMS depth/width), so size it for the table's target
scale, not today's.

Why ``repartition`` before the write: ``bucketBy`` splits each incoming
task's rows into per-bucket files, so B buckets × P input partitions can
mean B·P small files; pre-partitioning on the same hash (Spark's
`repartition(n, cols)` and the bucket router share Murmur3, so output
partition i holds exactly bucket i's rows) collapses that to ONE file
per bucket — and one-file buckets are also the condition under which the
scan exposes the ``sortBy`` order as its output ordering, letting
ordered consumers (windows, as-of) skip their Sort too.

Plain ``.parquet(path)`` writes cannot carry bucket metadata — bucketing
requires the session catalog (``saveAsTable``). Pass ``path=`` to keep
the data at an external location (the catalog entry is then just the
layout record); the default session catalog works without any Hive
metastore, scoped to ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

KEYS = ("doc_id", "source")


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: tuple[str, ...] = KEYS,
    sort_cols: tuple[str, ...] = ("ts",),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (+ per-bucket sorted) catalog table.

    One output file per bucket (see module docstring). ``sort_cols`` are
    APPENDED to ``bucket_cols`` in the per-file sort so the layout serves
    window/as-of consumers ordered by (keys, ts), not just ts.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    routed = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    writer = (
        routed.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols, *sort_cols)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table (the catalog carries the layout; this is just
    ``spark.table`` with the intent spelled out)."""
    return spark.table(table)


def is_bucket_satisfied(df: DataFrame) -> bool:
    """True when ``df``'s physical plan contains no shuffle — the guard
    readers use to PROVE a bucketed layout is actually being exploited
    (a silently-degraded table, e.g. bucketing disabled or a
    mismatched bucket count on a join, re-plans with an Exchange and
    this returns False)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
