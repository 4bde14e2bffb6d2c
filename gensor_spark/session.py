"""SparkSession factory tuned for the engine.

Defaults target the sandbox (single-JVM ``local[N]``) but every knob is the
one you would set on a real multi-executor cluster too: AQE on (runtime
re-planning + skew-join splitting), shuffle partitions sized to the
parallelism instead of the 200 default, Arrow enabled for the pandas-UDF
stages, and a pinned UTC session timezone so timestamp semantics match the
reference (gensor stores tz-aware UTC indexes, ``gensor/core/base.py:24-28``)
and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gensor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``). Pass ``master='cluster'`` from a spark-submit job to leave
    the master to the launcher (these configs ride along unchanged).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # match the actual parallelism, not Spark's 200 default
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
        else:
            shuffle_partitions = 32

    builder = SparkSession.builder
    if master != "cluster":
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE partition COALESCING is off: it merges post-shuffle partitions
        # by BYTES, but this engine's shuffle data is narrow sorted rows that
        # compress 30-50× — a tiny pre-explode span aggregate (~100KB) fed a
        # 1.85M-row grid explode, got coalesced to 2 partitions, and every
        # downstream window ran 2-wide (measured: gapfill 6.7s → 4.4s warm at
        # 32-wide; per-series Arrow kernels were serialized the same way).
        # Byte-sizing is the wrong cost model for CPU-bound stages, and since
        # get_spark already sizes shuffle.partitions to the core count there
        # are no thousands-of-tiny-tasks to rescue. On a cluster with
        # oversized shuffle.partitions, re-enable via SPARK_GRAFT_COALESCE.
        .config("spark.sql.adaptive.coalescePartitions.enabled",
                os.environ.get("SPARK_GRAFT_COALESCE", "false"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # v2 committer: per-task renames instead of a serial driver-side
        # commit loop — the v1 loop cost ~100ms/file regardless of
        # parallelism and dominated small tier writes
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # Scan-split sizing for the sandbox's small parquet files: the
        # default 128MB maxPartitionBytes bin-packs 7MB files ~18-to-a-task,
        # so a 1.8GB input became ~14 tasks and 32 cores ran half idle with
        # a one-task tail (measured). 16MB/1MB gives file-count-granular
        # tasks here; on a real cluster with 256-512MB files keep 128MB.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
        .config("spark.sql.files.openCostInBytes", "1m")
        # dynamic partition overwrite: the incremental tier merge rewrites
        # only the partitions it touched (plans/incremental.py)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # ParallelGC: measured 11x faster than default G1 on the tier-rollup
        # job at local[32]/24g (161s -> 15s) — G1 evacuation pauses of 2-4s
        # stall every task thread under heavy shuffle/agg churn. Batch
        # engines want throughput GC, not pause-target GC. A larger heap
        # makes it WORSE (96g: 3x slower) — prefer small heap + spill.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_GC_OPTS", "-XX:+UseParallelGC"),
        )
        .config(
            "spark.executor.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_GC_OPTS", "-XX:+UseParallelGC"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
