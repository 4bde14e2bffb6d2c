"""Streaming interval enrichment: tag each arriving point with the labeled
interval(s) containing it.

The streaming form of the containment join (operators/intervaljoin.py) —
e.g. tagging a live point stream with maintenance windows / incident
periods as they are ingested. Spark's stream-static joins are equi-only, so
the bucket-grid containment join composes through ``foreachBatch`` exactly
like the as-of enrichment (streaming/asof_stream.py): each micro-batch is a
bounded DataFrame, the full batch operator applies unchanged (bucket sizing,
``how``, the null-bound drop), and matches reflect the interval table's
state at that epoch.

Delivery contract: identical to asof_stream — ``foreachBatch`` is
at-least-once, so each epoch writes to its own
``{out_dir}/data/epoch=<epoch_id>`` partition in overwrite mode; a replayed
epoch overwrites exactly its own output, composing to exactly-once results
on disk.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from gensor_spark.operators.intervaljoin import KEYS, interval_join


def interval_enrich_stream(
    stream: DataFrame,
    intervals_source: Callable[[], DataFrame] | DataFrame,
    out_dir: str,
    keys: tuple[str, ...] = KEYS,
    trigger_once: bool = False,
    **join_kwargs,
):
    """Start an enrichment sink: ``stream`` rows + containing intervals.

    ``intervals_source``: a static DataFrame or a zero-arg callable
    re-evaluated every micro-batch (pass a callable when the interval table
    grows — e.g. ``lambda: spark.read.parquet(ivs_dir)``). ``join_kwargs``
    forward to ``interval_join`` (bucket_seconds, how, ...).
    """

    def _enrich(batch: DataFrame, epoch_id: int) -> None:
        ivs = (intervals_source() if callable(intervals_source)
               else intervals_source)
        out = interval_join(batch, ivs, keys=keys, **join_kwargs)
        out.write.mode("overwrite").parquet(f"{out_dir}/data/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", f"{out_dir}/_checkpoints")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
