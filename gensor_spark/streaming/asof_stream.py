"""Streaming as-of enrichment: join each arriving point to the latest
reference reading (≤ its event time).

The streaming form of gensor's barometric alignment
(``gensor/processing/compensation.py`` aligns a raw series to a baro series
before compensating): a point stream is enriched per micro-batch with the
nearest-prior row of a reference table via ``operators.asof.asof_join``.

Spark's native stream joins can't express as-of (stream-static joins are
equi-only; stream-stream interval joins emit EVERY right row in the
interval, not the latest). ``foreachBatch`` is the sanctioned composition
point: each micro-batch is a bounded DataFrame, so the full batch operator
— including the bucketed hot-key path and ``direction``/``tolerance`` —
applies unchanged.

Delivery contract: ``foreachBatch`` itself is at-least-once — a failed (or
failed-to-commit) epoch is REPLAYED on restart — so the sink must make the
replay idempotent. Each epoch writes its rows to its own
``{out_dir}/data/epoch=<epoch_id>`` partition directory in overwrite mode:
a replayed epoch overwrites exactly its own output and nothing else, which
composes the at-least-once replay into exactly-once results on disk.
Readers take ``spark.read.parquet(f"{out_dir}/data")`` and get the epoch id
back as an ordinary discovered partition column.

Semantics note: the reference table is re-read per micro-batch (it may be a
slowly-growing table — e.g. the landing zone of another stream); matches
are as-of the reference's state at that epoch. Late REFERENCE data that
lands after a point's epoch does not retroactively rewrite emitted rows —
the same contract as gensor's batch alignment, made explicit here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from gensor_spark.operators.asof import KEYS, asof_join


def asof_enrich_stream(
    stream: DataFrame,
    right_source: Callable[[], DataFrame] | DataFrame,
    out_dir: str,
    keys: tuple[str, ...] = KEYS,
    trigger_once: bool = False,
    **asof_kwargs,
):
    """Start an enrichment sink: ``stream`` rows + as-of matched reference.

    ``right_source``: either a static DataFrame or a zero-arg callable
    re-evaluated every micro-batch (pass a callable when the reference
    grows — e.g. ``lambda: spark.read.parquet(ref_dir)``).
    ``asof_kwargs`` forward to ``asof_join`` (direction, tolerance_seconds,
    bucket_seconds, ...).
    """

    def _enrich(batch: DataFrame, epoch_id: int) -> None:
        right = right_source() if callable(right_source) else right_source
        out = asof_join(batch, right, keys=keys, **asof_kwargs)
        # idempotent per-epoch sink: a replayed epoch overwrites its own
        # partition dir, never appends a duplicate (see module docstring)
        out.write.mode("overwrite").parquet(f"{out_dir}/data/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", f"{out_dir}/_checkpoints")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
