"""Streaming drift monitor: score each arriving micro-batch against a
fixed reference corpus.

The streaming form of ``operators/drift.psi_vs_reference``: as documents
land (a crawl stream, an ingest queue), every epoch's batch is scored per
source against the ACCEPTED reference corpus — the "is today's crawl still
shaped like the corpus we trained on?" gate, evaluated continuously instead
of in a nightly batch. Readings are comparable across epochs because the
binning domain is pinned to the reference's bounds once at monitor start,
not re-derived per batch (a shifting baseline would hide exactly the drift
being measured).

``foreachBatch`` is the composition point (the audited batch operator
applies unchanged to the bounded micro-batch); the sink is the repo's
idempotent epoch-partition contract — each epoch overwrites its own
``{out_dir}/data/epoch=<id>`` directory, so the at-least-once replay
composes to exactly-once readings on disk. Readers get
``spark.read.parquet(f"{out_dir}/data")`` with ``epoch`` back as a
discovered partition column: one (source, psi) row per source per epoch —
a ready-to-plot drift time series.

Scale shape: the reference collapses to ``nbins`` counts ONCE (computed at
monitor start, broadcast into every epoch); each micro-batch aggregates at
(source, bin) grain. Nothing accumulates across epochs — no state store,
no watermark needed; the monitor is stateless by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gensor_spark.operators.drift import psi_vs_reference


def drift_monitor_stream(
    stream: DataFrame,
    reference: DataFrame,
    out_dir: str,
    group_col: str = "source",
    value_col: str = "n_chars",
    nbins: int = 10,
    trigger_once: bool = False,
):
    """Start a per-epoch PSI monitor sink over a document stream.

    ``reference`` is a static DataFrame (the accepted corpus); its value
    bounds are pinned once here so every epoch is scored on the same grid.
    Output rows per epoch: (group, n_docs, psi) under
    ``{out_dir}/data/epoch=<epoch_id>``.
    """
    lo_hi = (
        reference.filter(F.col(value_col).isNotNull())
        .agg(F.min(F.col(value_col).cast("long")),
             F.max(F.col(value_col).cast("long")))
        .first()
    )
    if lo_hi[0] is None:
        raise ValueError("reference has no non-null values to bound the grid")
    bounds = (int(lo_hi[0]), int(lo_hi[1]))

    def _score(batch: DataFrame, epoch_id: int) -> None:
        out = psi_vs_reference(
            batch, reference, group_col, value_col, nbins=nbins, bounds=bounds
        )
        # idempotent per-epoch sink (asof_stream contract): a replayed
        # epoch overwrites exactly its own partition directory
        out.write.mode("overwrite").parquet(f"{out_dir}/data/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", f"{out_dir}/_checkpoints")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
