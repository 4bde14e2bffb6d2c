"""Streaming percentile-tier maintenance: histogram contributions per epoch.

The percentile tiers' state (operators/histquantiles.py — per-bin value-count
maps) is associative, and the incremental store (TierPipeline ``hist_tiers``)
already merges ANY set of contributions at read. That makes the streaming
form almost free of machinery: each micro-batch's points roll up to 1m
histogram partials and land as one more contribution directory — bins that
span micro-batches simply produce several contributions that the read-side
``merge_hist`` adds together. No watermark, no stateful operator, no window
close to wait for: late data is just another contribution, identical to the
batch pipeline's late-data waves.

Delivery: ``foreachBatch`` is at-least-once on replay, so each epoch writes
to its own ``batch=s<epoch>`` directory in overwrite mode — a replayed epoch
overwrites exactly its own contribution (the asof_stream sink contract).
Contribution ids are prefixed ``s`` so they can never collide with the batch
pipeline's integer ids (run buckets and wave·n+bucket); a TierPipeline over
the same store dir merges batch, wave and stream contributions together.

One hole overwrite-per-epoch alone can't close: ``compact_hist`` /
``apply_hist_retention`` FOLD contribution dirs into ``batch=-1`` and delete
them — a replay of an already-folded epoch would then re-add its histograms
next to the folded copy and double-count. The fold therefore records the
absorbed stream epochs in the tier's ``_folded.json`` (written atomically
with the fold, see TierPipeline._rewrite_tier), and this sink SKIPS any
epoch listed there.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from gensor_spark.operators.histquantiles import rollup_hist

KEYS = ("doc_id", "source")


def make_hist_sink(store_dir: str, keys: tuple[str, ...] = KEYS):
    """The per-epoch sink function (exposed for direct replay testing)."""
    base = Path(store_dir) / "tier_hist_1m"

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        folded_file = base / "_folded.json"
        if folded_file.exists():
            folded = set(json.loads(folded_file.read_text())
                         .get("folded_stream_epochs", []))
            if f"s{epoch_id}" in folded:
                # this epoch's contribution was already absorbed into
                # batch=-1 by a compact/retention fold — re-writing it
                # would double-count every histogram it carried
                return
        hist = rollup_hist(batch, "1m", keys=keys)
        hist.write.mode("overwrite").parquet(str(base / f"batch=s{epoch_id}"))

    return _sink


def start_hist_sink(
    points: DataFrame,
    store_dir: str,
    keys: tuple[str, ...] = KEYS,
    trigger_once: bool = False,
    checkpoint_dir: str | None = None,
):
    """Stream of point rows → per-epoch 1m histogram contributions under
    ``{store_dir}/tier_hist_1m/batch=s<epoch>`` (the TierPipeline hist
    store layout — ``read_hist_quantiles`` on the same store folds stream,
    batch and wave contributions into one exact percentile view)."""
    _sink = make_hist_sink(store_dir, keys)

    writer = (
        points.writeStream.foreachBatch(_sink)
        .option("checkpointLocation",
                checkpoint_dir or f"{store_dir}/_hist_checkpoints")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
