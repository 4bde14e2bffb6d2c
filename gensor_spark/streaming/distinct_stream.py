"""Streaming distinct-count tier maintenance: HLL contributions per epoch.

The second instance of the streaming sketch-contribution pattern
(streaming/hist_stream.py documents the full reasoning): HLL sketches are
associative under union, and the incremental store (TierPipeline
``distinct_tiers``) merges ANY set of contributions at read, so each
micro-batch's points roll up to 1m sketch partials and land as one more
``batch=s<epoch>`` contribution directory. Bins spanning micro-batches just
produce several sketches the read-side ``merge_distinct`` unions — no
watermark, no stateful operator, late data is another contribution.

Delivery is the hist-sink contract verbatim: overwrite-per-epoch makes
at-least-once ``foreachBatch`` replays idempotent, and epochs already
absorbed by a ``compact_distinct``/retention fold (recorded in the tier's
``_folded.json``, written atomically with the fold) are SKIPPED so a
replay can never double-count a folded contribution.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from gensor_spark.operators.distinctrollup import rollup_distinct

KEYS = ("doc_id", "source")


def make_distinct_sink(
    store_dir: str,
    keys: tuple[str, ...] = KEYS,
    of: str = "value",
    lgk: int = 12,
):
    """The per-epoch sink function (exposed for direct replay testing)."""
    base = Path(store_dir) / "tier_distinct_1m"

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        folded_file = base / "_folded.json"
        if folded_file.exists():
            folded = set(json.loads(folded_file.read_text())
                         .get("folded_stream_epochs", []))
            if f"s{epoch_id}" in folded:
                # absorbed into batch=-1 by a compact/retention fold —
                # re-writing would double-count every sketch it carried
                return
        sk = rollup_distinct(batch, "1m", of=of, keys=keys, lgk=lgk)
        sk.write.mode("overwrite").parquet(str(base / f"batch=s{epoch_id}"))

    return _sink


def start_distinct_sink(
    points: DataFrame,
    store_dir: str,
    keys: tuple[str, ...] = KEYS,
    of: str = "value",
    lgk: int = 12,
    trigger_once: bool = False,
    checkpoint_dir: str | None = None,
):
    """Stream of point rows → per-epoch 1m HLL contributions under
    ``{store_dir}/tier_distinct_1m/batch=s<epoch>`` (the TierPipeline
    distinct store layout — ``read_distinct`` on the same store folds
    stream, batch and wave contributions into one estimate view)."""
    _sink = make_distinct_sink(store_dir, keys, of=of, lgk=lgk)

    writer = (
        points.writeStream.foreachBatch(_sink)
        .option("checkpointLocation",
                checkpoint_dir or f"{store_dir}/_distinct_checkpoints")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
