"""Streaming Count-Min tier maintenance: counter contributions per epoch.

The fourth instance of the streaming sketch-contribution pattern
(streaming/hist_stream.py documents the full reasoning): CMS counters are
sums, so they are associative under ``operators/cmsketch.merge_cms`` and
the incremental store (TierPipeline ``cms_tiers``) merges ANY set of
contributions at read — each micro-batch's points roll up to 1m sparse
counter partials and land as one more ``batch=s<epoch>`` contribution
directory. Bins spanning micro-batches produce several partial counters
the read-side sum combines; no watermark, no stateful operator, late data
is just another contribution.

Unlike the Misra-Gries twin (whose split-then-merge is a weaker-but-never-
wrong certificate) the CMS merge is EXACT: a streamed store reads
bit-identically to a from-scratch batch build over the union of all epochs
— proven in tests/test_cmsketch.py across epoch splits, compaction and
replay.

Delivery is the hist-sink contract verbatim: overwrite-per-epoch makes
at-least-once ``foreachBatch`` replays idempotent, and epochs already
absorbed by a ``compact_cms``/retention fold (recorded in the tier's
``_folded.json``, written atomically with the fold) are SKIPPED so a
replay can never double-count a folded contribution.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from gensor_spark.operators.cmsketch import rollup_cms

KEYS = ("doc_id", "source")


def make_cms_sink(
    store_dir: str,
    keys: tuple[str, ...] = KEYS,
    of: str = "value",
    depth: int = 4,
    width: int = 1024,
):
    """The per-epoch sink function (exposed for direct replay testing)."""
    base = Path(store_dir) / "tier_cms_1m"

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        folded_file = base / "_folded.json"
        if folded_file.exists():
            folded = set(json.loads(folded_file.read_text())
                         .get("folded_stream_epochs", []))
            if f"s{epoch_id}" in folded:
                # absorbed into batch=-1 by a compact/retention fold —
                # re-writing would double-count every counter it carried
                return
        sk = rollup_cms(batch, "1m", of=of, keys=keys,
                        depth=depth, width=width)
        sk.write.mode("overwrite").parquet(str(base / f"batch=s{epoch_id}"))

    return _sink


def start_cms_sink(
    points: DataFrame,
    store_dir: str,
    keys: tuple[str, ...] = KEYS,
    of: str = "value",
    depth: int = 4,
    width: int = 1024,
    trigger_once: bool = False,
    checkpoint_dir: str | None = None,
):
    """Stream of point rows → per-epoch 1m Count-Min contributions under
    ``{store_dir}/tier_cms_1m/batch=s<epoch>`` (the TierPipeline CMS store
    layout — ``read_cms`` on the same store folds stream, batch and wave
    contributions into one point-queryable frequency view)."""
    _sink = make_cms_sink(store_dir, keys, of=of, depth=depth, width=width)

    writer = (
        points.writeStream.foreachBatch(_sink)
        .option("checkpointLocation",
                checkpoint_dir or f"{store_dir}/_cms_checkpoints")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
