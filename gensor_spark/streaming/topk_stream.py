"""Streaming top-k tier maintenance: Misra-Gries contributions per epoch.

The third instance of the streaming sketch-contribution pattern
(streaming/hist_stream.py documents the full reasoning): MG summaries are
associative under the merge in operators/topkrollup.py, and the
incremental store (TierPipeline ``topk_tiers``) merges ANY set of
contributions at read, so each micro-batch's points roll up to 1m summary
partials and land as one more ``batch=s<epoch>`` contribution directory.
Bins spanning micro-batches just produce several summaries the read-side
``merge_topk`` combines — no watermark, no stateful operator, late data
is another contribution.

One semantic difference from the HLL/hist twins: the MG merge is lossy,
so a split-then-merged summary is a WEAKER certificate (larger ``err``)
than a from-scratch rollup over the union — never a wrong one. The
certificate bounds (``cnt <= true <= cnt + err``; dropped => ``true <=
err``; ``err <= n/(k+1)``) hold for every contribution partition of the
input, proven in tests/test_topk_stream.py; when no truncation fires
(per-contribution bin cardinality <= k) streamed equals batch exactly.

Delivery is the hist-sink contract verbatim: overwrite-per-epoch makes
at-least-once ``foreachBatch`` replays idempotent, and epochs already
absorbed by a ``compact_topk``/retention fold (recorded in the tier's
``_folded.json``, written atomically with the fold) are SKIPPED so a
replay can never double-count a folded contribution.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame

from gensor_spark.operators.topkrollup import rollup_topk

KEYS = ("doc_id", "source")


def make_topk_sink(
    store_dir: str,
    keys: tuple[str, ...] = KEYS,
    of: str = "value",
    k: int = 32,
):
    """The per-epoch sink function (exposed for direct replay testing)."""
    base = Path(store_dir) / "tier_topk_1m"

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        folded_file = base / "_folded.json"
        if folded_file.exists():
            folded = set(json.loads(folded_file.read_text())
                         .get("folded_stream_epochs", []))
            if f"s{epoch_id}" in folded:
                # absorbed into batch=-1 by a compact/retention fold —
                # re-writing would double-count every summary it carried
                return
        sk = rollup_topk(batch, "1m", of=of, keys=keys, k=k)
        sk.write.mode("overwrite").parquet(str(base / f"batch=s{epoch_id}"))

    return _sink


def start_topk_sink(
    points: DataFrame,
    store_dir: str,
    keys: tuple[str, ...] = KEYS,
    of: str = "value",
    k: int = 32,
    trigger_once: bool = False,
    checkpoint_dir: str | None = None,
):
    """Stream of point rows → per-epoch 1m Misra-Gries contributions under
    ``{store_dir}/tier_topk_1m/batch=s<epoch>`` (the TierPipeline top-k
    store layout — ``read_topk`` on the same store folds stream, batch and
    wave contributions into one certified heavy-hitter view)."""
    _sink = make_topk_sink(store_dir, keys, of=of, k=k)

    writer = (
        points.writeStream.foreachBatch(_sink)
        .option("checkpointLocation",
                checkpoint_dir or f"{store_dir}/_topk_checkpoints")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
