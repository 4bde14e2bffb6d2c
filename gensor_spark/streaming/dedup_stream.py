"""Streaming exact deduplication: first-occurrence-wins over a doc stream.

The batch engine's ``operators/dedup.exact_dedup`` reports duplicates after
the fact; an ingestion pipeline wants them *suppressed on the way in*. This
is Structured Streaming's watermarked ``dropDuplicates``:

- key = the content digest (``md5(text)``); the first *processed* row of a
  digest wins. Across micro-batches that is arrival order; *within* one
  micro-batch the surviving row is partition-order-dependent (Spark's
  ``dropDuplicates`` keeps whichever row its hash partition sees first) —
  any one-survivor-per-digest outcome is a correct dedup, but callers
  needing the batch engine's deterministic ``min(doc_id)`` keeper should
  run ``exact_dedup`` over the landed table;
- the event-time **watermark bounds the digest state**: Spark keeps one
  state row per digest seen within the lateness horizon and expires older
  ones. Without the watermark the state grows with corpus cardinality
  forever — the standard unbounded-state trap;
- consequence (documented, inherent): a duplicate arriving *later than the
  watermark horizon* after its original is no longer matched by state and
  passes through. Web-scale ingestion handles that tail with the batch
  dedup pass over the landed table — stream-suppress the near-in-time
  duplicates (crawl re-fetches, queue replays), batch-sweep the rest.

State scale: one row per distinct digest per horizon. At 10^12 docs/day
with a 1h horizon that is ~4×10^10 state rows across the cluster — sized by
the horizon, not the corpus, and shardable by digest (the state store
partitions on the dropDuplicates key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(docs: DataFrame, watermark: str = "10 minutes",
                 ts_col: str = "ts", text_col: str = "text") -> DataFrame:
    """Suppress exact duplicates within the watermark horizon.

    ``docs`` is a streaming DataFrame with an event-time column ``ts_col``.
    Emits each digest's first row; state expires past ``watermark``.

    ``dropDuplicatesWithinWatermark`` — NOT plain ``dropDuplicates`` — is
    what makes the bound real: plain ``dropDuplicates`` on a non-event-time
    subset never evicts its state rows (the gap SPARK-42931 closed), so the
    digest store would grow with corpus cardinality forever.
    """
    with_digest = docs.withColumn("_digest", F.md5(F.col(text_col)))
    return (
        with_digest.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )


def start_dedup_sink(deduped: DataFrame, out_dir: str,
                     trigger_once: bool = False):
    """Append the surviving rows to a parquet landing dir (checkpointed —
    exactly-once per epoch via the sink's transaction log)."""
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/_checkpoints")
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
