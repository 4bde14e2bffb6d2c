"""Composed streaming corpus ingestion: gate → [PII scrub] → mix → dedup → land.

The batch corpus operators are pure Catalyst expressions, so they lift onto
a streaming DataFrame unchanged — this module is the composition proof, the
shape a web-scale crawl ingester actually runs:

1. **quality gate** — row-local expression filters from
   ``functions/text.quality_features`` (min length, alnum ratio, stopword
   floor). Stateless: works in any mode.
2. **source mixing** — ``operators/sampling.stratified_sample`` keep-hash.
   Stateless and seed-stable, so replays of the same micro-batch keep the
   same rows (exactly-once friendly).
3. **exact dedup** — ``streaming/dedup_stream.dedup_stream``: the only
   stateful stage, digest state bounded by the watermark horizon.
4. **land** — append-mode parquet/Iceberg sink with checkpointing.

Everything before (3) is narrow (no shuffle, no state); the dedup state
store is the pipeline's only distributed state, partitioned on the digest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gensor_spark.functions.text import quality_features
from gensor_spark.operators.sampling import stratified_sample
from gensor_spark.streaming.dedup_stream import dedup_stream


def quality_gate(min_chars: int = 20, min_alnum_ratio: float = 0.5,
                 min_stopword_ratio: float = 0.0,
                 text_col: str = "text") -> Column:
    """The standard web-corpus keep-predicate as one row-local expression:
    min length, alnum-ratio floor, and an optional stopword-ratio floor
    (off by default — natural-language-only corpora set it to ~0.05 to
    drop keyword-stuffed spam)."""
    feats = quality_features(F.col(text_col))
    gate = (
        (feats["n_chars"] >= min_chars)
        & (feats["alnum_ratio"] >= min_alnum_ratio)
        & (feats["n_tokens"] > 0)
    )
    if min_stopword_ratio > 0:
        gate = gate & (feats["stopword_ratio"] >= min_stopword_ratio)
    return gate


def ingest_pipeline(docs: DataFrame, rates: dict[str, float],
                    watermark: str = "10 minutes",
                    min_chars: int = 20, min_alnum_ratio: float = 0.5,
                    min_stopword_ratio: float = 0.0,
                    default_rate: float = 1.0,
                    scrub: bool = False,
                    max_pii: int | None = None,
                    gopher: bool = False) -> DataFrame:
    """Gate → [gopher] → [scrub] → mix → dedup over a docs frame with columns
    ``(doc_id, ts, text, source)``. Returns the surviving rows.

    With ``gopher`` the full Gopher rule preset
    (operators/qualityfilter.gopher_quality_flags) runs after the cheap
    gate: docs failing any of the seven published rules are dropped. Like
    the gate it is row-local and stateless, so it lifts onto the streaming
    frame unchanged; the flag columns are removed before the mix stage.

    With ``scrub`` the PII redaction pass (operators/pii.scrub_pii) runs
    between the gate and the mix — row-local and stateless, so it lifts
    onto the streaming frame unchanged, and dedup sees REDACTED text (two
    docs differing only in their PII become the duplicate they are). With
    ``max_pii`` docs whose total redaction count exceeds the cap are
    dropped (PII-density filter); the count columns are removed before
    landing either way.

    Works on a streaming frame (watermark-bounded dedup state) AND on a
    plain batch frame — Spark rejects ``dropDuplicatesWithinWatermark`` in
    batch mode, so the batch path uses plain digest ``dropDuplicates``
    (state bounds are a streaming-only concern; one-survivor-per-digest
    semantics are the same)."""
    gated = docs.filter(quality_gate(
        min_chars=min_chars, min_alnum_ratio=min_alnum_ratio,
        min_stopword_ratio=min_stopword_ratio,
    ))
    if gopher:
        from gensor_spark.operators.qualityfilter import (
            GOPHER_RULE_ORDER,
            gopher_quality_flags,
        )

        gated = (
            gopher_quality_flags(gated)
            .filter(F.col("keep"))
            .drop("keep", "reason", *GOPHER_RULE_ORDER)
        )
    if scrub or max_pii is not None:
        from gensor_spark.operators.pii import PII_PATTERNS, scrub_pii

        scrubbed = scrub_pii(gated)
        if max_pii is not None:
            scrubbed = scrubbed.filter(F.col("n_pii") <= max_pii)
        gated = scrubbed.drop("n_pii",
                              *[f"n_{k}" for k in PII_PATTERNS])
    mixed = stratified_sample(gated, rates, default_rate=default_rate)
    if not mixed.isStreaming:
        return (
            mixed.withColumn("_digest", F.md5(F.col("text")))
            .dropDuplicates(["_digest"])
            .drop("_digest")
        )
    return dedup_stream(mixed, watermark=watermark)


def start_ingest_sink(survivors: DataFrame, out_dir: str,
                      trigger_once: bool = False):
    """Same landing contract as the dedup stage's sink — one implementation."""
    from gensor_spark.streaming.dedup_stream import start_dedup_sink

    return start_dedup_sink(survivors, out_dir, trigger_once=trigger_once)
