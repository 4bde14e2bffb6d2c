"""Stream-fed store → batch cascade == all-batch pipeline, bit-for-bit.

VERDICT r2 #9: the engine claims ONE storage contract for both execution
modes — 1m partial states written by Structured Streaming must be
indistinguishable from batch-written ones to everything downstream. This
test proves it end-to-end: a file-source stream fills the 1m tier, the
BATCH ``cascade_tier`` derives 1h and 1d from those streamed partials, and
the result must equal the all-batch pipeline (points → rollup_tier per
tier) exactly.

Watermark edge: append mode only emits CLOSED windows, so a bounded input
normally withholds each series' final window. A single sentinel event one
day past the real data closes every real window; the sentinel's own series
is excluded from the comparison.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.points import events_to_points
from gensor_spark.operators.rollup import cascade_tier, finalize_tier, rollup_tier
from gensor_spark.streaming.rollup_stream import (
    read_stream_tier,
    start_tier_sink,
    stream_points_from_events,
    streaming_rollup,
)

SF = "/root/testdata/sf0.001"
SENTINEL_USER = -999


@pytest.fixture(scope="module")
def filled_store(spark, tmp_path_factory):
    """Stream the sf0.001 events into a fresh 1m tier store, then resume the
    SAME checkpoint with one sentinel event a month later: the resumed pass
    advances the watermark past every real window, so the final per-series
    windows (normally withheld by append mode) flush too. Two passes also
    exercise exactly the restart-from-checkpoint path a real deployment
    uses. Yields the store dir."""
    store = tmp_path_factory.mktemp("cascade_store")
    events_dir = tmp_path_factory.mktemp("cascade_events")
    shutil.copy(f"{SF}/events.parquet", events_dir / "events.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")

    def run_pass():
        stream = spark.readStream.schema(events.schema).parquet(str(events_dir))
        rolled = streaming_rollup(stream_points_from_events(stream),
                                  tier="1m", watermark="1 minute")
        q = start_tier_sink(rolled, str(store), tier="1m", trigger_once=True)
        q.awaitTermination(180)

    run_pass()
    # Schema-exact sentinels: clone one real row, push it far out and onto
    # its own user id so it can be excluded from the comparison. TWO resumed
    # passes because append-mode emission in a batch uses the watermark
    # committed by the PREVIOUS batch: pass 2 ingests sentinel A (advancing
    # the committed watermark past all real data), pass 3 ingests sentinel B
    # and emits everything A closed.
    for n, days in (("a", 31), ("b", 62)):
        sentinel = (
            events.limit(1)
            .withColumn("user_id", F.lit(SENTINEL_USER).cast("long"))
            .withColumn("ts", F.col("ts") + F.expr(f"interval {days} days"))
        )
        # the file stream source lists FLAT files in events_dir (the seed is
        # a plain file); df.write.parquet emits a directory — flatten it
        tmp = tmp_path_factory.mktemp(f"sentinel_{n}")
        sentinel.coalesce(1).write.mode("overwrite").parquet(str(tmp / "out"))
        part = next((tmp / "out").glob("part-*.parquet"))
        shutil.copy(part, events_dir / f"sentinel_{n}.parquet")
        run_pass()
    yield str(store)
    shutil.rmtree(store, ignore_errors=True)


def _assert_same(got, want, tier):
    # count/min/max/last are order-insensitive → exact equality. mean sums
    # vsum in shuffle order (non-associative FP) → the engine's standard
    # 6-decimal + 1e-9 rounding convention (queries._r6); everything else
    # about the row must match bit-for-bit.
    def norm(df):
        return df.select(
            "doc_id", "source", "bin_ts", "count", "min", "max",
            F.round(F.col("mean") + F.lit(1e-9), 6).alias("mean"), "last",
        )

    g, w = norm(got), norm(want)
    assert g.exceptAll(w).count() == 0, f"{tier}: streamed-cascade ⊄ batch"
    assert w.exceptAll(g).count() == 0, f"{tier}: batch ⊄ streamed-cascade"


def test_stream_fed_cascade_bit_identical_to_batch(spark, filled_store):
    streamed_1m = (
        read_stream_tier(spark, filled_store, "1m", finalize=False)
        .filter(F.col("doc_id") != str(SENTINEL_USER))
    )
    batch_pts = events_to_points(
        spark.read.parquet(f"{SF}/events.parquet")
    ).select("doc_id", "source", "ts", "value")

    # the streamed 1m tier itself is complete and exact (sentinel closed
    # every real window — no 0.95 coverage waiver needed)
    _assert_same(finalize_tier(streamed_1m),
                 finalize_tier(rollup_tier(batch_pts, "1m")), "1m")

    # batch-cascade the STREAM-fed partials to 1h/1d; must equal the
    # all-batch pipeline built straight from points
    for tier in ("1h", "1d"):
        got = finalize_tier(cascade_tier(streamed_1m, tier))
        want = finalize_tier(rollup_tier(batch_pts, tier))
        _assert_same(got, want, tier)
