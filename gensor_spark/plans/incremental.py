"""Incremental tier maintenance: resumable, idempotent, with lineage.

North-rule requirements: continuous aggregates (1m→1h→1d) maintained as
incrementally-merged tables, per-partition lineage rows, resumable from
checkpoint. gensor has no incrementality at all — every ``resample`` call
recomputes from raw (``/root/reference/gensor/core/base.py:147-170``); its
only idempotency is the SQLite ``ON CONFLICT DO NOTHING`` insert
(``base.py:355-358``). This module is the from-scratch distributed
replacement.

Design (two storage backends — parquet directories, or Iceberg tables
maintained with real ``MERGE INTO`` via plans/iceberg_store.py):

- Input is processed in deterministic **batches** (at real scale: Iceberg
  snapshots / ingest partitions; here: hash buckets of doc_id). Each batch's
  contribution to each tier is written as **partial states**
  (operators/rollup.py) — parquet backend: ``tier_<t>/batch=<id>/`` with
  directory-level overwrite; iceberg backend: one ``MERGE INTO`` snapshot
  keyed on ``(keys…, bin_ts, batch)`` — so re-running a batch is idempotent
  in either backend.
- The **checkpoint ledger** (`_ledger.json`, written atomically via
  tmp+rename) records completed batches; a rerun skips them. A crash between
  data write and ledger update is safe: the rerun overwrites the same
  directory with identical content.
- **Lineage** (`_lineage.jsonl`): one row per (batch, tier) with row/point
  counts and wall time — the per-partition lineage rows the north rule asks
  for.
- Reads merge partial states across batch contributions (associative — see
  rollup.py) and finalize to count/min/max/mean/last. ``compact()``
  re-aggregates a tier into a single contribution (Iceberg: rewrite_data_files).

Because partials are associative and batches are disjoint row sets, the
pipeline commutes with any batch order and any parallelism level — which is
also what makes the N-vs-4N scaling run apples-to-apples.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from gensor_spark.operators.histquantiles import (
    cascade_hist,
    merge_hist,
    quantiles_from_hist,
    rollup_hist,
    rollup_hist_docs_arrow,
)
from gensor_spark.operators.points import docs_to_points
from gensor_spark.operators.rollup import (
    _merge_partials,
    _merge_partials_narrow,
    cascade_tier,
    cascade_tier_narrow,
    finalize_tier,
    rollup_docs_arrow,
    rollup_docs_arrow_narrow,
    rollup_tier,
    widen_partials,
)

TIERS = ("1m", "1h", "1d")


class TierPipeline:
    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        keys: tuple[str, ...] = ("doc_id", "source"),
        n_batches: int = 8,
        tick_seconds: int = 60,
        encode_blobs: bool = False,
        max_concurrent: int = 2,
        backend: str = "parquet",
        iceberg_namespace: str = "local.gensor",
        narrow_partials: bool = False,
        hist_tiers: bool = False,
        distinct_tiers: bool = False,
        distinct_of: str = "value",
        distinct_lgk: int = 12,
        topk_tiers: bool = False,
        topk_of: str = "value",
        topk_k: int = 32,
        cms_tiers: bool = False,
        cms_of: str = "value",
        cms_depth: int = 4,
        cms_width: int = 1024,
        var_tiers: bool = False,
        ohlc_tiers: bool = False,
        moment_tiers: bool = False,
        hist_quantize_alpha: float | None = None,
    ) -> None:
        self.spark = spark
        self.store = Path(store_dir)
        self.keys = keys
        self.n_batches = n_batches
        self.tick_seconds = tick_seconds
        #: tier storage: "parquet" (directory-per-batch, dynamic overwrite)
        #: or "iceberg" (MERGE INTO per batch — plans/iceberg_store.py;
        #: requires the iceberg-spark runtime jar + a configured catalog,
        #: see iceberg_store.iceberg_conf). Ledger/lineage/blobs stay on the
        #: filesystem either way.
        self.backend = backend
        # validate flag/backend combinations BEFORE any backend session work
        if narrow_partials and backend != "parquet":
            raise ValueError("narrow_partials requires the parquet backend")
        if hist_tiers and backend != "parquet":
            raise ValueError("hist_tiers requires the parquet backend")
        if distinct_tiers and backend != "parquet":
            raise ValueError("distinct_tiers requires the parquet backend")
        if topk_tiers and backend != "parquet":
            raise ValueError("topk_tiers requires the parquet backend")
        if cms_tiers and backend != "parquet":
            raise ValueError("cms_tiers requires the parquet backend")
        if var_tiers and backend != "parquet":
            raise ValueError("var_tiers requires the parquet backend")
        if (ohlc_tiers or moment_tiers) and backend != "parquet":
            raise ValueError("ohlc_tiers/moment_tiers require the parquet backend")
        if var_tiers and narrow_partials:
            raise ValueError(
                "var_tiers needs the wide partial schema (vsumsq is float64; "
                "the narrow experiment does not carry it)"
            )
        if (ohlc_tiers or moment_tiers) and narrow_partials:
            raise ValueError(
                "ohlc_tiers/moment_tiers need the wide partial schema")
        if backend == "iceberg":
            from gensor_spark.plans.iceberg_store import IcebergTierStore

            self.iceberg = IcebergTierStore(spark, iceberg_namespace, keys=keys)
        elif backend != "parquet":
            raise ValueError(f"unknown backend {backend!r}")
        #: north-star compression stage: also write each batch's series as
        #: Gorilla/delta-of-delta blobs (codecs/gorilla.py, Arrow UDF)
        self.encode_blobs = encode_blobs
        #: store/shuffle tier partials in the NARROW physical schema
        #: (int32 bin ordinals, float32 extrema — operators/rollup.py):
        #: ~45% narrower numeric payload per partial row through the Arrow
        #: boundary, the cascade shuffles and the parquet store. Lossless
        #: iff |token| < 2^24 (asserted in the kernel); read_tier widens
        #: back, so finalized outputs are bit-identical either way.
        #: Parquet backend only (the Iceberg tier tables keep wide rows).
        self.narrow_partials = narrow_partials
        #: also maintain 1m value-histogram partials per batch (operators/
        #: histquantiles.py) — the mergeable EXACT-percentile state the wide
        #: partials cannot express. Coarser percentile tiers cascade at read
        #: from the stored 1m histograms (bin-grain work, no raw re-read):
        #: ``read_hist_quantiles``. The batch path rides the affine Arrow
        #: kernel (rollup_hist_docs_arrow — no point explode); late-data
        #: waves use the ts-stamped point path. Opt-in: the histogram state
        #: is inherently heavier than count/min/max/mean/last. Parquet
        #: backend only (the Iceberg MERGE templates carry wide rows, not
        #: map columns).
        self.hist_tiers = hist_tiers
        #: DDSketch mode for the histogram tiers (operators/ddsketch.py):
        #: when set, values are quantized onto the log bucket grid with this
        #: relative accuracy BEFORE entering the 1m histograms — the
        #: unbounded-float path, bounding per-bin state at
        #: 2·log_gamma(vmax/vmin)+1 buckets regardless of cardinality.
        #: Quantization happens once at the leaves, so every downstream
        #: guarantee (merge associativity, cascade == direct, waves,
        #: retention) holds bit-exactly over the quantized domain. Keep the
        #: value constant for a store's lifetime (mixed grids would merge
        #: distinct bucket keys). Requires hist_tiers.
        if hist_quantize_alpha is not None and not hist_tiers:
            raise ValueError("hist_quantize_alpha requires hist_tiers=True")
        self.hist_quantize_alpha = hist_quantize_alpha
        #: also maintain 1m HLL distinct-count sketches per batch
        #: (operators/distinctrollup.py) — the mergeable distinct-count
        #: state (distinct values/tokens/docs per bin) the numeric partials
        #: cannot express. Coarser tiers cascade at read via register-max
        #: union (``read_distinct``), exactly the hist contract. Parquet
        #: backend only.
        self.distinct_tiers = distinct_tiers
        self.distinct_of = distinct_of
        self.distinct_lgk = distinct_lgk
        #: also maintain 1m Misra-Gries top-k heavy-hitter summaries per
        #: batch (operators/topkrollup.py) — the mergeable "which items
        #: dominate each bin" state over unbounded item domains. Coarser
        #: tiers cascade at read via the MG merge (``read_topk``), the
        #: hist/distinct contract. Parquet backend only.
        self.topk_tiers = topk_tiers
        self.topk_of = topk_of
        self.topk_k = topk_k
        #: also maintain 1m Count-Min sketch counters per batch
        #: (operators/cmsketch.py) — the mergeable point-query frequency
        #: state ("how often did THIS item appear in that bin" for ANY
        #: item, not just heavy hitters). Counters are sums, so cascades,
        #: cross-contribution merges, compaction and retention are all
        #: BIT-EXACT vs a from-scratch build (stronger than MG/HLL). Keep
        #: depth/width constant for a store's lifetime — they are the
        #: sketch's identity, like lgk for HLL. Parquet backend only.
        self.cms_tiers = cms_tiers
        self.cms_of = cms_of
        self.cms_depth = cms_depth
        self.cms_width = cms_width
        #: also carry the Σx² variance partial in every stored tier row
        #: (operators/rollup.py with_sumsq) — `read_tier(finalize=True)` then
        #: emits var/std alongside count/min/max/mean/last; the sumsq-aware
        #: merge makes cascades/compaction/retention propagate it unchanged.
        #: Keep the flag constant for a store's lifetime (mixed batches
        #: would disagree on the parquet schema). Parquet backend only.
        self.var_tiers = var_tiers
        #: ditto for the first/first_ts OHLC pair and the Σx³/Σx⁴ moment
        #: partials — each an opt-in column family every merge path
        #: (cascade, compaction, retention, streaming fold) carries
        #: unchanged because _merge_partials is schema-driven
        self.ohlc_tiers = ohlc_tiers
        self.moment_tiers = moment_tiers
        #: batches in flight at once. Spark schedules concurrent jobs from
        #: driver threads task-by-task, so a second batch's heavy stages fill
        #: the slots the first batch leaves idle during its commit/small-stage
        #: tail — this amortizes the parallelism-independent per-job floor
        #: (scheduler + file-commit latency) that otherwise bounds wide-N
        #: scaling efficiency (the Amdahl term measured in BENCH/BASELINE.md).
        self.max_concurrent = max(1, max_concurrent)
        self._meta_lock = threading.Lock()
        self.store.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- checkpoint

    @property
    def _ledger_path(self) -> Path:
        return self.store / "_ledger.json"

    def ledger(self) -> dict:
        if self._ledger_path.exists():
            return json.loads(self._ledger_path.read_text())
        return {"processed": []}

    def _commit_batch(self, batch_id: int) -> None:
        with self._meta_lock:  # read-modify-write; batches may commit concurrently
            led = self.ledger()
            if batch_id not in led["processed"]:
                led["processed"].append(batch_id)
                led["processed"].sort()
            tmp = self._ledger_path.with_suffix(".tmp")
            tmp.write_text(json.dumps(led, indent=1))
            os.replace(tmp, self._ledger_path)  # atomic checkpoint

    def _lineage_row(self, row: dict) -> None:
        with self._meta_lock:
            with (self.store / "_lineage.jsonl").open("a") as f:
                f.write(json.dumps(row) + "\n")

    def lineage(self) -> list[dict]:
        p = self.store / "_lineage.jsonl"
        if not p.exists():
            return []
        return [json.loads(line) for line in p.read_text().splitlines()]

    # -------------------------------------------------------------------- run

    def _batch_col(self):
        return F.pmod(F.xxhash64(*self.keys), F.lit(self.n_batches))

    def _write_counted(self, df: DataFrame, out_dir: str) -> int:
        """Overwrite-write ``df`` and return its row count from the SAME job.

        The count rides along as an observed metric (``CollectMetrics`` node
        over the write scan) instead of a second read-back action — each
        ``.count()`` job was pure parallelism-independent floor (~0.3-0.5s of
        scheduler + listing latency apiece, 4 per batch), the dominant term
        in the wide-pair scaling gap (BENCH/BASELINE.md §3).

        Writes at the plan's natural partitioning: a ``repartition(n)`` here
        is a full Exchange of the tier rows purely to shape file counts, and
        ``coalesce(n)`` is worse — it collapses the upstream Arrow kernel to
        n tasks (no stage boundary), throttling the rollup/codec stages.
        File-count hygiene belongs to compaction (``compact()`` / Iceberg
        ``rewrite_data_files``), not the hot ingest path; a lone
        ``repartition(1)`` single-file write was a measured 4s serial tail.
        """
        obs = Observation()
        (
            df.observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        return int(obs.get["rows"])

    def _store_tier(self, tier_df: DataFrame, tier: str, b: int) -> int:
        """Persist one batch's tier partials via the configured backend."""
        if self.backend == "iceberg":
            # one atomic MERGE-INTO snapshot per (tier, batch); idempotent
            # on re-run because the merge key includes the batch id.
            # Lineage count comes from manifest metadata (count_batch), not
            # a standalone data-scan count job — see IcebergTierStore.
            self.iceberg.merge_batch(tier, tier_df, b)
            return self.iceberg.count_batch(tier, b)
        return self._write_counted(
            tier_df, str(self.store / f"tier_{tier}" / f"batch={b}")
        )

    def _process_batch(self, docs_batched: DataFrame, b: int) -> None:
        t0 = time.monotonic()
        batch_docs = docs_batched.filter(F.col("_batch") == b).drop("_batch")
        counts: dict[str, int] = {}
        blob_thread: threading.Thread | None = None
        blob_err: list[BaseException] = []
        if self.encode_blobs:
            from gensor_spark.codecs.gorilla import EPOCH0_US, encode_docs

            blob_dir = str(self.store / "blobs" / f"batch={b}")
            blobs = encode_docs(
                batch_docs,
                tick_us=self.tick_seconds * 1_000_000,
                epoch0_us=EPOCH0_US,
            )

            def _encode() -> None:
                # overlaps the tier chain below: the codec stage is pure
                # Arrow-UDF CPU work while the tier chain alternates compute
                # with shuffle/commit waits — interleaving them keeps task
                # slots busy through both jobs' serial tails
                try:
                    counts["blobs"] = self._write_counted(blobs, blob_dir)
                except BaseException as e:  # re-raised on join
                    blob_err.append(e)

            blob_thread = threading.Thread(target=_encode, daemon=True)
            blob_thread.start()

        # affine-ts fast path: 1m partials straight from the token arrays via
        # the batched numpy reduceat kernel — no point-view explode, no
        # raw-point shuffle; bit-identical to rollup_tier(docs_to_points(...)).
        # Persisted so the 1h cascade reuses the in-memory partials instead of
        # a parquet read-back round trip (another ~2 floor jobs per batch).
        if self.narrow_partials:
            m1 = rollup_docs_arrow_narrow(
                batch_docs, "1m", tick_seconds=self.tick_seconds,
                keys=self.keys,
            ).persist()
        else:
            m1 = rollup_docs_arrow(
                batch_docs, "1m", tick_seconds=self.tick_seconds,
                keys=self.keys, with_sumsq=self.var_tiers,
                with_first=self.ohlc_tiers, with_moments=self.moment_tiers,
            ).persist()
        h1: DataFrame | None = None
        try:
            counts["1m"] = self._store_tier(m1, "1m", b)
            # coarser tiers cascade from the (much smaller) finer tier —
            # never re-read the raw points
            if self.narrow_partials:
                h1 = cascade_tier_narrow(m1, "1m", "1h", keys=self.keys).persist()
                counts["1h"] = self._store_tier(h1, "1h", b)
                counts["1d"] = self._store_tier(
                    cascade_tier_narrow(h1, "1h", "1d", keys=self.keys), "1d", b
                )
            else:
                h1 = cascade_tier(m1, "1h", keys=self.keys).persist()
                counts["1h"] = self._store_tier(h1, "1h", b)
                counts["1d"] = self._store_tier(
                    cascade_tier(h1, "1d", keys=self.keys), "1d", b
                )
        finally:
            m1.unpersist()
            if h1 is not None:
                h1.unpersist()
            if blob_thread is not None:
                blob_thread.join()
        if blob_err:
            raise blob_err[0]
        if self.hist_tiers:
            counts["hist_1m"] = self._store_hist_batch_docs(batch_docs, b)
        if self.distinct_tiers:
            counts["distinct_1m"] = self._store_distinct_batch(
                docs_to_points(batch_docs, tick_seconds=self.tick_seconds), b)
        if self.topk_tiers:
            counts["topk_1m"] = self._store_topk_batch(
                docs_to_points(batch_docs, tick_seconds=self.tick_seconds), b)
        if self.cms_tiers:
            counts["cms_1m"] = self._store_cms_batch(
                docs_to_points(batch_docs, tick_seconds=self.tick_seconds), b)
        self._lineage_row(
            {
                "batch": b,
                "rows": counts,
                "wall_s": round(time.monotonic() - t0, 3),
                "tiers": list(TIERS),
            }
        )
        self._commit_batch(b)

    def run(self, docs: DataFrame, batches: list[int] | None = None) -> dict:
        """Process unprocessed batches; returns per-run stats.

        ``batches=None`` processes everything outstanding. Safe to kill and
        rerun at any point — completed batches are skipped via the ledger,
        half-written ones are overwritten bit-identically. Up to
        ``max_concurrent`` batches run concurrently (correct in any order /
        interleaving: batches are disjoint row sets and partials are
        associative; ledger + lineage writes are lock-serialized).
        """
        done = set(self.ledger()["processed"])
        todo = [
            b
            for b in (batches if batches is not None else range(self.n_batches))
            if b not in done
        ]
        stats = {"processed": [], "skipped": sorted(done)}
        if not todo:
            return stats

        # batch identity is doc-level (hash of the series keys), so filter
        # BEFORE the explode: each batch pass then explodes only its own
        # docs instead of all points (n_batches× less explode work per pass)
        docs_batched = docs.withColumn("_batch", self._batch_col())

        if self.max_concurrent <= 1 or len(todo) == 1:
            for b in todo:
                self._process_batch(docs_batched, b)
        else:
            with ThreadPoolExecutor(max_workers=self.max_concurrent) as pool:
                futures = [
                    pool.submit(self._process_batch, docs_batched, b) for b in todo
                ]
                for f in futures:
                    f.result()  # propagate the first failure
        stats["processed"] = sorted(todo)
        return stats

    # ------------------------------------------------- late data / backfill

    def ingest_points_wave(self, points: DataFrame, wave: int) -> dict:
        """Fold a late-arriving POINT delta into the tiers (backfill).

        Continuous-aggregate backfill without invalidation machinery: the
        partial states are associative, so late rows never rewrite stored
        bins — they land as NEW contributions ``batch = wave·n_batches +
        bucket`` and every affected bin re-merges at read (exactly the
        cross-batch merge ``read_tier``/``compact`` already perform). This
        is the first path where two contributions can share a (series, bin);
        ``_merge_partials`` is associative on every column including
        ``last`` (``max_by`` on ``last_ts``), so read-time results equal a
        from-scratch recompute over old+late points (asserted in tests).

        Late data arrives as the POINT view (ts-stamped rows), not re-packed
        token docs, so the rollup is the point-path ``rollup_tier`` (no
        affine-ts assumption) and the blob-encode stage does not apply.
        ``wave`` must be a unique integer ≥ 1 per delta (e.g. the ingest
        snapshot ordinal): idempotency per (wave, bucket) rides the same
        ledger as ``run()``, and wave ids stay integers so both backends'
        batch identity (parquet dir / Iceberg INT column) are unchanged.

        The one driver action (a distinct over ≤ ``n_batches`` bucket ids)
        skips empty buckets — a small delta then writes only the
        contributions it actually has, not ``n_batches`` empty dirs.
        """
        if not isinstance(wave, int) or wave < 1:
            raise ValueError(f"wave must be an integer >= 1, got {wave!r}")
        if self.narrow_partials:
            raise NotImplementedError(
                "point-wave backfill stores wide partials; narrow_partials "
                "pipelines (an off-by-default, measured-no-gain shuffle "
                "experiment) do not support it"
            )
        done = set(self.ledger()["processed"])
        bucketed = points.withColumn("_batch", self._batch_col())
        present = sorted(
            r["_batch"] for r in bucketed.select("_batch").distinct().collect()
        )
        stats = {"processed": [], "skipped": []}
        for b in present:
            sid = wave * self.n_batches + int(b)
            if sid in done:
                stats["skipped"].append(sid)
                continue
            self._process_points_batch(bucketed, int(b), sid, wave)
            stats["processed"].append(sid)
        return stats

    def _process_points_batch(self, bucketed: DataFrame, b: int, sid: int,
                              wave: int) -> None:
        t0 = time.monotonic()
        pts = bucketed.filter(F.col("_batch") == b).drop("_batch")
        counts: dict[str, int] = {}
        m1 = rollup_tier(
            pts, "1m", keys=self.keys, with_sumsq=self.var_tiers,
            with_first=self.ohlc_tiers, with_moments=self.moment_tiers,
        ).persist()
        h1: DataFrame | None = None
        try:
            counts["1m"] = self._store_tier(m1, "1m", sid)
            h1 = cascade_tier(m1, "1h", keys=self.keys).persist()
            counts["1h"] = self._store_tier(h1, "1h", sid)
            counts["1d"] = self._store_tier(
                cascade_tier(h1, "1d", keys=self.keys), "1d", sid
            )
        finally:
            m1.unpersist()
            if h1 is not None:
                h1.unpersist()
        if self.hist_tiers:
            counts["hist_1m"] = self._store_hist_batch(pts, sid)
        if self.distinct_tiers:
            counts["distinct_1m"] = self._store_distinct_batch(pts, sid)
        if self.topk_tiers:
            counts["topk_1m"] = self._store_topk_batch(pts, sid)
        if self.cms_tiers:
            counts["cms_1m"] = self._store_cms_batch(pts, sid)
        self._lineage_row(
            {
                "batch": sid,
                "wave": wave,
                "rows": counts,
                "wall_s": round(time.monotonic() - t0, 3),
                "tiers": list(TIERS),
            }
        )
        self._commit_batch(sid)

    # ----------------------------------------------- percentile (hist) tiers

    def _store_hist_batch(self, points: DataFrame, sid: int) -> int:
        """Write one contribution's 1m value-histogram partials (point
        path — the late-data waves, which arrive ts-stamped)."""
        if self.hist_quantize_alpha is not None:
            from gensor_spark.operators.ddsketch import dd_quantize

            points = points.withColumn(
                "value", dd_quantize(F.col("value"),
                                     self.hist_quantize_alpha))
        hist = rollup_hist(points, "1m", keys=self.keys)
        return self._write_counted(
            hist, str(self.store / "tier_hist_1m" / f"batch={sid}")
        )

    def _store_hist_batch_docs(self, batch_docs: DataFrame, sid: int) -> int:
        """Write one batch's 1m histogram partials via the affine Arrow
        kernel (no point explode, no raw-point shuffle — bit-identical to
        the point path, asserted in tests). Falls back to the point path
        for non-default series keys (the kernel's output schema is fixed)
        and for DDSketch mode (quantization is a point-grain projection)."""
        if (tuple(self.keys) != ("doc_id", "source")
                or self.hist_quantize_alpha is not None):
            return self._store_hist_batch(docs_to_points(batch_docs), sid)
        hist = rollup_hist_docs_arrow(
            batch_docs, "1m", tick_seconds=self.tick_seconds
        )
        return self._write_counted(
            hist, str(self.store / "tier_hist_1m" / f"batch={sid}")
        )

    # ------------------------------------------- sketch-tier family (generic)
    # The percentile histograms and the HLL distinct sketches share ONE
    # store contract: per-contribution 1m partial dirs under
    # ``tier_<name>``, _SUCCESS-gated visibility, a fold manifest for
    # at-least-once stream replay, and the crash-safe compaction/retention
    # rewrite. Parameterized by the tier dir name and the read-side merge.

    def _sketch_contribs(self, name: str) -> list:
        """Complete (``_SUCCESS``-marked) contribution dirs for a sketch
        tier.

        A crash mid-write leaves a partial ``batch=*`` dir with no
        ``_SUCCESS``; reading it would merge half an epoch, and compacting
        it away while marking the epoch folded would LOSE the other half.
        Incomplete dirs are therefore invisible everywhere — the writer
        (batch retry or stream epoch replay) overwrites them in full.
        """
        base = self.store / f"tier_{name}"
        return sorted(p for p in base.glob("batch=*")
                      if (p / "_SUCCESS").exists())

    def _sketch_folded(self, name: str) -> set[str]:
        """Stream-epoch contribution ids already absorbed by a compacting
        rewrite. foreachBatch replay is at-least-once: a replayed epoch
        whose ``batch=s<id>`` dir was folded into ``batch=-1`` and deleted
        would re-add (double-count) its partials unless the sink can see it
        was absorbed — this manifest is that memory, written atomically
        WITH the fold (inside the compact tmp dir, promoted by the same
        rename)."""
        f = self.store / f"tier_{name}" / "_folded.json"
        if not f.exists():
            return set()
        return set(json.loads(f.read_text()).get("folded_stream_epochs", []))

    def _read_sketch_merged(self, name: str, merge_fn, hint: str) -> DataFrame:
        self._recover_compact(name)
        parts = self._sketch_contribs(name)
        base = self.store / f"tier_{name}"
        if not parts:
            raise FileNotFoundError(
                f"no partials under {base} — construct the pipeline with "
                f"{hint} and run() it first"
            )
        raw = self.spark.read.option("basePath", str(base)).parquet(
            *[str(p) for p in parts]
        ).drop("batch")
        return merge_fn(raw)

    def _sketch_fold_manifest(self, name: str) -> dict:
        """Manifest for a sketch-tier rewrite: previously-folded stream
        epochs ∪ the complete stream contributions this rewrite absorbs."""
        absorbed = {p.name.split("=", 1)[1] for p in self._sketch_contribs(name)
                    if p.name.startswith("batch=s")}
        return {"folded_stream_epochs":
                sorted(self._sketch_folded(name) | absorbed)}

    # ----------------------------------------------- percentile (hist) tiers

    def _merge_hist_fn(self, raw: DataFrame) -> DataFrame:
        return merge_hist(raw, [*self.keys, "bin_ts"])

    def _hist_folded(self) -> set[str]:
        return self._sketch_folded("hist_1m")

    def _read_hist_merged(self) -> DataFrame:
        return self._read_sketch_merged(
            "hist_1m", self._merge_hist_fn, "hist_tiers=True")

    def read_hist_quantiles(
        self, tier: str = "1h", ps: tuple[float, ...] = (0.5, 0.95, 0.99)
    ) -> DataFrame:
        """Exact per-bin percentiles at ``tier`` from the stored 1m
        histograms — coarser tiers cascade at read (bin-grain explode +
        re-sum, never a raw-point re-read), the same shape as
        ``read_tier``'s cross-batch partial merge. Exactness argument and
        plan audit: operators/histquantiles.py."""
        merged = self._read_hist_merged()
        if tier != "1m":
            merged = cascade_hist(merged, tier, keys=self.keys)
        return quantiles_from_hist(merged, ps=ps, keys=self.keys)

    def compact_hist(self) -> None:
        """Fold all histogram contributions into one (crash-safe rewrite —
        the same promote/rollback protocol as ``compact``). Absorbed stream
        epochs are recorded in the tier's ``_folded.json`` so an
        at-least-once replay of those epochs skips re-writing them."""
        manifest = self._sketch_fold_manifest("hist_1m")
        self._rewrite_tier("hist_1m", self._read_hist_merged(),
                           manifest=manifest)

    def _apply_sketch_retention(self, name: str, merge_fn, hint: str,
                                age: str, now) -> str:
        """Shared sketch-tier retention: drop 1m bins older than
        ``now - age`` (compacting rewrite, same crash protocol). Coarser
        tiers of every sketch family are derived at read, so the 1m
        horizon IS that family's retention horizon. Returns the ISO
        cutoff applied."""
        import pandas as pd

        cutoff = (pd.Timestamp(now) - pd.Timedelta(age)).isoformat(sep=" ")
        manifest = self._sketch_fold_manifest(name)
        kept = self._read_sketch_merged(name, merge_fn, hint).filter(
            F.col("bin_ts") >= F.lit(cutoff).cast("timestamp")
        )
        # retention is also a fold: every stream contribution dir is
        # absorbed (or expired) by the rewrite, so record them all
        self._rewrite_tier(name, kept, manifest=manifest)
        self._lineage_row({"retention": {name: cutoff}})
        return cutoff

    def apply_hist_retention(self, age: str, now) -> str:
        """Drop 1m histogram bins older than ``now - age``."""
        return self._apply_sketch_retention(
            "hist_1m", self._merge_hist_fn, "hist_tiers=True", age, now)

    def apply_distinct_retention(self, age: str, now) -> str:
        """Drop 1m HLL distinct-sketch bins older than ``now - age``."""
        return self._apply_sketch_retention(
            "distinct_1m", self._merge_distinct_fn, "distinct_tiers=True",
            age, now)

    def apply_topk_retention(self, age: str, now) -> str:
        """Drop 1m Misra-Gries summary bins older than ``now - age``."""
        return self._apply_sketch_retention(
            "topk_1m", self._merge_topk_fn, "topk_tiers=True", age, now)

    # ------------------------------------------------- distinct (HLL) tiers

    def _merge_distinct_fn(self, raw: DataFrame) -> DataFrame:
        from gensor_spark.operators.distinctrollup import merge_distinct

        return merge_distinct(raw, [*self.keys, "bin_ts"])

    def _store_distinct_batch(self, points: DataFrame, sid: int) -> int:
        """Write one contribution's 1m HLL sketch partials."""
        from gensor_spark.operators.distinctrollup import rollup_distinct

        sk = rollup_distinct(points, "1m", of=self.distinct_of,
                             keys=self.keys, lgk=self.distinct_lgk)
        return self._write_counted(
            sk, str(self.store / "tier_distinct_1m" / f"batch={sid}")
        )

    def read_distinct(self, tier: str = "1h") -> DataFrame:
        """Per-bin distinct-count estimates at ``tier`` from the stored 1m
        sketches — coarser tiers cascade at read via register-max union
        (exactly equal to direct aggregation; operators/distinctrollup.py),
        the same bin-grain-only contract as ``read_hist_quantiles``."""
        from gensor_spark.operators.distinctrollup import (
            cascade_distinct,
            finalize_distinct,
        )

        merged = self._read_sketch_merged(
            "distinct_1m", self._merge_distinct_fn, "distinct_tiers=True")
        if tier != "1m":
            merged = cascade_distinct(merged, tier, keys=self.keys)
        return finalize_distinct(merged)

    def compact_distinct(self) -> None:
        """Fold all distinct-sketch contributions into one (the hist
        crash-safe rewrite protocol, fold manifest included)."""
        self._rewrite_tier(
            "distinct_1m",
            self._read_sketch_merged(
                "distinct_1m", self._merge_distinct_fn, "distinct_tiers=True"),
            manifest=self._sketch_fold_manifest("distinct_1m"),
        )

    # ------------------------------------------- top-k (Misra-Gries) tiers

    def _merge_topk_fn(self, raw: DataFrame) -> DataFrame:
        from gensor_spark.operators.topkrollup import merge_topk

        return merge_topk(raw, [*self.keys, "bin_ts"], k=self.topk_k)

    def _store_topk_batch(self, points: DataFrame, sid: int) -> int:
        """Write one contribution's 1m Misra-Gries top-k summaries."""
        from gensor_spark.operators.topkrollup import rollup_topk

        sk = rollup_topk(points, "1m", of=self.topk_of,
                         keys=self.keys, k=self.topk_k)
        return self._write_counted(
            sk, str(self.store / "tier_topk_1m" / f"batch={sid}")
        )

    def read_topk(self, tier: str = "1h", top: int | None = None) -> DataFrame:
        """Per-bin ranked heavy hitters at ``tier`` from the stored 1m
        summaries — coarser tiers cascade at read via the MG merge
        (certificate bounds preserved; operators/topkrollup.py), the same
        bin-grain-only contract as ``read_distinct``."""
        from gensor_spark.operators.topkrollup import (
            cascade_topk,
            finalize_topk,
        )

        merged = self._read_sketch_merged(
            "topk_1m", self._merge_topk_fn, "topk_tiers=True")
        if tier != "1m":
            merged = cascade_topk(merged, tier, keys=self.keys, k=self.topk_k)
        return finalize_topk(merged, top=top)

    def compact_topk(self) -> None:
        """Fold all top-k summary contributions into one (the hist
        crash-safe rewrite protocol, fold manifest included)."""
        self._rewrite_tier(
            "topk_1m",
            self._read_sketch_merged(
                "topk_1m", self._merge_topk_fn, "topk_tiers=True"),
            manifest=self._sketch_fold_manifest("topk_1m"),
        )

    # ------------------------------------------- Count-Min frequency tiers

    def _merge_cms_fn(self, raw: DataFrame) -> DataFrame:
        from gensor_spark.operators.cmsketch import merge_cms

        return merge_cms(raw, [*self.keys, "bin_ts"])

    def _store_cms_batch(self, points: DataFrame, sid: int) -> int:
        """Write one contribution's 1m Count-Min counter partials."""
        from gensor_spark.operators.cmsketch import rollup_cms

        sk = rollup_cms(points, "1m", of=self.cms_of, keys=self.keys,
                        depth=self.cms_depth, width=self.cms_width)
        return self._write_counted(
            sk, str(self.store / "tier_cms_1m" / f"batch={sid}")
        )

    def read_cms(self, tier: str = "1h", items: DataFrame | None = None,
                 item_col: str = "item") -> DataFrame:
        """Per-bin Count-Min state at ``tier`` from the stored 1m counters
        — coarser tiers cascade at read via counter sums (BIT-EXACT vs a
        direct build; operators/cmsketch.py), the same bin-grain-only
        contract as ``read_topk``. With ``items`` (a one-column DataFrame
        whose type matches ``cms_of``), returns point-query estimates
        ``keys..., bin_ts, item, est`` instead of raw counters."""
        from gensor_spark.operators.cmsketch import cascade_cms, estimate_cms

        merged = self._read_sketch_merged(
            "cms_1m", self._merge_cms_fn, "cms_tiers=True")
        if tier != "1m":
            merged = cascade_cms(merged, tier, keys=self.keys)
        if items is None:
            return merged
        return estimate_cms(merged, items, item_col=item_col,
                            keys=self.keys, depth=self.cms_depth,
                            width=self.cms_width)

    def compact_cms(self) -> None:
        """Fold all Count-Min contributions into one (the hist crash-safe
        rewrite protocol, fold manifest included). Counters are sums, so
        the folded state is bit-identical to the unfolded union."""
        self._rewrite_tier(
            "cms_1m",
            self._read_sketch_merged(
                "cms_1m", self._merge_cms_fn, "cms_tiers=True"),
            manifest=self._sketch_fold_manifest("cms_1m"),
        )

    def apply_cms_retention(self, age: str, now) -> str:
        """Drop 1m Count-Min counter bins older than ``now - age``."""
        return self._apply_sketch_retention(
            "cms_1m", self._merge_cms_fn, "cms_tiers=True", age, now)

    # ------------------------------------------------------------------- read

    def read_tier(self, tier: str, finalize: bool = True,
                  as_of_batch: int | None = None) -> DataFrame:
        """Merged view of a tier across all batch contributions.

        ``as_of_batch=b`` TIME-TRAVELS: merge only the contributions of
        batches ``<= b`` — the tier exactly as it stood after batch ``b``
        committed (reproduce a historical training run, bisect a data
        regression). Requires the per-batch layout: a compacted tier
        (``batch=-1``) has folded its history away, so as-of reads raise
        there instead of silently answering from the folded state.
        Parquet backend (Iceberg's own snapshot time travel covers it
        there).
        """
        if self.backend == "iceberg":
            if as_of_batch is not None:
                raise ValueError(
                    "as_of_batch is parquet-backend only — use Iceberg "
                    "snapshot time travel (VERSION AS OF) instead")
            df = self.iceberg.read(tier)
        else:
            self._recover_compact(tier)
            df = self._bucketed_scan(tier) if as_of_batch is None else None
            if df is None:
                base = self.store / f"tier_{tier}"
                parts = sorted(base.glob("batch=*"))
                if as_of_batch is not None:
                    ids = [int(p.name.split("=", 1)[1]) for p in parts]
                    if -1 in ids:
                        raise ValueError(
                            f"tier {tier!r} is compacted (batch=-1): its "
                            "per-batch history is folded — as-of reads need "
                            "the uncompacted layout")
                    parts = [p for p, i in zip(parts, ids)
                             if i <= as_of_batch]
                if not parts:
                    raise FileNotFoundError(
                        f"tier {tier!r} has no data under {base} — run() it "
                        "first (retention/compaction skip absent tiers)"
                    )
                df = self.spark.read.option("basePath", str(base)).parquet(
                    *[str(p) for p in parts]
                ).drop("batch")
        if self.narrow_partials:
            merged = widen_partials(
                _merge_partials_narrow(df, [*self.keys, "bin"]),
                tier, self.tick_seconds,
            )
        else:
            merged = _merge_partials(df, [*self.keys, "bin_ts"])
        return finalize_tier(merged) if finalize else merged

    def _read_merged_storage(self, tier: str) -> DataFrame:
        """Merged tier in its STORAGE schema (narrow stays narrow) — the
        input for compaction/retention rewrites, which must not change the
        physical schema of the tier directory."""
        self._recover_compact(tier)
        df = self._bucketed_scan(tier)
        if df is None:
            base = self.store / f"tier_{tier}"
            parts = sorted(base.glob("batch=*"))
            df = self.spark.read.option("basePath", str(base)).parquet(
                *[str(p) for p in parts]
            ).drop("batch")
        if self.narrow_partials:
            return _merge_partials_narrow(df, [*self.keys, "bin"])
        return _merge_partials(df, [*self.keys, "bin_ts"])

    def _compact_paths(self, tier: str) -> tuple[Path, Path, Path]:
        base = self.store / f"tier_{tier}"
        return base, Path(f"{base}_compact_tmp"), Path(f"{base}_old")

    def _recover_compact(self, tier: str) -> None:
        """Repair any state a crash mid-``compact`` can leave behind.

        compact's step order is: (1) write tmp, (2) rename final→old,
        (3) rename tmp→final, (4) delete old. A crash after any single step
        leaves either final intact (→ drop leftovers) or final missing with
        a complete tmp and the old copy still on disk (→ promote tmp,
        falling back to restoring old). No window loses the tier — the old
        copy is only deleted after the compacted one is in place.
        """
        final, tmp, old = self._compact_paths(tier)
        if final.exists():
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
            return
        if tmp.exists() and (tmp / "batch=-1" / "_SUCCESS").exists():
            os.replace(tmp, final)  # crash was between steps 2 and 3
            shutil.rmtree(old, ignore_errors=True)
        elif old.exists():
            os.replace(old, final)  # tmp incomplete — roll back
            shutil.rmtree(tmp, ignore_errors=True)

    def _rewrite_tier(self, tier: str, partials: DataFrame,
                      manifest: dict | None = None) -> None:
        """Atomically replace a tier's contents (parquet backend).

        Crash-safe: the current tier is renamed aside, not deleted, until the
        new copy is promoted — see ``_recover_compact`` for the repair of
        every intermediate state. ``manifest`` (the hist tier's folded
        stream epochs) is written INSIDE tmp before the promote rename, so
        the fold and its memory become visible in the same atomic step — no
        window where contributions are folded but the manifest is missing.
        """
        final, tmp, old = self._compact_paths(tier)
        shutil.rmtree(tmp, ignore_errors=True)
        partials.write.mode("overwrite").parquet(str(tmp / "batch=-1"))  # step 1
        if manifest is not None:
            (tmp / "_folded.json").write_text(json.dumps(manifest))
        # a plain rewrite replaces any bucketed layout: retire the catalog
        # entry BEFORE promoting, or a reader could treat the new plain
        # files as bucket files (Spark aborts on unsuffixed bucket files —
        # a crash, not wrong data, but still a broken store)
        self._drop_bucket_table(tier)
        os.replace(final, old)  # step 2: set aside, never rmtree the live tier
        os.replace(tmp, final)  # step 3: promote
        shutil.rmtree(old)  # step 4: cleanup

    def _drop_bucket_table(self, tier: str) -> None:
        try:
            self.spark.sql(
                f"DROP TABLE IF EXISTS {self._bucket_table(tier)}")
        except Exception:
            pass  # catalog unavailable → there is no entry to go stale

    # --------------------------------------------------- bucketed compaction

    def _bucket_table(self, tier: str) -> str:
        """Deterministic catalog name for this store's bucketed tier (the
        store path is the identity — two stores in one session never
        collide)."""
        import hashlib

        h = hashlib.md5(str(self.store.resolve()).encode()).hexdigest()[:10]
        return f"gs_bkt_{h}_{tier.replace('-', '_')}"

    def _rewrite_tier_bucketed(self, tier: str, partials: DataFrame,
                               n_buckets: int) -> None:
        """The ``_rewrite_tier`` protocol with a bucketed writer: steps 1-4
        identical (tmp write → set-aside → promote → cleanup), plus a final
        catalog re-point. Bucket file names carry their bucket id, so the
        layout survives the directory rename; only the catalog's location
        string goes stale between promote and re-register — and the read
        side treats the catalog as advisory (``_bucketed_scan``), so every
        crash window degrades to the plain path scan, never to wrong data.
        """
        from gensor_spark.plans.bucketing import write_bucketed

        final, tmp, old = self._compact_paths(tier)
        shutil.rmtree(tmp, ignore_errors=True)
        tbl = self._bucket_table(tier)
        # drop any previous entry BEFORE the write: an overwrite-saveAsTable
        # onto an existing external table registered at the LIVE location
        # must never get a chance to touch that location (external-table
        # drops are metadata-only; the live files stay)
        self._drop_bucket_table(tier)
        write_bucketed(partials, tbl, n_buckets, bucket_cols=self.keys,
                       sort_cols=("bin_ts",), path=str(tmp / "batch=-1"))
        os.replace(final, old)
        os.replace(tmp, final)
        self.spark.sql(
            f"ALTER TABLE {tbl} SET LOCATION '{final / 'batch=-1'}'")
        shutil.rmtree(old)

    def _bucketed_scan(self, tier: str) -> DataFrame | None:
        """The verified bucketed fast path: the catalog table must exist,
        the tier must be fully folded (only ``batch=-1``), and the
        registered location must name the LIVE tier directory. Any
        mismatch → None (callers fall back to the plain path scan)."""
        tbl = self._bucket_table(tier)
        try:
            if not self.spark.catalog.tableExists(tbl):
                return None
        except Exception:
            return None
        base = self.store / f"tier_{tier}"
        parts = sorted(p.name for p in base.glob("batch=*"))
        if parts != ["batch=-1"]:
            return None
        loc = (
            self.spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
            .filter(F.col("col_name") == "Location")
            .first()
        )
        want = (base / "batch=-1").resolve()
        if loc is None or Path(
                loc["data_type"].replace("file:", "")).resolve() != want:
            return None
        return self.spark.table(tbl)

    def compact(self, tier: str, zorder: bool = False,
                zorder_files: int = 32, bucket: int | None = None) -> None:
        """Fold all contributions into one (Iceberg: rewrite_data_files).

        ``zorder=True`` (parquet backend) rewrites the tier clustered on
        the Morton interleave of (series, bin_ts) — ``plans/zorder.py`` —
        so subsequent scans prune files/row-groups on EITHER the series or
        the time predicate (the two read patterns a tier table serves; the
        pruning is measured in tests/test_zorder.py). The rewrite shuffles
        once more than the plain fold (the rank-scale sort **is** the
        layout); correctness is untouched — ``read_tier`` merges partials
        associatively regardless of row order. On Iceberg the equivalent
        is ``rewrite_data_files`` with a zorder sort order; out of scope
        while the runtime jar is availability-gated.

        ``bucket=N`` (parquet backend, exclusive with zorder) folds into a
        BUCKETED catalog table on the series keys (plans/bucketing.py):
        every subsequent ``read_tier`` merge — a groupBy on the keys+bin
        SUPERSET of the bucket columns — plans with ZERO Exchange, turning
        the store's dominant recurring read cost into this one write-side
        shuffle. The catalog entry is advisory only: reads verify the
        registered location still names the live tier directory and fall
        back to the plain path scan on any mismatch (crash between promote
        and re-register, bucketing disabled, foreign session), so the
        rename-promotion crash protocol is unchanged.
        """
        if self.backend == "iceberg":
            if zorder or bucket:
                raise ValueError(
                    "zorder/bucket compaction requires the parquet backend "
                    "(Iceberg: use rewrite_data_files with a zorder sort "
                    "order via the catalog)")
            self.iceberg.compact(tier)  # rewrite_data_files, atomic snapshot
            return
        if bucket is not None:
            if zorder:
                raise ValueError("bucket and zorder are exclusive layouts")
            if self.narrow_partials:
                raise ValueError(
                    "bucket compaction needs the wide partial schema")
            self._rewrite_tier_bucketed(
                tier, self._read_merged_storage(tier), bucket)
            return
        merged = self._read_merged_storage(tier)
        if zorder:
            from gensor_spark.plans.zorder import rank_scale, zvalue

            sid = F.xxhash64(*[F.col(k) for k in self.keys])
            z = merged.withColumn("__sid", sid).withColumn(
                "__ts", F.col("bin_ts").cast("long"))
            z = rank_scale(z, "__sid", 16, "__zs0")
            z = rank_scale(z, "__ts", 16, "__zs1")
            merged = (
                z.withColumn("__z", zvalue(["__zs0", "__zs1"], 16))
                .repartitionByRange(zorder_files, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__sid", "__ts", "__zs0", "__zs1", "__z")
            )
        self._rewrite_tier(tier, merged)

    def refresh_calendar(self, unit: str = "month",
                         from_tier: str = "1d") -> int:
        """Materialize (or re-fold) a CALENDAR tier from a stored fixed
        tier: ``cascade_calendar`` over the merged ``from_tier`` partials,
        written as the calendar tier's single ``batch=-1`` contribution —
        a continuous aggregate at calendar grain, refreshed from the ~30×
        smaller 1d state, never from raw points. Re-run after new batches
        land (the fold is a full re-cascade of bin-grain rows — cheap).
        ``read_tier(unit)`` then serves it like any other tier. The
        nesting rule is ENFORCED (cascade_calendar's ``finer_unit``
        check): month→week, week→anything, or a fixed tier that straddles
        day boundaries all raise instead of folding wrong. Returns the
        row count.
        """
        from gensor_spark.operators.rollup import CALENDAR_UNITS, cascade_calendar

        if unit not in CALENDAR_UNITS:
            raise ValueError(f"unit must be one of {CALENDAR_UNITS}, got {unit!r}")
        if self.narrow_partials:
            raise ValueError("refresh_calendar needs the wide partial schema")
        if self.backend != "parquet":
            raise ValueError("refresh_calendar requires the parquet backend")
        cal = cascade_calendar(self._read_merged_storage(from_tier), unit,
                               keys=self.keys, finer_unit=from_tier)
        final, tmp, old = self._compact_paths(unit)
        if final.exists():
            self._rewrite_tier(unit, cal)
        else:
            shutil.rmtree(tmp, ignore_errors=True)
            cal.write.mode("overwrite").parquet(str(tmp / "batch=-1"))
            os.replace(tmp, final)
        n = self.spark.read.parquet(str(final / "batch=-1")).count()
        self._lineage_row({"calendar_refresh": {"unit": unit,
                                                "from": from_tier, "rows": n}})
        return n

    def apply_retention(self, policy: dict[str, str], now) -> dict[str, str]:
        """Enforce per-tier retention windows: the 'retention' in retention
        tiers. ``policy`` maps tier → max age (any pandas Timedelta string,
        e.g. ``{'1m': '7 days', '1h': '90 days'}``); bins older than
        ``now - age`` are dropped from that tier, tiers absent from the
        policy keep everything — the classic downsample-and-expire layout
        (raw/fine tiers short-lived, coarse tiers long-lived).

        ``now`` is explicit (a timestamp / ISO string), never wall-clock —
        retention runs must be replayable. Parquet backend: crash-safe
        filtered rewrite (doubles as compaction); Iceberg backend: a real
        ``DELETE FROM ... WHERE bin_ts < cutoff`` — an Iceberg
        metadata/partition-level delete, one atomic snapshot.

        Returns tier → ISO cutoff actually applied.
        """
        import pandas as pd

        applied: dict[str, str] = {}
        for tier, age in policy.items():
            if tier not in TIERS:
                raise ValueError(f"unknown tier {tier!r}")
            cutoff = (pd.Timestamp(now) - pd.Timedelta(age)).isoformat(sep=" ")
            # a tier never written yet (retention scheduled before first
            # ingest) is a no-op, not an abort-mid-policy crash — both
            # backends (iceberg tier tables are created lazily on the first
            # merge_batch, so DELETE on them would raise)
            if self.backend == "parquet":
                self._recover_compact(tier)  # promote crash leftovers first
                if not any((self.store / f"tier_{tier}").glob("batch=*")):
                    continue
            elif not self.spark.catalog.tableExists(self.iceberg.table(tier)):
                continue
            if self.backend == "iceberg":
                self.spark.sql(
                    f"DELETE FROM {self.iceberg.table(tier)} "
                    f"WHERE bin_ts < TIMESTAMP '{cutoff}'"
                )
            else:
                merged = self._read_merged_storage(tier)
                if self.narrow_partials:
                    # bin_ts = epoch0 + bin·step ≥ cutoff ⇔ bin ≥ ceil(…)
                    from gensor_spark.operators.rollup import TIER_SECONDS

                    step_us = TIER_SECONDS[tier] * 1_000_000
                    cut_us = int(pd.Timestamp(cutoff).value // 1000)
                    min_bin = -((1_704_067_200_000_000 - cut_us) // step_us)
                    kept = merged.filter(F.col("bin") >= min_bin)
                else:
                    kept = merged.filter(
                        F.col("bin_ts") >= F.lit(cutoff).cast("timestamp")
                    )
                self._rewrite_tier(tier, kept)
            applied[tier] = cutoff
        if applied:
            self._lineage_row({"retention": applied})
        return applied

    def reset(self) -> None:
        # With the iceberg backend the tier rows live in the warehouse, not
        # under store_dir — wiping only the ledger/lineage would leave stale
        # tier data that a rerun MERGEs onto. Drop the tables too.
        if self.backend == "iceberg":
            for tier in TIERS:
                self.iceberg.drop(tier)
        shutil.rmtree(self.store, ignore_errors=True)
        self.store.mkdir(parents=True, exist_ok=True)


def read_range(
    pipeline: "TierPipeline",
    start,
    end,
    max_points: int | None = None,
    finalize: bool = True,
):
    """Resolution-aware range read: serve ``[start, end)`` from the
    COARSEST stored tier that still yields at least ``max_points`` bins per
    series — the router a dashboard zoom uses (wide span → 1d tier, tight
    span → 1m), so a year-long query reads ~365 rows per series instead of
    half a million, and the time-range predicate prunes the tier scan.

    ``max_points=None`` picks the finest stored tier (full resolution).
    The choice is metadata arithmetic (span / tier step — no data scan);
    absent tiers are skipped; falls back to the finest stored tier when
    even it cannot satisfy the budget (short span). Returns the filtered
    tier frame plus the chosen tier name.
    """
    import pandas as pd

    from gensor_spark.operators.rollup import TIER_SECONDS

    # nominal bin widths for stored calendar tiers (refresh_calendar) —
    # only used for the budget arithmetic, never for binning
    cal_seconds = {"week": 604_800, "month": 2_629_746,
                   "quarter": 7_889_238, "year": 31_556_952}

    s = pd.Timestamp(start)
    e = pd.Timestamp(end)
    if e <= s:
        raise ValueError(f"empty range: {start!r} .. {end!r}")
    span = (e - s).total_seconds()
    widths = dict(TIER_SECONDS, **cal_seconds)
    ladder = [*TIERS, *cal_seconds]  # fine -> coarse
    stored = [t for t in ladder
              if (pipeline.store / f"tier_{t}").exists()]
    if not stored:
        raise FileNotFoundError(f"no tiers stored under {pipeline.store}")
    chosen = stored[0]
    if max_points is not None:
        # coarsest tier whose bin count over the span still >= max_points;
        # the ladder is ordered fine->coarse, so walk from the coarse end
        for t in reversed(stored):
            if span / widths[t] >= max_points:
                chosen = t
                break
    df = pipeline.read_tier(chosen, finalize=finalize)
    out = df.filter(
        (F.col("bin_ts") >= F.lit(str(s)).cast("timestamp"))
        & (F.col("bin_ts") < F.lit(str(e)).cast("timestamp"))
    )
    return out, chosen
