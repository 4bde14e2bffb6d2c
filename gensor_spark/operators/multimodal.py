"""Multimodal columns: opaque binary payloads + typed metadata, Arrow UDF plumbing.

Training-data pipelines carry images/audio/video as ``binary`` columns with a
typed metadata struct; decode/feature-extract runs as Arrow-batched pandas
UDFs (``mapInPandas``) so the only JVM↔Python crossing is a columnar batch
transfer. This module makes that plumbing real and tested:

- a canonical ``media`` schema and a deterministic builder that derives a
  media table from the ``documents`` testdata (payload = UTF-8 bytes of the
  text, kind round-robins image/audio/video) — no external data;
- ``extract_features`` (1→1), ``resize_images`` (1→1 with re-encoded
  payload), ``sample_frames`` (1→N frame explosion): the three
  ``mapInPandas`` stage shapes a media pipeline needs. Real decoders (PIL,
  torchaudio, av) are NOT present in this container, so the decode step is
  **stubbed**: ``decoder='fake'`` (default) computes deterministic
  byte-level stand-ins with numpy, while ``decoder='real'`` raises
  ``NotImplementedError`` at the point a real codec would be invoked.
  Schema, batch shape, partitioning, and the UDF signatures are exactly
  what the real implementation would use — swap the inner function, keep
  the plan.

Scale notes: ``mapInPandas`` streams Arrow batches, so payload bytes never
materialize on the driver; feature extraction is embarrassingly parallel
over input partitions (no shuffle). Partition sizing is governed by payload
bytes, not row count — repartition by target bytes before this stage when
payloads are large (spark.sql.files.maxPartitionBytes governs the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), True),      # opaque encoded bytes
    StructField("width", IntegerType(), True),       # typed metadata (kind-dependent)
    StructField("height", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("first_byte", IntegerType(), True),
    StructField("last_byte", IntegerType(), True),
    StructField("byte_mean", DoubleType(), True),
    StructField("checksum", LongType(), False),
])

_KINDS = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents`` (no external data)."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % len(_KINDS)).cast("int") + 1,
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(kind == "image", F.lit(640)).cast("int").alias("width"),
        F.when(kind == "image", F.lit(480)).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind == "video", F.lit(300)).cast("int").alias("n_frames"),
    )


def _fake_decode(payload: bytes | None) -> dict:
    """Deterministic stand-in for a real decoder: pure-numpy byte features."""
    import numpy as np

    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "first_byte": None, "last_byte": None,
                "byte_mean": None, "checksum": 0}
    arr = np.frombuffer(payload, dtype=np.uint8)
    # rolling polynomial checksum, the cheap stand-in for a content hash
    weights = np.arange(1, len(arr) + 1, dtype=np.int64)
    checksum = int((arr.astype(np.int64) * weights).sum() % (1 << 31))
    return {
        "n_bytes": int(arr.size),
        "first_byte": int(arr[0]),
        "last_byte": int(arr[-1]),
        "byte_mean": float(arr.mean()),
        "checksum": checksum,
    }


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``decoder='real'`` marks where PIL/torchaudio/av would run — raises
    ``NotImplementedError`` in this container (libs not installed). The
    'fake' decoder exercises the identical plumbing: Arrow batch in, pandas
    DataFrame out, one output row per input row, no driver materialization.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image/audio/video decoding needs PIL/torchaudio/av; "
                    "not available in this container — use decoder='fake'"
                )
            feats = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), True),       # re-encoded bytes
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def resize_images(media: DataFrame, width: int, height: int,
                  decoder: str = "fake") -> DataFrame:
    """Resize the image rows to ``width × height`` — the decode→transform→
    re-encode Arrow stage (1 row in, 1 row out; non-image rows filtered
    upstream of the crossing, JVM-side).

    ``decoder='fake'``: the "resized" payload is a deterministic byte
    resampling (numpy linear index sampling of the source bytes to
    ``width·height`` length) — content-derived, size-correct, and stable,
    so downstream stages (storage sizing, checksum joins) behave exactly as
    with a real codec. ``decoder='real'`` raises where PIL would run.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resize needs PIL; not available in this "
                    "container — use decoder='fake'"
                )
            payloads = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    payloads.append(b"")
                    continue
                src = np.frombuffer(p, dtype=np.uint8)
                idx = np.linspace(0, len(src) - 1, n_out).astype(np.int64)
                payloads.append(src[idx].tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "payload": payloads,
                "width": np.int32(width),
                "height": np.int32(height),
            })

    images = media.filter(F.col("kind") == "image")
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


RESAMPLED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("sample_rate", IntegerType(), True),
])


def resample_audio(media: DataFrame, target_rate: int,
                   decoder: str = "fake") -> DataFrame:
    """Resample the audio rows to ``target_rate`` Hz — the audio analogue
    of ``resize_images`` (decode → rate-convert → re-encode, 1→1).

    ``decoder='fake'``: payload length scales by ``target/source`` via
    deterministic linear index resampling, so downstream byte budgeting
    behaves like a real converter; ``decoder='real'`` raises where
    torchaudio/soxr would run.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real audio resampling needs torchaudio/soxr; not "
                    "available in this container — use decoder='fake'"
                )
            payloads = []
            for p, sr in zip(pdf["payload"], pdf["sample_rate"]):
                if p is None or len(p) == 0 or sr is None or sr <= 0:
                    payloads.append(b"")
                    continue
                src = np.frombuffer(p, dtype=np.uint8)
                n_out = max(1, int(round(len(src) * target_rate / int(sr))))
                idx = np.linspace(0, len(src) - 1, n_out).astype(np.int64)
                payloads.append(src[idx].tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "payload": payloads,
                "sample_rate": np.int32(target_rate),
            })

    audio = media.filter(F.col("kind") == "audio")
    return audio.mapInPandas(run, schema=RESAMPLED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(media: DataFrame, every_n: int = 30,
                  decoder: str = "fake") -> DataFrame:
    """Sample every ``every_n``-th frame from the video rows — the 1-to-N
    Arrow stage: one input row yields ``ceil(n_frames / every_n)`` frame
    rows, streamed per batch (the exploded frames never gather on the
    driver; output partitioning inherits the input's, so a hot long video
    stays one task — repartition upstream by ``media_id`` salt if a single
    video's frames exceed a task's budget).

    ``decoder='fake'``: frame ``i`` is a deterministic byte slice of the
    payload (stride = n_frames), so frame count/order/identity are testable;
    ``decoder='real'`` raises where `av`-style demuxing would run.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    if every_n < 1:
        # fail at the driver with a clear message, not as a buried
        # range()-step ValueError inside a task
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real frame demuxing needs av/ffmpeg; not available in "
                    "this container — use decoder='fake'"
                )
            ids, idxs, frames = [], [], []
            for mid, p, nf in zip(pdf["media_id"], pdf["payload"],
                                  pdf["n_frames"]):
                if p is None or len(p) == 0 or nf is None or nf <= 0:
                    continue
                src = np.frombuffer(p, dtype=np.uint8)
                nf = int(nf)
                for i in range(0, nf, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(src[i::nf].tobytes())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": pd.Series(frames, dtype=object),
            })

    videos = media.filter(F.col("kind") == "video")
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)
