"""Multimodal columns: opaque binary payloads + typed metadata, Arrow UDF plumbing.

Training-data pipelines carry images/audio/video as ``binary`` columns with a
typed metadata struct; decode/feature-extract runs as Arrow-batched pandas
UDFs (``mapInPandas``) so the only JVM↔Python crossing is a columnar batch
transfer. This module makes that plumbing real and tested:

- a canonical ``media`` schema and a deterministic builder that derives a
  media table from the ``documents`` testdata (payload = UTF-8 bytes of the
  text, kind round-robins image/audio/video) — no external data;
- ``extract_features``: the ``mapInPandas`` stage. Real decoders (PIL,
  torchaudio, av) are NOT present in this container, so the decode step is
  **stubbed**: ``decoder='fake'`` (default) computes deterministic features
  from the raw bytes with numpy (length / first / last / byte-mean /
  rolling checksum), while ``decoder='real'`` raises ``NotImplementedError``
  at the point a real codec would be invoked. Schema, batch shape,
  partitioning, and the UDF signature are exactly what the real
  implementation would use — swap the inner function, keep the plan.

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
