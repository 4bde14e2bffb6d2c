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

import importlib.util
from collections.abc import Iterator

import pandas as pd

#: availability probes (VERDICT r2 #6): real decoders are gated like the
#: reference gates sklearn — present → used, absent → a clear error at the
#: call site. PIL backs image decode/resize, av backs video demux; WAV audio
#: needs only the stdlib ``wave`` module and is therefore ALWAYS real-capable.
HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_AV = importlib.util.find_spec("av") is not None


def _require(flag: bool, lib: str, what: str) -> None:
    if not flag:
        raise NotImplementedError(
            f"real {what} needs {lib}, which is not installed in this "
            f"environment — install it or use decoder='fake'"
        )

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


def _linear_idx(n_src: int, n_out: int):
    """Exact-integer linear sample indices: ``idx_k = k*(n_src-1)//(n_out-1)``.

    Pure int64 arithmetic (no float linspace) so an independent SQL oracle
    can reproduce the sampled bytes bit-for-bit — float truncation at the
    floor boundary is engine-dependent; integer division is not.
    """
    import numpy as np

    if n_out <= 1:
        return np.zeros(max(n_out, 0), dtype=np.int64)
    k = np.arange(n_out, dtype=np.int64)
    return (k * (n_src - 1)) // (n_out - 1)


def _decode_samples(payload: bytes, kind: str):
    """Real decode of an encoded payload to its sample array (1-D numpy).

    image → PIL decode to flattened uint8 pixels (gated on PIL);
    audio → stdlib ``wave`` parse of a WAV container to int16 PCM samples
    (no third-party lib — always available); video → av demux (gated).
    """
    import io

    import numpy as np

    if kind == "image":
        _require(HAS_PIL, "Pillow (PIL)", "image decoding")
        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        return np.asarray(img.convert("L"), dtype=np.uint8).ravel()
    if kind == "audio":
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"only 16-bit PCM WAV supported, got width {w.getsampwidth()}"
                )
            frames = w.readframes(w.getnframes())
        return np.frombuffer(frames, dtype=np.int16)
    if kind == "video":
        _require(HAS_AV, "PyAV (av)", "video decoding")
        import av  # pragma: no cover — exercised only where av is installed

        buf = io.BytesIO(payload)
        with av.open(buf) as container:
            frames = [np.asarray(f.to_ndarray(format="gray"), dtype=np.uint8)
                      for f in container.decode(video=0)]
        return np.concatenate([f.ravel() for f in frames])
    raise ValueError(f"unknown media kind: {kind!r}")


def _sample_stats(arr) -> dict:
    """The FEATURE_SCHEMA stats over any 1-D integer sample array — shared
    by the fake path (encoded bytes) and the real path (decoded samples)."""
    import numpy as np

    if arr is None or arr.size == 0:
        return {"n_bytes": 0, "first_byte": None, "last_byte": None,
                "byte_mean": None, "checksum": 0}
    weights = np.arange(1, arr.size + 1, dtype=np.int64)
    checksum = int((arr.astype(np.int64) * weights).sum() % (1 << 31))
    return {
        "n_bytes": int(arr.size),
        "first_byte": int(arr[0]),
        "last_byte": int(arr[-1]),
        "byte_mean": float(arr.mean()),
        "checksum": checksum,
    }


def extract_features(media: DataFrame, decoder: str = "fake",
                     passthrough: tuple = ()) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``decoder='fake'`` (default) computes the stats over the *encoded* bytes
    — deterministic, oracle-reproducible, no codec. ``decoder='real'``
    decodes first (PIL for images, stdlib ``wave`` for WAV audio, av for
    video — availability-gated per kind) and computes the same stats over
    the decoded samples. Identical plumbing either way: Arrow batch in,
    pandas DataFrame out, one output row per input row, no driver
    materialization.

    ``passthrough`` names extra input columns copied verbatim onto the
    output rows (appended after the feature columns, input types kept).
    This is what lets ONE feature pass score a union of pipeline stages
    (original ∪ resized ∪ resampled ∪ frames) instead of one Python
    crossing per stage — at cluster scale the crossing count is the cost
    (per-stage worker spin-up + Arrow serialization), so a tagged union
    through a single kernel is the web-scale shape.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    out_schema = StructType(
        FEATURE_SCHEMA.fields
        + [media.schema[c] for c in passthrough]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                feats = [
                    _sample_stats(
                        None if p is None or len(p) == 0
                        else _decode_samples(bytes(p), k))
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
                feats = [
                    _sample_stats(
                        None if p is None or len(p) == 0
                        else np.frombuffer(bytes(p), dtype=np.uint8))
                    for p in pdf["payload"]
                ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            for c in passthrough:
                out[c] = pdf[c].values
            yield out

    return media.mapInPandas(run, schema=out_schema)


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
    resampling (exact-integer linear index sampling of the source bytes to
    ``width·height`` length: ``idx_k = k·(len-1) // (n_out-1)``) —
    content-derived, size-correct, and stable, so downstream stages
    (storage sizing, checksum joins) behave exactly as with a real codec.
    Integer (not float linspace) indexing so the DuckDB oracle can
    reproduce the bytes exactly. ``decoder='real'`` runs PIL's resize +
    PNG re-encode when Pillow is installed (availability-gated, raises a
    clear NotImplementedError otherwise).
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    n_out = width * height

    def _real_resize(p: bytes) -> bytes:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(p)).resize((width, height))
        out = io.BytesIO()
        img.save(out, format="PNG")
        return out.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                _require(HAS_PIL, "Pillow (PIL)", "image resize")
                yield pd.DataFrame({
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": [b"" if p is None or len(p) == 0
                                else _real_resize(bytes(p))
                                for p in pdf["payload"]],
                    "width": np.int32(width),
                    "height": np.int32(height),
                })
                continue
            payloads = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    payloads.append(b"")
                    continue
                src = np.frombuffer(p, dtype=np.uint8)
                idx = _linear_idx(len(src), n_out)
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

    ``decoder='fake'``: payload length scales by ``target/source``
    (``n_out = max(1, len·target // source)``, exact integer) via the same
    integer linear index resampling as ``resize_images``, so downstream
    byte budgeting behaves like a real converter and a SQL oracle can
    reproduce the bytes. ``decoder='real'`` is a REAL rate converter with
    no third-party dependency: stdlib ``wave`` parse → linear-interpolation
    resample (numpy) → 16-bit PCM WAV re-encode. (A production deployment
    would swap the interpolation for soxr/torchaudio's polyphase filter —
    same stage shape.)
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")

    def _real_resample(p: bytes) -> bytes:
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(p), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM WAV supported")
            n_ch, src_rate = w.getnchannels(), w.getframerate()
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        frames = pcm.reshape(-1, n_ch).astype(np.float64)
        n_in = frames.shape[0]
        n_out = max(1, (n_in * target_rate) // src_rate)
        t_out = np.linspace(0.0, n_in - 1, n_out)
        res = np.stack(
            [np.interp(t_out, np.arange(n_in), frames[:, c])
             for c in range(n_ch)], axis=1)
        out = io.BytesIO()
        with wave.open(out, "wb") as w:
            w.setnchannels(n_ch)
            w.setsampwidth(2)
            w.setframerate(target_rate)
            w.writeframes(np.clip(np.rint(res), -32768, 32767)
                          .astype(np.int16).tobytes())
        return out.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                yield pd.DataFrame({
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": [b"" if p is None or len(p) == 0
                                else _real_resample(bytes(p))
                                for p in pdf["payload"]],
                    "sample_rate": np.int32(target_rate),
                })
                continue
            payloads = []
            for p, sr in zip(pdf["payload"], pdf["sample_rate"]):
                if p is None or len(p) == 0 or sr is None or sr <= 0:
                    payloads.append(b"")
                    continue
                src = np.frombuffer(p, dtype=np.uint8)
                n_out = max(1, (len(src) * target_rate) // int(sr))
                idx = _linear_idx(len(src), n_out)
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
    ``decoder='real'`` demuxes with PyAV when installed (availability-gated)
    and emits every ``every_n``-th decoded frame as raw grayscale bytes.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    if every_n < 1:
        # fail at the driver with a clear message, not as a buried
        # range()-step ValueError inside a task
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def _real_frames(p: bytes):
        import io

        import av  # pragma: no cover — exercised only where av is installed
        import numpy as np

        with av.open(io.BytesIO(p)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % every_n == 0:
                    yield i, np.asarray(
                        frame.to_ndarray(format="gray"), dtype=np.uint8
                    ).tobytes()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if decoder == "real":
                _require(HAS_AV, "PyAV (av)", "video frame demuxing")
                ids, idxs, frames = [], [], []
                for mid, p in zip(pdf["media_id"], pdf["payload"]):
                    if p is None or len(p) == 0:
                        continue
                    for i, fb in _real_frames(bytes(p)):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(fb)
                yield pd.DataFrame({
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                })
                continue
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
