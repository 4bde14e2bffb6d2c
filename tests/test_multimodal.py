"""Multimodal Arrow plumbing: decode stub, resize, frame sampling.

The real codecs are absent in this container (decoder='real' raises at the
exact call site); these tests pin the plumbing the real implementation
would reuse unchanged: schemas, 1→1 and 1→N batch shapes, determinism, and
the kind filters happening JVM-side before the crossing.
"""

from __future__ import annotations

import math

import pytest

from gensor_spark.operators.multimodal import (
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text number {i} " * (i + 1)) for i in range(9)],
        "doc_id long, text string",
    )
    return media_from_documents(docs)


def test_resize_images_shape_and_determinism(media):
    out = resize_images(media, width=8, height=4).collect()
    # only the image rows (kind round-robins over doc_id % 3 == 0)
    assert sorted(r.media_id for r in out) == [0, 3, 6]
    assert all(r.width == 8 and r.height == 4 for r in out)
    assert all(len(r.payload) == 8 * 4 for r in out)
    again = {r.media_id: bytes(r.payload)
             for r in resize_images(media, width=8, height=4).collect()}
    assert {r.media_id: bytes(r.payload) for r in out} == again


def test_sample_frames_counts_and_identity(media):
    out = sample_frames(media, every_n=30).collect()
    vids = {r.media_id for r in out}
    assert vids == {2, 5, 8}  # kind == video rows
    per = {}
    for r in out:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    # n_frames is 300 in the builder → ceil(300/30) = 10 frames each
    for mid, idxs in per.items():
        assert sorted(idxs) == list(range(0, 300, 30))
    # frames are deterministic content-derived bytes
    again = {(r.media_id, r.frame_idx): bytes(r.frame)
             for r in sample_frames(media, every_n=30).collect()}
    assert {(r.media_id, r.frame_idx): bytes(r.frame) for r in out} == again


def test_resample_audio_rate_and_length(media):
    from gensor_spark.operators.multimodal import resample_audio

    src_lens = {r.media_id: len(bytes(r.payload))
                for r in media.filter("kind = 'audio'").collect()}
    out = resample_audio(media, target_rate=8000).collect()
    assert sorted(r.media_id for r in out) == sorted(src_lens)
    for r in out:
        assert r.sample_rate == 8000
        # builder rate is 16000 → half the samples (exact integer floor)
        assert len(r.payload) == max(1, src_lens[r.media_id] // 2)


def test_real_decoder_gated_on_availability(media):
    """decoder='real' is availability-gated (VERDICT r2 #6): without the lib
    it raises a clear NotImplementedError naming the dependency; with it the
    real path runs (exercised by the WAV tests below for audio, and by the
    PIL tests in environments that have Pillow)."""
    from gensor_spark.operators.multimodal import HAS_AV, HAS_PIL

    if not HAS_PIL:
        with pytest.raises(Exception, match="Pillow|decoder='fake'"):
            resize_images(media, 8, 8, decoder="real").collect()
    if not HAS_AV:
        with pytest.raises(Exception, match="PyAV|decoder='fake'"):
            sample_frames(media, decoder="real").collect()
    # the derived media table's payloads are text bytes, not containers —
    # the real decoder must reject them, never silently fake-decode
    with pytest.raises(Exception):
        extract_features(media, decoder="real").collect()


def _wav_bytes(samples, rate=16000):
    import io
    import wave

    import numpy as np

    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="int16").tobytes())
    return out.getvalue()


def test_real_audio_features_decode_wav(spark):
    """The audio real path needs only stdlib ``wave`` — it runs here for
    real: features are computed over decoded int16 PCM samples, not the
    encoded container bytes."""
    import numpy as np

    samples = [0, 1000, -2000, 3000, -4000, 500]
    rows = [(1, "audio", bytearray(_wav_bytes(samples)), None, None, 16000, None)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, "
              "height int, sample_rate int, n_frames int")
    r = extract_features(media, decoder="real").collect()[0]
    assert r.n_bytes == len(samples)           # decoded samples, not bytes
    assert r.first_byte == 0 and r.last_byte == 500
    assert np.isclose(r.byte_mean, np.mean(samples))


def test_real_audio_resample_roundtrip(spark):
    """Real WAV 16 kHz → 8 kHz: output parses as WAV at the target rate with
    half the frames; even-index samples survive linear interpolation."""
    import io
    import wave

    import numpy as np

    from gensor_spark.operators.multimodal import resample_audio

    samples = np.arange(0, 8000, 100, dtype=np.int16)  # 80 frames
    rows = [(1, "audio", bytearray(_wav_bytes(samples)), None, None, 16000, None)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, "
              "height int, sample_rate int, n_frames int")
    out = resample_audio(media, target_rate=8000, decoder="real").collect()[0]
    with wave.open(io.BytesIO(bytes(out.payload)), "rb") as w:
        assert w.getframerate() == 8000
        assert w.getnframes() == len(samples) // 2
        got = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    # t_out = linspace(0, 79, 40) lands between grid points; values must
    # stay inside the source range and increase like the source ramp
    assert got[0] == samples[0]
    assert (np.diff(got.astype(int)) > 0).all()


def test_real_image_resize_with_pil(spark):
    PIL = pytest.importorskip("PIL")  # noqa: F841 — self-skips without Pillow
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    rows = [(1, "image", bytearray(buf.getvalue()), 16, 16, None, None)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, "
              "height int, sample_rate int, n_frames int")
    out = resize_images(media, width=4, height=2, decoder="real").collect()[0]
    img = Image.open(io.BytesIO(bytes(out.payload)))
    assert img.size == (4, 2)


def test_feature_extraction_matches_local(media):
    rows = {r.media_id: r for r in extract_features(media).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, r in rows.items():
        assert r.n_bytes == len(src[mid])
        assert r.first_byte == src[mid][0]
        assert r.last_byte == src[mid][-1]
        assert math.isclose(r.byte_mean, sum(src[mid]) / len(src[mid]))
