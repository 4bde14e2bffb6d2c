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
        # builder rate is 16000 → half the samples (rounded)
        assert len(r.payload) == max(1, round(src_lens[r.media_id] * 0.5))


def test_real_decoder_raises_at_call_site(media):
    with pytest.raises(Exception, match="NotImplementedError|real"):
        resize_images(media, 8, 8, decoder="real").collect()
    with pytest.raises(Exception, match="NotImplementedError|real"):
        sample_frames(media, decoder="real").collect()
    with pytest.raises(Exception, match="NotImplementedError|real"):
        extract_features(media, decoder="real").collect()


def test_feature_extraction_matches_local(media):
    rows = {r.media_id: r for r in extract_features(media).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, r in rows.items():
        assert r.n_bytes == len(src[mid])
        assert r.first_byte == src[mid][0]
        assert r.last_byte == src[mid][-1]
        assert math.isclose(r.byte_mean, sum(src[mid]) / len(src[mid]))
