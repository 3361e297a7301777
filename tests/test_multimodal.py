"""Multimodal column plumbing (binary payload + mapInPandas features)."""

from __future__ import annotations

import hashlib

import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    synthetic_media_from_documents,
)


def test_media_schema_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "abc", "en", "s", 3), (2, "", "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    media = synthetic_media_from_documents(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = {r.media_id: r for r in extract_image_features(media).collect()}

    assert feats[1].checksum == hashlib.md5(b"abc").hexdigest()
    assert feats[1].n_bytes == 3
    assert feats[1].width == 16 + (ord("a") % 64) * 16
    assert feats[1].height == 16 + (ord("c") % 64) * 16
    assert (feats[2].width, feats[2].height, feats[2].n_bytes) == (0, 0, 0)


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_audio_features_deterministic_stub(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = spark.createDataFrame(
        [(1, "abcd", "en", "s", 4), (2, "", "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    media = synthetic_media_from_documents(docs)
    got = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert got[1].sample_rate == 16000 and got[1].n_samples == 4
    assert got[1].duration_ms == 4 * 1000 // 16000
    assert got[2].n_samples == 0 and got[2].rms_energy == "0"


def test_video_frame_sampling(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
        sample_video_frames,
    )

    payload = bytes(range(256)) * 10  # 2560 bytes = 10 frames of 256
    media = spark.createDataFrame([(7, payload)], "media_id bigint, payload binary")
    frames = sample_video_frames(media, every_nth=3, frame_bytes=256).collect()
    assert [r.frame_no for r in sorted(frames, key=lambda r: r.frame_no)] == [0, 3, 6, 9]
    f0 = next(r for r in frames if r.frame_no == 0)
    assert bytes(f0.frame_payload) == bytes(range(256))
    assert f0.frame_checksum == hashlib.md5(bytes(range(256))).hexdigest()


def test_resize_images_payload_shape(spark):
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
        resize_images,
    )

    media = spark.createDataFrame(
        [(1, b"xy"), (2, b""), (3, None)], "media_id bigint, payload binary"
    )
    got = {r.media_id: r for r in resize_images(media, 8, 4).collect()}
    assert all(len(bytes(r.payload)) == 32 for r in got.values())
    assert bytes(got[1].payload) == (b"xy" * 16)
    assert (got[1].width, got[1].height) == (8, 4)
