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
