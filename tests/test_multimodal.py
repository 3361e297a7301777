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


# ---------------------------------------------------------------------------
# perceptual hash: near-identical images collide, unrelated diverge
# ---------------------------------------------------------------------------

def test_phash_near_dup_detection(spark):
    import numpy as np

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
        phash_images,
        phash_near_dup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=1024, dtype=np.uint8)
    near = base.copy()
    near[100:104] += 1  # tiny perturbation -> low-freq DCT stable
    other = rng.integers(0, 256, size=1024, dtype=np.uint8)
    rows = [
        (1, "image", bytes(base), None),
        (2, "image", bytes(near), None),
        (3, "image", bytes(other), None),
    ]
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["phash"] for r in phash_images(media).collect()}
    assert len(hashes) == 3
    ham = bin(hashes[1] ^ hashes[2]).count("1")
    far = bin(hashes[1] ^ hashes[3]).count("1")
    assert ham <= 3 < far

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == ham
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_banding_never_misses_within_budget(spark):
    """Pigeonhole: constructed hashes exactly max_hamming apart MUST
    surface as candidates through the band join."""
    import numpy as np

    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        phash_images,
        phash_near_dup_pairs,
    )

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, size=1024, dtype=np.uint8)
    variants = []
    for d in range(6):
        v = base.copy()
        v[200 : 200 + d] += 3
        variants.append((d + 10, "image", bytes(v), None))
    media = spark.createDataFrame(variants, MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["phash"] for r in phash_images(media).collect()}
    pairs = {
        (r["id_a"], r["id_b"])
        for r in phash_near_dup_pairs(media, max_hamming=3).collect()
    }
    for a in hashes:
        for b in hashes:
            if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3:
                assert (a, b) in pairs  # guarantee: no misses in budget
