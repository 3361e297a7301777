"""Round-5 registry additions, batch 43 — multimodal byte/shape
accounting rows (VERDICT r4 item #8).

Same contract as ``registry.py``. Imported at the bottom of
``registry.py``.

``resize_images`` / ``sample_video_frames`` / ``extract_audio_features``
(``operators/multimodal.py:140,199,256``) were pytest-only until this
round. These rows put the remaining multimodal surface under the
driver-visible oracle gate by grading the parts of the pipeline that
ARE relationally checkable — byte counts, frame fan-out shape,
duration math, payload round-trips — while the codec stage stays the
documented deterministic stub (real decoders are injected at deploy
time; the Spark-side plumbing being graded here — schema, Arrow batch
shape, executor-local fan-out, binary payload handling — is identical
either way).

Media fixture: ``synthetic_media_from_documents`` (text bytes stand in
for an encoded payload), so the oracle derives every expectation from
``octet_length(encode(text))`` of the same parquet table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import _register, _t


def _media(spark, sf_dir):
    from ..operators.multimodal import synthetic_media_from_documents

    return synthetic_media_from_documents(_t(spark, sf_dir, "documents"))


@_register(
    "multimodal_audio_accounting",
    """
    SELECT doc_id AS media_id,
           CAST(16000 AS INTEGER) AS sample_rate,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
           CAST((octet_length(encode(text)) * 1000) // 16000 AS BIGINT)
             AS duration_ms
    FROM documents
    """,
    "Audio feature-extraction accounting (extract_audio_features, "
    "multimodal.py:140): every payload's (sample_rate, n_samples, "
    "duration_ms) from the Arrow-batched mapInPandas pass must match "
    "the oracle's byte-level derivation — the stub PCM decode treats "
    "payload bytes as 8-bit samples @ 16 kHz, so n_samples is the "
    "UTF-8 byte length and duration is integer-division math the "
    "oracle restates. Narrow and shuffle-free (features leave the "
    "executor, payloads never do); a batching/truncation/null-"
    "handling regression in the binary plumbing breaks the per-row "
    "match. rms_energy stays pytest-graded (byte-wise RMS is not "
    "relationally expressible)",
    ("multimodal", "audio", "pandas_udf", "documents"),
)
def multimodal_audio_accounting(spark, sf_dir):
    from ..operators.multimodal import extract_audio_features

    feats = extract_audio_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", "sample_rate", "n_samples", "duration_ms"
    )


@_register(
    "multimodal_video_frame_accounting",
    """
    WITH m AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS b
      FROM documents
    ),
    fr AS (
      SELECT media_id, b,
             unnest(generate_series(
               0, CAST(ceil(b / 256.0) AS BIGINT) - 1)) AS fno
      FROM m WHERE b > 0
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_frames_kept,
           CAST(max(fno) AS INTEGER) AS max_frame_no,
           CAST(sum(least(256, b - fno * 256)) AS BIGINT)
             AS kept_frame_bytes
    FROM fr WHERE fno % 10 = 0
    GROUP BY 1
    """,
    "Video frame-sampling accounting (sample_video_frames, "
    "multimodal.py:199, every_nth=10, frame_bytes=256): the stub "
    "sampler splits each payload into fixed-256-byte frames and "
    "keeps every 10th — so per media the kept-frame COUNT, the last "
    "kept frame NUMBER, and the total kept BYTES (last frame "
    "partial) are pure integer arithmetic on the payload byte "
    "length, which the oracle restates with generate_series. Grades "
    "the executor-local explode shape (one row per kept frame, "
    "fan-out inside mapInPandas — the source payload is never "
    "shuffled) plus boundary handling: an off-by-one in frame "
    "slicing, a dropped partial tail frame, or a modulo bug in the "
    "keep-filter each shift a column. Frame checksums stay pytest-"
    "graded (md5-of-slice is not byte-exact relationally across "
    "engines)",
    ("multimodal", "video", "pandas_udf", "documents"),
)
def multimodal_video_frame_accounting(spark, sf_dir):
    from ..operators.multimodal import sample_video_frames

    frames = sample_video_frames(
        _media(spark, sf_dir), every_nth=10, frame_bytes=256
    )
    return frames.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_frames_kept"),
        F.max("frame_no").cast("int").alias("max_frame_no"),
        F.sum(F.length("frame_payload"))
        .cast("long")
        .alias("kept_frame_bytes"),
    )


@_register(
    "multimodal_resize_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(64 AS INTEGER) AS width,
           CAST(64 AS INTEGER) AS height,
           CAST(4096 AS BIGINT) AS out_bytes,
           CAST(octet_length(encode(text)) AS BIGINT) AS in_bytes,
           TRUE AS prefix_roundtrip_ok
    FROM documents
    """,
    "Image resize-pass accounting (resize_images, multimodal.py:256, "
    "64×64 target): payload-in/payload-out transform — every output "
    "payload must be exactly width×height = 4096 bytes (out_bytes is "
    "measured with length() on the produced binary, not assumed), "
    "and because the stub resampler tiles the source bytes, the "
    "first min(in_bytes, 4096) output bytes must equal the source "
    "payload prefix — a JVM-side binary substring comparison the "
    "oracle pins TRUE per row. Grades the binary-column round trip "
    "through Arrow (encode → pandas bytes → Arrow binary → Spark "
    "BinaryType) and the in/out size contract a real Pillow-backed "
    "deployment keeps; in_bytes cross-checks the source byte length "
    "relationally",
    ("multimodal", "image", "pandas_udf", "documents"),
)
def multimodal_resize_roundtrip(spark, sf_dir):
    from ..operators.multimodal import resize_images

    media = _media(spark, sf_dir)
    resized = resize_images(media, target_w=64, target_h=64)
    orig = media.select(
        "media_id", F.col("payload").alias("orig_payload")
    )
    j = resized.join(orig, "media_id")
    in_bytes = F.length("orig_payload").cast("long")
    return j.select(
        "media_id",
        "width",
        "height",
        F.length("payload").cast("long").alias("out_bytes"),
        in_bytes.alias("in_bytes"),
        (
            F.expr("substring(payload, 1, least(length(orig_payload), 4096))")
            == F.expr(
                "substring(orig_payload, 1, least(length(orig_payload), 4096))"
            )
        ).alias("prefix_roundtrip_ok"),
    )
