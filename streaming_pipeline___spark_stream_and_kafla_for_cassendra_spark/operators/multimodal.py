"""Multimodal column plumbing (training-data pipeline ops).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
mapInPandas batching, Arrow transfer shape — is real and tested; the
actual codec work is stubbed (decode libs are not in this container)
behind ``decode_image_stub`` (deterministic fake, used by tests) and
``decode_image`` (raises NotImplementedError until a codec such as
Pillow is provided at deploy time).

Scale notes: binary payloads are the dominant bytes at 100 TB —
mapInPandas keeps them executor-local (no shuffle), and
``maxRecordsPerBatch`` bounds Arrow batch memory when payloads are
large. Feature extraction emits small fixed-size rows, so any
downstream shuffle moves features, not media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal record: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — plug Pillow/libvips here at deploy time."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use decode_image_stub for tests or inject a decoder"
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derives a (width, height) from the
    payload bytes so tests can assert end-to-end plumbing."""
    if not payload:
        return (0, 0)
    w = 16 + (payload[0] % 64) * 16
    h = 16 + (payload[-1] % 64) * 16
    return (w, h)


def extract_image_features(
    media: DataFrame, use_stub_decoder: bool = True
) -> DataFrame:
    """binary payload → (width, height, bytes, checksum) features via
    Arrow-batched mapInPandas. Narrow (no shuffle); batch size is the
    Arrow batch, so memory stays bounded regardless of payload size.
    """
    # The decoder is re-defined *inside* this function so cloudpickle
    # serializes it by value: Spark's Python workers may not have this
    # package on sys.path (the driver can run from any cwd), and a
    # by-reference pickle of a module-level function would fail to
    # unpickle there with ModuleNotFoundError.
    if use_stub_decoder:
        def decoder(payload: bytes) -> tuple[int, int]:
            if not payload:
                return (0, 0)
            return (16 + (payload[0] % 64) * 16, 16 + (payload[-1] % 64) * 16)
    else:
        def decoder(payload: bytes) -> tuple[int, int]:
            raise NotImplementedError(
                "image codecs are not available in this environment"
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            dims = [decoder(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "checksum": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms_energy", StringType()),  # hex-quantized, deterministic
    ]
)


def extract_audio_features(
    media: DataFrame, use_stub_decoder: bool = True
) -> DataFrame:
    """binary payload → (sample_rate, n_samples, duration, energy).

    Same Arrow plumbing as images; the PCM decode is stubbed (no
    audio libs in this container) with a deterministic fake that
    treats payload bytes as 8-bit samples at 16 kHz — swap in
    soundfile/ffmpeg at deploy time. Narrow, shuffle-free.
    """
    if use_stub_decoder:
        def decoder(payload: bytes):
            # fake PCM: bytes are unsigned 8-bit samples @ 16 kHz
            sr = 16_000
            n = len(payload)
            return sr, n
    else:
        def decoder(payload: bytes):
            raise NotImplementedError(
                "audio codecs are not available in this environment"
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = {
                "media_id": pdf["media_id"],
                "sample_rate": [],
                "n_samples": [],
                "duration_ms": [],
                "rms_energy": [],
            }
            for p in pdf["payload"]:
                p = p if p is not None else b""
                sr, n = decoder(p)
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // sr if sr else 0)
                samples = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                rms = float(np.sqrt((samples**2).mean())) if n else 0.0
                rows["rms_energy"].append(f"{int(rms * 100):x}")
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_payload", BinaryType()),
        StructField("frame_checksum", StringType()),
    ]
)


def sample_video_frames(
    media: DataFrame,
    every_nth: int = 10,
    frame_bytes: int = 256,
    use_stub_decoder: bool = True,
) -> DataFrame:
    """Video → sampled-frame rows (one row per kept frame).

    The stub treats the payload as fixed-size raw frames of
    ``frame_bytes`` and keeps every ``every_nth`` one — the exact
    batch/explode shape a real ffmpeg-backed sampler produces. The
    fan-out happens executor-local inside mapInPandas (no shuffle of
    the source payload); downstream ops see per-frame binaries with
    bounded Arrow batches.
    """
    if use_stub_decoder:
        def frames(payload: bytes):
            return [
                payload[i : i + frame_bytes]
                for i in range(0, len(payload), frame_bytes)
            ]
    else:
        def frames(payload: bytes):
            raise NotImplementedError(
                "video codecs are not available in this environment"
            )

    nth = every_nth

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            ids, nos, payloads, sums = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p if p is not None else b""
                for fno, fr in enumerate(frames(p)):
                    if fno % nth:
                        continue
                    ids.append(mid)
                    nos.append(fno)
                    payloads.append(fr)
                    sums.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": nos,
                    "frame_payload": payloads,
                    "frame_checksum": sums,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=VIDEO_FRAMES_SCHEMA
    )


def resize_images(
    media: DataFrame, target_w: int = 64, target_h: int = 64,
    use_stub_decoder: bool = True,
) -> DataFrame:
    """Image resize pass: payload → payload' (+ new dims in meta).

    Stub 'resize' deterministically re-samples the payload bytes to
    ``target_w × target_h`` length; real deployments plug Pillow in.
    Demonstrates the payload-in/payload-out transform shape (media
    stays binary through the pipeline, executor-local)."""
    if use_stub_decoder:
        def resize(payload: bytes) -> bytes:
            need = target_w * target_h
            if not payload:
                return b"\x00" * need
            reps = -(-need // len(payload))
            return (payload * reps)[:need]
    else:
        def resize(payload: bytes) -> bytes:
            raise NotImplementedError(
                "image codecs are not available in this environment"
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        resize(p if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=out_schema
    )


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from the documents fixture: the text
    bytes stand in for an encoded image payload. Exercises the exact
    schema/batching path real media would take."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(F.col("text")).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)

# Frozen 8×32 INTEGER DCT basis (first 8 rows of the orthonormal
# 32-point DCT-II, scaled by 2^15 and rounded ONCE at authoring time
# — computed from np.cos and committed as literals so no engine ever
# re-derives cosines). Every arithmetic step of the pHash is then
# exact int64 (|W|≤8182, pixels≤255 → |W·X·Wᵀ| ≤ 1.8e13 ≪ 2^63), so
# the hash is bit-reproducible across numpy, the JVM, and the DuckDB
# oracle — the round-6 conversion of multimodal_phash_images from
# rows-only to a full value-hash oracle row. Integerized DCTs are
# standard practice (H.264/AVC core transform) and preserve the
# perceptual-hash Hamming geometry.
PHASH_DCT_W8: list[list[int]] = [
    [5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793],  # noqa: E501
    [8182, 8103, 7946, 7713, 7405, 7027, 6580, 6070, 5501, 4880, 4212, 3503, 2760, 1990, 1202, 402, -402, -1202, -1990, -2760, -3503, -4212, -4880, -5501, -6070, -6580, -7027, -7405, -7713, -7946, -8103, -8182],  # noqa: E501
    [8153, 7839, 7225, 6333, 5197, 3862, 2378, 803, -803, -2378, -3862, -5197, -6333, -7225, -7839, -8153, -8153, -7839, -7225, -6333, -5197, -3862, -2378, -803, 803, 2378, 3862, 5197, 6333, 7225, 7839, 8153],  # noqa: E501
    [8103, 7405, 6070, 4212, 1990, -402, -2760, -4880, -6580, -7713, -8182, -7946, -7027, -5501, -3503, -1202, 1202, 3503, 5501, 7027, 7946, 8182, 7713, 6580, 4880, 2760, 402, -1990, -4212, -6070, -7405, -8103],  # noqa: E501
    [8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035, -8035, -6811, -4551, -1598, 1598, 4551, 6811, 8035, 8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035, -8035, -6811, -4551, -1598, 1598, 4551, 6811, 8035],  # noqa: E501
    [7946, 6070, 2760, -1202, -4880, -7405, -8182, -7027, -4212, -402, 3503, 6580, 8103, 7713, 5501, 1990, -1990, -5501, -7713, -8103, -6580, -3503, 402, 4212, 7027, 8182, 7405, 4880, 1202, -2760, -6070, -7946],  # noqa: E501
    [7839, 5197, 803, -3862, -7225, -8153, -6333, -2378, 2378, 6333, 8153, 7225, 3862, -803, -5197, -7839, -7839, -5197, -803, 3862, 7225, 8153, 6333, 2378, -2378, -6333, -8153, -7225, -3862, 803, 5197, 7839],  # noqa: E501
    [7713, 4212, -1202, -6070, -8182, -6580, -1990, 3503, 7405, 7946, 4880, -402, -5501, -8103, -7027, -2760, 2760, 7027, 8103, 5501, 402, -4880, -7946, -7405, -3503, 1990, 6580, 8182, 6070, 1202, -4212, -7713],  # noqa: E501
]


def phash_images(media: DataFrame, use_stub_decoder: bool = True) -> DataFrame:
    """64-bit perceptual hash (pHash) per image — the image-dedup
    primitive of training-data pipelines (near-identical images hash
    within a few bits; crops/re-encodes stay close, unrelated images
    land ~32 bits apart).

    Pipeline per Arrow batch (all numpy, executor-local, no shuffle):
    decode → 32×32 grayscale → integer 2-D DCT (two int64 matmuls
    against the frozen ``PHASH_DCT_W8`` basis — only the first 8
    frequency rows are ever needed, so W·X·Wᵀ IS the top-left 8×8
    low-frequency block) → median threshold (exact integer compare:
    bit ⇔ 2·c > s₃₂+s₃₃ of the sorted coefficients) → 64-bit pack.
    The stub decoder tiles payload bytes into the pixel grid
    (deterministic; swap in a real codec at deploy time — the
    DCT/threshold/pack stages are the real algorithm either way).
    """

    use_stub = use_stub_decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = 32
        W = np.array(PHASH_DCT_W8, dtype=np.int64)

        if use_stub:

            def pixels(payload: bytes) -> np.ndarray:
                raw = np.frombuffer(payload or b"\0", dtype=np.uint8)
                tiled = np.resize(raw, n * n).astype(np.int64)
                return tiled.reshape(n, n)

        else:
            # real-codec seam: grayscale decode + bilinear resize to
            # the 32×32 grid via Pillow, then the SAME integer
            # DCT/threshold/pack stages. Env-gated — raises without
            # a codec; tests/test_multimodal_golden.py pins a
            # checked-in 32×32 grayscale PNG whose expected hash is
            # derivable without Pillow.
            def pixels(payload: bytes) -> np.ndarray:
                import io

                from PIL import Image  # deploy-time dependency

                img = Image.open(io.BytesIO(payload)).convert("L")
                if img.size != (n, n):
                    img = img.resize((n, n), Image.BILINEAR)
                return np.asarray(img, dtype=np.uint8).astype(np.int64)

        weights = 1 << np.arange(64, dtype=np.uint64)
        for pdf in it:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x = pixels(payload)
                coeffs = (W @ x @ W.T).ravel()  # exact int64
                s = np.sort(coeffs)
                bits = 2 * coeffs > s[31] + s[32]
                h = np.uint64((bits * weights).sum())
                ids.append(mid)
                hashes.append(int(h.astype(np.int64)))
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=PHASH_SCHEMA
    )


def phash_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, use_stub_decoder: bool = True
) -> DataFrame:
    """Image near-dup pairs at Hamming distance ≤ ``max_hamming``.

    Scale path: the 64-bit hash splits into ``max_hamming + 1``
    bands; by pigeonhole, any pair within the distance budget agrees
    EXACTLY on at least one band, so candidates come from a band
    equi-join (hash-partitioned, never a cross join) and the verify
    is a JVM-side ``bit_count(xor)`` on candidates only — the same
    band-then-verify discipline as the MinHash/SimHash text tiers.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sig = phash_images(media, use_stub_decoder)
    bands = sig.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("phash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("media_id", "phash", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", dist.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
