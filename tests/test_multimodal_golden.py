"""Real-codec pHash golden (VERDICT r5 item #8).

``tests/fixtures/phash_golden_32x32_gray.png`` is a checked-in
32×32 8-bit grayscale PNG generated with pure zlib/struct from a
DETERMINISTIC pixel formula — so the expected perceptual hash is
derivable in ANY environment (the integer-DCT stages need only
numpy), while the decode step itself is exercised only where Pillow
exists. A future PIL-enabled environment verifies the real-codec
path with zero new code; here the decode test skips and the
expected-hash derivation plus PNG integrity stay pinned.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
    PHASH_DCT_W8,
)

GOLDEN = Path(__file__).parent / "fixtures" / "phash_golden_32x32_gray.png"


def golden_pixels() -> np.ndarray:
    """The exact pixel formula the fixture was generated from."""
    return np.array(
        [
            [(x * 7 + y * 13 + ((x * y) % 31)) % 256 for x in range(32)]
            for y in range(32)
        ],
        dtype=np.int64,
    )


def expected_phash(px: np.ndarray) -> int:
    W = np.array(PHASH_DCT_W8, dtype=np.int64)
    coeffs = (W @ px @ W.T).ravel()
    s = np.sort(coeffs)
    bits = 2 * coeffs > s[31] + s[32]
    weights = 1 << np.arange(64, dtype=np.uint64)
    return int(np.uint64((bits * weights).sum()).astype(np.int64))


def test_golden_png_bytes_decode_with_stdlib():
    """PNG integrity without any codec: parse IHDR, inflate IDAT,
    strip filter bytes, compare to the pixel formula — proves the
    checked-in bytes really encode the documented matrix."""
    data = GOLDEN.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (w, h, depth, ctype) == (32, 32, 8, 0)
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    rows = [raw[r * 33 + 1 : r * 33 + 33] for r in range(32)]
    assert all(raw[r * 33] == 0 for r in range(32))  # filter None
    got = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(32, 32)
    assert (got.astype(np.int64) == golden_pixels()).all()


def test_expected_phash_is_stable():
    """The derivation itself: frozen basis + frozen pixels → one
    64-bit constant. If this ever changes, the operator's DCT
    contract changed."""
    h = expected_phash(golden_pixels())
    assert h == expected_phash(golden_pixels())  # deterministic
    assert isinstance(h, int) and -(2**63) <= h < 2**63
    # popcount near the median split: the threshold bit rule sets
    # close to half the bits on any non-degenerate image
    assert 16 <= bin(h & ((1 << 64) - 1)).count("1") <= 48


def test_real_codec_phash_matches_golden(spark):
    """ENV-GATED: runs only where Pillow exists — the real-decoder
    path must reproduce the hash derived from the known pixels."""
    pytest.importorskip("PIL")
    from streaming_pipeline___spark_stream_and_kafla_for_cassendra_spark.operators.multimodal import (
        phash_images,
    )

    payload = GOLDEN.read_bytes()
    media = spark.createDataFrame([(1, payload)], ["media_id", "payload"])
    got = phash_images(media, use_stub_decoder=False).collect()
    assert got[0]["phash"] == expected_phash(golden_pixels())
