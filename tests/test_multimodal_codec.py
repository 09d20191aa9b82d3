"""Real-codec path of the multimodal operator, gated on optional PIL
(VERDICT r4 task #8): a hand-rolled uncompressed 24-bit BMP — authored
byte-by-byte here, no imaging library needed to WRITE it — decodes through
``decode_images``'s real branch when PIL is importable, and the output is
pinned both to ``fake_feature_extract``'s schema (the plumbing contract)
and to a numpy-computed expected feature vector derived from the authored
pixels (independent of PIL). In the sandbox (no PIL) the decode test
skips; the byte-fixture self-check below always runs.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from logflow_spark.operators.multimodal import (
    FEATURE_DIM,
    FEATURE_SCHEMA,
    decode_images,
    fake_feature_extract,
)

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

# 2x2 image, known RGB pixels (row 0 = top): red, green / blue, white
PIXELS = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
    dtype=np.uint8,
)


def make_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP: bottom-up rows, BGR byte
    order, rows padded to 4 bytes."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        bytes(int(v) for px in pixels[y] for v in (px[2], px[1], px[0]))
        + b"\x00" * pad
        for y in range(h - 1, -1, -1)  # bottom-up
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return header + info + body


def expected_feature(pixels: np.ndarray) -> np.ndarray:
    """The decode_images feature formula computed straight from the authored
    pixel array — no decoder involved."""
    img = pixels.astype(np.float64)
    lum = img.mean(axis=2)
    hist = np.histogram(lum, bins=FEATURE_DIM - 3, range=(0, 255))[0]
    return np.concatenate(
        [img.mean(axis=(0, 1)) / 255.0, hist / max(1, lum.size)]
    ).astype(np.float32)


def test_bmp_fixture_is_wellformed():
    raw = make_bmp(PIXELS)
    assert raw[:2] == b"BM"
    assert len(raw) == struct.unpack("<I", raw[2:6])[0]
    # pixel-data offset points inside the file, row stride padded to 4
    assert struct.unpack("<I", raw[10:14])[0] == 54
    assert (len(raw) - 54) == 2 * (2 * 3 + 2)  # 2 rows of 6 bytes + 2 pad


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in this env")
def test_decode_images_real_branch_matches_fake_schema_and_pixels(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(make_bmp(PIXELS)), "image/bmp", 2, 2, None)],
        schema=(
            "media_id long, kind string, payload binary, mime string, "
            "width long, height long, duration_ms long"
        ),
    )
    real = decode_images(media)
    fake = fake_feature_extract(media)
    # plumbing contract: the real branch serves the exact schema the
    # fake extractor pins in the sandbox
    assert real.schema == fake.schema == FEATURE_SCHEMA
    rows = real.collect()
    assert len(rows) == 1 and rows[0]["n_bytes"] == len(make_bmp(PIXELS))
    got = np.array(rows[0]["feature"], dtype=np.float32)
    np.testing.assert_allclose(got, expected_feature(PIXELS), rtol=1e-6)
