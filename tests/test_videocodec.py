"""Pure-stdlib AVI container codec + integer-exact frame features
(kernels/videocodec). Round-trips anchor encode+decode; the hand-built
container case anchors the byte layout independently of the encoder; the
DIB-layout cases prove the bottom-up padded-row handling is real."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from unified_ocr_pipeline_spark.kernels import videocodec as VC

RNG = np.random.default_rng(13)


@pytest.mark.parametrize("shape", [(4, 4), (5, 7), (3, 8), (6, 1)])
@pytest.mark.parametrize("n_frames", [1, 5])
def test_avi_roundtrip(shape, n_frames):
    frames = [RNG.integers(0, 256, size=shape, dtype=np.uint8) for _ in range(n_frames)]
    out, fps, meta = VC.decode_avi(VC.encode_avi(frames, fps=24))
    assert fps == 24
    assert meta == {"width": shape[1], "height": shape[0], "n_frames": n_frames, "fps": 24}
    np.testing.assert_array_equal(out, np.stack(frames))


def test_dib_row_padding_and_flip():
    # width 5 → stride 8: the pad bytes and the bottom-up flip must both
    # be applied, or this asymmetric frame comes back scrambled.
    frame = np.arange(10, dtype=np.uint8).reshape(2, 5)
    raw = VC._dib_rows(frame)
    assert len(raw) == 16
    assert raw[:5] == bytes([5, 6, 7, 8, 9])  # bottom row first
    assert raw[5:8] == b"\x00\x00\x00"  # stride padding
    out, _, _ = VC.decode_avi(VC.encode_avi([frame], fps=10))
    np.testing.assert_array_equal(out[0], frame)


def test_handbuilt_topdown_dib():
    # Negative biHeight = top-down DIB: rows stored first-to-last. Built
    # by patching the encoder's output strf height and re-ordering rows.
    frame = np.arange(8, dtype=np.uint8).reshape(2, 4)
    avi = bytearray(VC.encode_avi([frame], fps=10))
    i = bytes(avi).index(b"strf")
    # biHeight sits 8 bytes into the BITMAPINFOHEADER body (after size+width)
    (h,) = struct.unpack_from("<i", avi, i + 8 + 8)
    struct.pack_into("<i", avi, i + 8 + 8, -h)
    j = bytes(avi).index(b"00db")
    body_len = struct.unpack_from("<I", avi, j + 4)[0]
    body = avi[j + 8 : j + 8 + body_len]
    avi[j + 8 : j + 8 + body_len] = body[4:] + body[:4]  # un-flip the 2 rows
    out, _, _ = VC.decode_avi(bytes(avi))
    np.testing.assert_array_equal(out[0], frame)


def test_decoder_rejects_malformed():
    good = VC.encode_avi([np.zeros((2, 2), dtype=np.uint8)], fps=10)
    with pytest.raises(ValueError):
        VC.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")  # wrong RIFF kind
    with pytest.raises(ValueError):
        VC.decode_avi(good[:40])  # truncated headers
    # frame-count mismatch between avih and movi
    bad = bytearray(good)
    i = bytes(bad).index(b"avih")
    struct.pack_into("<I", bad, i + 8 + 16, 99)  # total_frames field
    with pytest.raises(ValueError, match="declares 99"):
        VC.decode_avi(bytes(bad))
    # compressed frames are explicitly undecodable without a codec lib
    bad = bytearray(good)
    i = bytes(bad).index(b"strf")
    struct.pack_into("<I", bad, i + 8 + 16, 0x47504A4D)  # biCompression=MJPG
    with pytest.raises(ValueError, match="unsupported DIB"):
        VC.decode_avi(bytes(bad))


def test_encode_validations():
    with pytest.raises(ValueError):
        VC.encode_avi([], fps=10)
    with pytest.raises(ValueError):
        VC.encode_avi([np.zeros((2, 2), np.uint8), np.zeros((3, 2), np.uint8)], fps=10)
    with pytest.raises(ValueError):
        VC.encode_avi([np.zeros((2, 2), np.uint8)], fps=0)


def test_video_features_exact():
    f0 = np.full((2, 2), 10, dtype=np.uint8)
    f1 = np.full((2, 2), 13, dtype=np.uint8)
    f2 = np.full((2, 2), 7, dtype=np.uint8)
    feats = VC.video_features(np.stack([f0, f1, f2]), fps=10, frame_stride=1)
    assert feats == {
        "n_frames": 3,
        "n_sampled": 3,
        "duration_ms": 300,
        "px_sum_sampled": 4 * (10 + 13 + 7),
        "motion_sum": 4 * 3 + 4 * 6,
    }
    strided = VC.video_features(np.stack([f0, f1, f2]), fps=10, frame_stride=2)
    assert strided["n_sampled"] == 2
    assert strided["px_sum_sampled"] == 4 * (10 + 7)
    assert strided["motion_sum"] == 4 * 3  # |7-10| per pixel


def test_spark_video_metadata_and_frame_sampling(spark):
    from unified_ocr_pipeline_spark.kernels import imagecodec as IC
    from unified_ocr_pipeline_spark.operators import multimodal as MM

    frames = [np.full((3, 4), 10 * k, dtype=np.uint8) for k in range(4)]
    clip = bytes(VC.encode_avi(frames, fps=20))
    df = spark.createDataFrame([(7, clip)], "media_id long, media binary")

    meta = MM.extract_video_metadata(df, frame_stride=2).collect()[0]
    assert (meta["width"], meta["height"], meta["fps"]) == (4, 3, 20)
    assert (meta["n_frames"], meta["n_sampled"], meta["duration_ms"]) == (4, 2, 200)
    assert meta["px_sum_sampled"] == 12 * (0 + 20)
    assert meta["motion_sum"] == 12 * 20

    rows = MM.sample_frames_real(df, frame_stride=2).collect()
    assert [(r["frame_no"], r["px_sum"]) for r in rows] == [(0, 0), (2, 240)]
    # sampled frames are valid PNGs that round-trip to the true pixels
    np.testing.assert_array_equal(IC.decode_png(bytes(rows[1]["frame"])), frames[2])
