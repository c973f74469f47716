"""Pure-stdlib RIFF/WAV codec + integer-exact features (kernels/audiocodec).

Round-trips cover both bit depths and channel counts; the hand-built
container cases anchor the byte layout independently of the encoder (a
matching encode/decode bug can't hide), and the chunk-walk cases prove the
decoder is a real RIFF parser (junk chunks, odd-size padding), not a
fixed-offset splitter."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from unified_ocr_pipeline_spark.kernels import audiocodec as AC

RNG = np.random.default_rng(11)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 2, 3])
@pytest.mark.parametrize("bits", [8, 16])
def test_wav_roundtrip(channels, bits):
    n = 173
    if bits == 16:
        samples = RNG.integers(-32768, 32768, size=(n, channels), dtype=np.int64)
        expect = samples.astype(np.int32)
    else:
        samples = RNG.integers(0, 256, size=(n, channels), dtype=np.int64)
        expect = samples.astype(np.int32) - 128  # decoder re-centers 8-bit
    out, rate, got_bits = AC.decode_wav(AC.encode_wav(samples, 44100, bits=bits))
    assert (rate, got_bits) == (44100, bits)
    np.testing.assert_array_equal(out, expect)


def test_wav_roundtrip_mono_1d_input():
    samples = np.array([0, 100, -100, 32767, -32768])
    out, rate, bits = AC.decode_wav(AC.encode_wav(samples, 8000))
    assert out.shape == (5, 1)
    np.testing.assert_array_equal(out[:, 0], samples)


def test_encode_rejects_out_of_range():
    with pytest.raises(ValueError):
        AC.encode_wav(np.array([40000]), 8000, bits=16)
    with pytest.raises(ValueError):
        AC.encode_wav(np.array([-1]), 8000, bits=8)
    with pytest.raises(ValueError):
        AC.encode_wav(np.array([0]), 8000, bits=24)


# ---------------------------------------------------------------------------
# hand-built containers (decoder tested WITHOUT the encoder)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, body: bytes) -> bytes:
    padded = body + (b"\x00" if len(body) % 2 else b"")
    return tag + struct.pack("<I", len(body)) + padded


def _fmt(channels=1, rate=8000, bits=16) -> bytes:
    balign = channels * bits // 8
    return struct.pack("<HHIIHH", 1, channels, rate, rate * balign, balign, bits)


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_handbuilt_minimal_16bit():
    data = struct.pack("<4h", 1, -2, 300, -32768)
    wav = _riff(_chunk(b"fmt ", _fmt()), _chunk(b"data", data))
    out, rate, bits = AC.decode_wav(wav)
    assert (rate, bits) == (8000, 16)
    np.testing.assert_array_equal(out[:, 0], [1, -2, 300, -32768])


def test_handbuilt_junk_chunks_and_odd_padding():
    # LIST chunk before fmt, an ODD-length junk chunk between fmt and data
    # (forcing the pad-byte walk), and a trailing chunk after data.
    data = struct.pack("<6h", 5, -5, 0, 7, -7, 9)
    wav = _riff(
        _chunk(b"LIST", b"INFOIART" + b"x" * 6),
        _chunk(b"fmt ", _fmt(channels=2)),
        _chunk(b"junk", b"\x01\x02\x03"),  # odd length → padded
        _chunk(b"data", data),
        _chunk(b"cue ", b"\x00" * 4),
    )
    out, rate, bits = AC.decode_wav(wav)
    assert out.shape == (3, 2)
    np.testing.assert_array_equal(out, [[5, -5], [0, 7], [-7, 9]])


def test_handbuilt_8bit_recentering():
    wav = _riff(_chunk(b"fmt ", _fmt(bits=8)), _chunk(b"data", bytes([0, 128, 255])))
    out, _, bits = AC.decode_wav(wav)
    assert bits == 8
    np.testing.assert_array_equal(out[:, 0], [-128, 0, 127])


def test_decoder_rejects_malformed():
    with pytest.raises(ValueError):
        AC.decode_wav(b"not audio at all")
    with pytest.raises(ValueError):  # data before fmt
        AC.decode_wav(_riff(_chunk(b"data", b"\x00\x00"), _chunk(b"fmt ", _fmt())))
    with pytest.raises(ValueError):  # missing data
        AC.decode_wav(_riff(_chunk(b"fmt ", _fmt())))
    with pytest.raises(ValueError):  # non-PCM format tag
        bad = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
        AC.decode_wav(_riff(_chunk(b"fmt ", bad), _chunk(b"data", b"\x00\x00")))
    with pytest.raises(ValueError):  # chunk overruns container
        truncated = _riff(_chunk(b"fmt ", _fmt()), _chunk(b"data", b"\x00" * 8))[:-6]
        AC.decode_wav(truncated)


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

def test_audio_features_exact():
    samples = np.array([[3], [-4], [0], [5], [-1]])
    f = AC.audio_features(samples, 1000)
    assert f == {
        "n_frames": 5,
        "duration_ms": 5,
        "peak_abs": 5,
        "abs_sum": 13,
        # 3→-4 cross, -4→0 cross (0 is non-negative), 0→5 no, 5→-1 cross
        "zero_crossings": 3,
    }


def test_audio_features_interleaved_and_empty():
    stereo = np.array([[1, -1], [-2, 2]])  # interleave: 1,-1,-2,2 → 2 crossings
    f = AC.audio_features(stereo, 8000)
    assert f["n_frames"] == 2 and f["zero_crossings"] == 2 and f["abs_sum"] == 6
    z = AC.audio_features(np.zeros((0, 2), dtype=np.int64), 8000)
    assert z["n_frames"] == 0 and z["duration_ms"] == 0


def test_duration_floor_division():
    f = AC.audio_features(np.zeros(999, dtype=np.int64), 1000)
    assert f["duration_ms"] == 999
    f = AC.audio_features(np.zeros(1001, dtype=np.int64), 1000)
    assert f["duration_ms"] == 1001 * 1000 // 1000


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def test_extract_audio_metadata(spark):
    from unified_ocr_pipeline_spark.operators import multimodal as MM

    clips = [
        (1, bytes(AC.encode_wav(np.array([100, -100, 50, -50]), 8000))),
        (2, bytes(AC.encode_wav(np.array([[0, 1], [2, -3]]), 16000))),
    ]
    df = spark.createDataFrame(clips, "media_id long, media binary")
    rows = {r["media_id"]: r for r in MM.extract_audio_metadata(df).collect()}
    r1 = rows[1]
    assert (r1["sample_rate"], r1["channels"], r1["n_frames"]) == (8000, 1, 4)
    assert (r1["peak_abs"], r1["abs_sum"], r1["zero_crossings"]) == (100, 300, 3)
    r2 = rows[2]
    assert (r2["sample_rate"], r2["channels"], r2["bits"]) == (16000, 2, 16)
    assert (r2["n_frames"], r2["abs_sum"], r2["zero_crossings"]) == (2, 6, 1)
