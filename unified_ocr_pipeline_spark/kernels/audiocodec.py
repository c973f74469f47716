"""Pure-stdlib RIFF/WAV audio codec + integer-exact feature kernel.

Closes the audio half of the multimodal seam the same way
``kernels/imagecodec.py`` closed the image half: no external audio
libraries (this container has none), only ``struct`` + NumPy. The decoder
walks the RIFF chunk list properly — skips unknown chunks, honours the
odd-size pad byte, validates the fmt chunk — so it is a real container
parser, not a fixed-offset splitter. Reference analog: the media-handling
seam at /root/reference/scripts/unified_ocr_pipeline.py:168-174 (media
bytes → typed arrays → derived features); this kernel is the audio
counterpart of that image path, rebuilt for Arrow batches.

Feature extraction (``audio_features``) is **integer-exact** — every
statistic is computed in int64 with no floating point anywhere — so the
DuckDB oracle can replay the numbers bit-for-bit from the generative
fixture formula (same discipline as ``dhash_kernel``).

Supported: PCM (format tag 1), 8-bit unsigned and 16-bit signed
little-endian, any channel count (features run over the interleaved
stream, documented below).
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode integer samples to a canonical RIFF/WAVE byte string.

    ``samples``: int array, shape (n,) mono or (n, channels) interleaved
    on encode. 16-bit expects values in [-32768, 32767]; 8-bit expects
    [0, 255] (WAV 8-bit is unsigned by spec). Raises ValueError on
    out-of-range values rather than silently wrapping.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got ndim={arr.ndim}")
    n, channels = arr.shape
    if bits == 16:
        if arr.min(initial=0) < -32768 or arr.max(initial=0) > 32767:
            raise ValueError("16-bit samples out of range")
        payload = arr.astype("<i2").tobytes()
    elif bits == 8:
        if arr.min(initial=0) < 0 or arr.max(initial=0) > 255:
            raise ValueError("8-bit samples out of range (unsigned)")
        payload = arr.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")

    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", _FMT_PCM, channels, sample_rate, byte_rate, block_align, bits
    )
    data = payload + (b"\x00" if len(payload) % 2 else b"")
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(payload: bytes) -> tuple:
    """Parse RIFF/WAVE bytes → (samples int32 (n, channels), sample_rate, bits).

    Real chunk-list walk: tolerates extra chunks (LIST/INFO/cue) before or
    after ``data``, honours the pad byte after odd-sized chunks, and
    validates fmt-before-data ordering. 8-bit samples are returned as the
    raw unsigned values RE-CENTERED to signed (v - 128) so downstream
    feature math treats both depths uniformly around zero.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_len = struct.unpack_from("<I", payload, 4)[0]
    end = min(len(payload), 8 + riff_len)

    fmt_info = None
    data = None
    pos = 12
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        body_start = pos + 8
        body_end = body_start + clen
        if body_end > end:
            raise ValueError(f"chunk {cid!r} overruns container")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", payload, body_start
            )
            if tag != _FMT_PCM:
                raise ValueError(f"unsupported WAV format tag {tag}")
            if channels < 1:
                raise ValueError("zero channels")
            fmt_info = (channels, rate, bits)
        elif cid == b"data":
            if fmt_info is None:
                raise ValueError("data chunk before fmt chunk")
            data = payload[body_start:body_end]
        pos = body_end + (body_end % 2)  # odd chunks are padded to even

    if fmt_info is None or data is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate, bits = fmt_info
    if bits == 16:
        usable = len(data) - len(data) % (2 * channels)
        flat = np.frombuffer(data[:usable], dtype="<i2").astype(np.int32)
    elif bits == 8:
        usable = len(data) - len(data) % channels
        flat = np.frombuffer(data[:usable], dtype=np.uint8).astype(np.int32) - 128
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return flat.reshape(-1, channels), rate, bits


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Integer-exact features over the INTERLEAVED sample stream.

    Running the stats over the flattened interleave (not per-channel)
    keeps the math one pass and exactly replayable in SQL regardless of
    channel count; per-channel analysis belongs to a downstream operator.

    - duration_ms: frames * 1000 // rate (floor division, exact)
    - peak_abs:    max |s|
    - abs_sum:     Σ |s|              (int64, no overflow below ~2^48 frames)
    - zero_crossings: count of i>0 where sign class changes, with the
      class boundary fixed at "negative vs non-negative" (s < 0) so zero
      samples are deterministic, not ambiguous.
    """
    arr = np.asarray(samples)
    frames = arr.shape[0] if arr.ndim == 2 else len(arr)
    flat = arr.reshape(-1).astype(np.int64)
    if len(flat) == 0:
        return {
            "n_frames": 0,
            "duration_ms": 0,
            "peak_abs": 0,
            "abs_sum": 0,
            "zero_crossings": 0,
        }
    neg = flat < 0
    return {
        "n_frames": int(frames),
        "duration_ms": int(frames * 1000 // sample_rate),
        "peak_abs": int(np.abs(flat).max()),
        "abs_sum": int(np.abs(flat).sum()),
        "zero_crossings": int(np.count_nonzero(neg[1:] != neg[:-1])),
    }
