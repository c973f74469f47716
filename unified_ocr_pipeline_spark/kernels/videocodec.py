"""Pure-stdlib AVI (RIFF) video container codec for uncompressed DIB frames.

Completes the multimodal trio: ``imagecodec.py`` (PNG/BMP/PPM),
``audiocodec.py`` (WAV), and now AVI video. The container walk is real —
nested LIST recursion, ``avih``/``strh``/``strf`` header validation,
``movi`` frame-chunk collection, odd-size pad bytes, an ``idx1`` index —
and the frames are real too: 8-bit uncompressed DIB with the identity
grayscale palette, BOTTOM-UP row order and 4-byte row stride exactly as
the DIB spec demands (the same stride/flip discipline as
``imagecodec.decode_bmp``). Only lossy codec decompression (MJPEG/H.264)
is out of scope — no codec library exists in this container, and unlike
container parsing it cannot be reimplemented deterministically from
stdlib. Reference analog: the media seam at
/root/reference/scripts/unified_ocr_pipeline.py:168-174.

Everything downstream is integer-exact so the DuckDB oracle can replay
frame statistics from a generative fixture formula.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIIF_KEYFRAME = 0x10


def _chunk(tag: bytes, body: bytes) -> bytes:
    assert len(tag) == 4
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _dib_rows(frame: np.ndarray) -> bytes:
    """(h, w) uint8 → bottom-up rows, each padded to a 4-byte boundary."""
    h, w = frame.shape
    stride = (w + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):
        row = frame[r].tobytes()
        rows.append(row + b"\x00" * (stride - w))
    return b"".join(rows)


def encode_avi(frames, fps: int = 15) -> bytes:
    """Encode a list/array of (h, w) uint8 frames as an AVI with 8-bit
    uncompressed DIB video and the identity grayscale palette.

    All frames must share one shape. Emits avih + strl(strh, strf+palette)
    headers, a movi LIST of ``00db`` chunks, and a real idx1 index (every
    frame keyframed — uncompressed DIB has no delta frames).
    """
    arr = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not arr:
        raise ValueError("need at least one frame")
    h, w = arr[0].shape
    if any(f.shape != (h, w) for f in arr):
        raise ValueError("all frames must share one shape")
    if fps < 1:
        raise ValueError("fps must be >= 1")
    stride = (w + 3) & ~3
    frame_bytes = stride * h

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,      # microseconds per frame
        frame_bytes * fps,     # max bytes/sec
        0,                     # padding granularity
        0x10,                  # AVIF_HASINDEX
        len(arr),              # total frames
        0,                     # initial frames
        1,                     # streams
        frame_bytes,           # suggested buffer
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ",
        0, 0, 0, 0,
        1, fps,                # scale, rate → rate/scale fps
        0, len(arr),
        frame_bytes,
        0xFFFFFFFF,            # quality: default
        frame_bytes,           # sample size (uncompressed: 1 frame)
        0, 0, w, h,            # rcFrame
    )
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    strf = (
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_bytes, 0, 0, 256, 256)
        + palette
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_entries = []
    idx_entries = []
    offset = 4  # idx1 offsets count from the start of the movi LIST body ('movi')
    for f in arr:
        body = _dib_rows(f)
        movi_entries.append(_chunk(b"00db", body))
        idx_entries.append(struct.pack("<4sIII", b"00db", _AVIIF_KEYFRAME, offset, len(body)))
        offset += 8 + len(body) + (len(body) % 2)
    movi = _list(b"movi", b"".join(movi_entries))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(payload: bytes, pos: int, end: int):
    """Yield (tag, list_kind_or_None, body_start, body_end) walking one
    chunk level; honours the odd-size pad byte."""
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        body_start = pos + 8
        body_end = body_start + clen
        if body_end > end:
            raise ValueError(f"chunk {tag!r} overruns container")
        if tag == b"LIST":
            if clen < 4:
                raise ValueError("LIST chunk too short")
            yield tag, payload[body_start:body_start + 4], body_start + 4, body_end
        else:
            yield tag, None, body_start, body_end
        pos = body_end + (body_end % 2)


def decode_avi(payload: bytes) -> tuple:
    """Parse AVI bytes → (frames uint8 (n, h, w), fps, meta dict).

    Real container walk: finds hdrl/strl inside nested LISTs, validates
    the video stream is uncompressed 8-bit DIB (``BI_RGB``), collects
    ``00db``/``00dc`` chunks from the movi LIST in order, and undoes the
    bottom-up padded-row DIB layout. meta carries total_frames as
    declared by avih (cross-checked against the movi chunk count).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_len = struct.unpack_from("<I", payload, 4)[0]
    end = min(len(payload), 8 + riff_len)

    avih = None
    strf = None
    fps = None
    frame_blobs = []

    def walk(pos, stop):
        nonlocal avih, strf, fps
        for tag, kind, bstart, bend in _walk_chunks(payload, pos, stop):
            if tag == b"LIST":
                walk(bstart, bend)
            elif tag == b"avih":
                if bend - bstart < 40:
                    raise ValueError("avih too short")
                avih = struct.unpack_from("<IIIIIIIIII", payload, bstart)
            elif tag == b"strh":
                fcc_type, _h, _f, _p, _l, _i, scale, rate = struct.unpack_from(
                    "<4s4sIHHIII", payload, bstart
                )
                if fcc_type == b"vids":
                    if scale == 0 or rate % scale:
                        raise ValueError("non-integer fps")
                    fps = rate // scale
            elif tag == b"strf" and strf is None:
                if bend - bstart < 40:
                    raise ValueError("strf too short")
                strf = struct.unpack_from("<IiiHHIIiiII", payload, bstart)
            elif tag in (b"00db", b"00dc"):
                frame_blobs.append(payload[bstart:bend])

    walk(12, end)

    if avih is None or strf is None or fps is None:
        raise ValueError("missing avih/strh/strf headers")
    _size, w, h, planes, bits, compression = strf[0], strf[1], strf[2], strf[3], strf[4], strf[5]
    if compression != 0 or bits != 8 or planes != 1:
        raise ValueError(
            f"unsupported DIB (bits={bits} compression={compression}) — only "
            "uncompressed 8-bit frames decodable without a codec library"
        )
    if h < 0:  # negative height = top-down DIB (legal, rare)
        h, top_down = -h, True
    else:
        top_down = False
    stride = (w + 3) & ~3
    if avih[4] != len(frame_blobs):
        raise ValueError(
            f"avih declares {avih[4]} frames but movi carries {len(frame_blobs)}"
        )

    frames = np.empty((len(frame_blobs), h, w), dtype=np.uint8)
    for i, blob in enumerate(frame_blobs):
        if len(blob) < stride * h:
            raise ValueError(f"frame {i} truncated")
        grid = np.frombuffer(blob[: stride * h], dtype=np.uint8).reshape(h, stride)[:, :w]
        frames[i] = grid if top_down else grid[::-1]
    meta = {"width": w, "height": h, "n_frames": len(frame_blobs), "fps": fps}
    return frames, fps, meta


def video_features(frames: np.ndarray, fps: int, frame_stride: int = 1) -> dict:
    """Integer-exact statistics over every ``frame_stride``-th frame.

    - duration_ms: n_frames * 1000 // fps (floor, exact)
    - sampled px_sum: Σ pixel over frames 0, stride, 2*stride, …
    - motion_sum: Σ |frame[k] - frame[k-stride]| over consecutive SAMPLED
      frames — the standard cheap scene-change signal, exact in int64.
    """
    n = len(frames)
    sampled = frames[::frame_stride].astype(np.int64)
    motion = (
        int(np.abs(sampled[1:] - sampled[:-1]).sum()) if len(sampled) > 1 else 0
    )
    return {
        "n_frames": int(n),
        "n_sampled": int(len(sampled)),
        "duration_ms": int(n * 1000 // fps),
        "px_sum_sampled": int(sampled.sum()),
        "motion_sum": motion,
    }
