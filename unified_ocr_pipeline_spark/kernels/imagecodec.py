"""Pure-stdlib image codecs + the reference's OCR preprocess chain in NumPy.

Closes the G1/G2 codec seam (`operators/multimodal.py`) without adding
dependencies: PNG is parsed with ``zlib``/``struct``/``binascii`` only, BMP
and PPM/PGM with ``struct``/NumPy. Everything is deterministic, so decoded
dimensions and pixel statistics can sit behind the DuckDB oracle when the
image content itself is generated from table columns.

The preprocess chain reimplements the reference's `_enhance_image_for_ocr`
(ref scripts/unified_ocr_pipeline.py:643-699) as pure NumPy column kernels,
per the north star ("the repo's OCR-zone heuristics reimplemented as
pure-Python-on-Arrow column kernels"):

  grayscale → contrast ×1.5 → sharpness ×2.0 → denoise → adaptive
  threshold (block 11, C=2) → morphological close with a 1×1 kernel

Documented substitutions (the reference leans on PIL/OpenCV internals that
are not bit-specified): PIL ``ImageEnhance`` semantics are reproduced
exactly (interpolate against the mean-gray / smooth image); OpenCV
``fastNlMeansDenoising`` is replaced by a 3×3 median filter (same role:
salt-and-pepper suppression before thresholding); ``adaptiveThreshold``
uses the documented Gaussian-weighted local mean. The reference's closing
kernel is ``np.ones((1,1))`` — a no-op — and is reproduced as such.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", binascii.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to one unfiltered scanline (encode side)."""
    r = row.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int32)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        out = r - pred
    else:  # pragma: no cover - encoder only emits 0-4
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8).tobytes()


def _unfilter_row(ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse one scanline's filter (decode side). Filters 1/3/4 carry a
    left-dependency, so they run as a per-pixel loop over the (short) row;
    0/2 stay vectorized. uint8 wraparound is the spec's mod-256."""
    if ftype == 0:
        return raw.copy()
    if ftype == 2:
        return raw + prev  # uint8 wraps mod 256
    out = np.zeros_like(raw)
    n = raw.shape[0]
    for i in range(n):
        a = int(out[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        x = int(raw[i])
        if ftype == 1:
            out[i] = (x + a) % 256
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) % 256
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (x + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def encode_png(img: np.ndarray, filter_mode: str = "none") -> bytes:
    """Encode an 8-bit image (H×W gray, or H×W×{2,3,4}) as a valid PNG.

    ``filter_mode``: 'none' filters every row with 0; 'cycle' filters row r
    with ``r % 5`` (exercises every unfilter path on decode).
    """
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        ch = arr.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    flat = arr.reshape(h, w * ch)
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        ftype = (r % 5) if filter_mode == "cycle" else 0
        raw.append(ftype)
        raw += _filter_row(ftype, flat[r], prev, bpp)
        prev = flat[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (color types 0/2/4/6) to uint8
    H×W (gray) or H×W×C."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        expect = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if binascii.crc32(tag + body) & 0xFFFFFFFF != expect:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth={depth} color_type={color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _PNG_CHANNELS[color_type]
    plain = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(plain) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    buf = np.frombuffer(plain, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        prev = _unfilter_row(int(buf[r, 0]), buf[r, 1:], prev, ch)
        out[r] = prev
    return out if ch == 1 else out.reshape(h, w, ch)


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER, bottom-up)
# ---------------------------------------------------------------------------

def encode_bmp24(img: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp24 wants H×W×3 RGB")
    h, w = arr.shape[:2]
    pad = (-(w * 3)) % 4
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        rows += arr[r, :, ::-1].tobytes()  # RGB→BGR
        rows += b"\x00" * pad
    pixels = bytes(rows)
    header_size = 14 + 40
    bmp_header = struct.pack("<2sIHHI", b"BM", header_size + len(pixels), 0, 0, header_size)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return bmp_header + dib + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    dib_size, w, h_signed = struct.unpack("<Iii", data[14:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if dib_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    px = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR→RGB


# ---------------------------------------------------------------------------
# PPM / PGM (binary P6 / P5, maxval ≤ 255)
# ---------------------------------------------------------------------------

def encode_pnm(img: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        magic, h, w = b"P5", *arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic, (h, w) = b"P6", arr.shape[:2]
    else:
        raise ValueError(f"unsupported PNM shape {arr.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_pnm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    # header: magic, whitespace-separated w h maxval (comments '#…' allowed),
    # exactly one whitespace byte before pixel data
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 1 if magic == b"P5" else 3
    px = np.frombuffer(data, dtype=np.uint8, count=h * w * ch, offset=pos)
    return px.reshape(h, w) if ch == 1 else px.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def decode_image(payload: bytes):
    """Sniff magic bytes and decode. Returns (uint8 array, format string)."""
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload), "png"
    if payload[:2] == b"BM":
        return decode_bmp(payload), "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return decode_pnm(payload), "pnm"
    raise ValueError("unknown image format")


# ---------------------------------------------------------------------------
# the reference's OCR preprocess chain (ref unified_ocr_pipeline.py:643-699)
# ---------------------------------------------------------------------------

def to_grayscale(img: np.ndarray) -> np.ndarray:
    """PIL convert('L') luma: L = (299R + 587G + 114B) / 1000, truncated."""
    if img.ndim == 2:
        return img.astype(np.uint8)
    rgb = img[:, :, :3].astype(np.uint32)
    return ((rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000).astype(
        np.uint8
    )


def enhance_contrast(gray: np.ndarray, factor: float = 1.5) -> np.ndarray:
    """PIL ImageEnhance.Contrast: blend toward the mean-gray constant image
    (degenerate = solid int(round(mean+0.5-eps)) — PIL uses int(mean + 0.5)).
    out = degenerate + factor * (img - degenerate), clipped to [0,255]."""
    mean = int(np.mean(gray) + 0.5)
    out = mean + factor * (gray.astype(np.float64) - mean)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _box3(gray_f: np.ndarray) -> np.ndarray:
    """3×3 box mean with edge replication (PIL SMOOTH-style support)."""
    p = np.pad(gray_f, 1, mode="edge")
    return (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) / 9.0


def enhance_sharpness(gray: np.ndarray, factor: float = 2.0) -> np.ndarray:
    """PIL ImageEnhance.Sharpness: blend AWAY from the smoothed image
    (factor > 1 ⇒ unsharp): out = smooth + factor * (img - smooth)."""
    g = gray.astype(np.float64)
    sm = _box3(g)
    return np.clip(np.round(sm + factor * (g - sm)), 0, 255).astype(np.uint8)


def median_denoise3(gray: np.ndarray) -> np.ndarray:
    """Deterministic stand-in for cv2.fastNlMeansDenoising: 3×3 median
    (documented substitution — same role, spec'd math)."""
    p = np.pad(gray, 1, mode="edge")
    stack = np.stack(
        [p[r : r + gray.shape[0], c : c + gray.shape[1]] for r in range(3) for c in range(3)]
    )
    return np.median(stack, axis=0).astype(np.uint8)


def _gaussian_kernel1d(n: int) -> np.ndarray:
    """OpenCV getGaussianKernel for odd n: sigma = 0.3*((n-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((n - 1) * 0.5 - 1) + 0.8
    x = np.arange(n, dtype=np.float64) - (n - 1) / 2
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return k / k.sum()


def adaptive_threshold_gaussian(
    gray: np.ndarray, block: int = 11, c: float = 2.0, maxval: int = 255
) -> np.ndarray:
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C, THRESH_BINARY):
    pixel > (gaussian-weighted local mean − C) → maxval else 0. Separable
    convolution with edge replication (OpenCV BORDER_REPLICATE)."""
    k = _gaussian_kernel1d(block)
    half = block // 2
    g = gray.astype(np.float64)
    p = np.pad(g, ((half, half), (0, 0)), mode="edge")
    rows = sum(k[i] * p[i : i + g.shape[0], :] for i in range(block))
    p2 = np.pad(rows, ((0, 0), (half, half)), mode="edge")
    local = sum(k[j] * p2[:, j : j + g.shape[1]] for j in range(block))
    return np.where(g > local - c, maxval, 0).astype(np.uint8)


def morph_close(binary: np.ndarray, ksize: int = 1) -> np.ndarray:
    """cv2.morphologyEx(MORPH_CLOSE, ones((k,k))). The reference uses k=1,
    which is the identity — reproduced faithfully; k>1 does a real
    dilate-then-erode with max/min filters."""
    if ksize <= 1:
        return binary.copy()
    half = ksize // 2

    def _filt(img, fn):
        p = np.pad(img, half, mode="edge")
        views = [
            p[r : r + img.shape[0], c : c + img.shape[1]]
            for r in range(ksize)
            for c in range(ksize)
        ]
        return fn(np.stack(views), axis=0)

    return _filt(_filt(binary, np.max), np.min).astype(np.uint8)


def enhance_for_ocr(img: np.ndarray) -> np.ndarray:
    """The full reference chain (ref unified_ocr_pipeline.py:643-699):
    grayscale → contrast ×1.5 → sharpness ×2.0 → denoise → adaptive
    Gaussian threshold (11, 2) → 1×1 close (identity)."""
    g = to_grayscale(img)
    g = enhance_contrast(g, 1.5)
    g = enhance_sharpness(g, 2.0)
    g = median_denoise3(g)
    b = adaptive_threshold_gaussian(g, 11, 2.0)
    return morph_close(b, 1)
