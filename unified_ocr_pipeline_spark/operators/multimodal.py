"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct. The IMAGE path is fully real: ``decode_media_real`` parses
PNG/BMP/PPM bytes with the pure-stdlib codecs in ``kernels/imagecodec.py``
(zlib inflate, scanline unfiltering, BMP stride/BGR handling) and reports
true dimensions plus pixel statistics, and ``enhance_for_ocr`` reproduces
the reference's preprocess chain (ref scripts/unified_ocr_pipeline.py:
643-699). The AUDIO path is also fully real: ``extract_audio_metadata``
parses RIFF/WAV containers with ``kernels/audiocodec.py`` (chunk-list
walk, PCM 8/16-bit, integer-exact features). The VIDEO path is real at
the container level: ``extract_video_metadata`` / ``sample_frames_real``
parse AVI (nested LIST walk, avih/strh/strf, bottom-up padded DIB rows)
via ``kernels/videocodec.py``. Only lossy codec DECOMPRESSION
(MJPEG/H.264) stays out of scope — no codec library in this container —
so the legacy ``decode_media`` / ``sample_frames`` stubs remain for
opaque compressed payloads; their math is replayable in the DuckDB
oracle.

Pattern: ``mapInPandas`` with an iterator of batches — same Arrow-batched
shape as the text-extraction stage, so the decoders inherit the engine's
scale characteristics (one JVM↔Python crossing per batch, column-pruned
input, spill-safe partitioning).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content_sha256", T.StringType()),
    ]
)


REAL_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def decode_media_real(payload: bytes) -> dict:
    """REAL image decode (PNG/BMP/PPM via kernels/imagecodec.py — stdlib
    zlib/struct + NumPy only): true width/height from the pixel grid, pixel
    sum over the grayscale plane. Raises ValueError on non-image bytes;
    audio/video stay on the deterministic stub (decode_media)."""
    from unified_ocr_pipeline_spark.kernels import imagecodec as IC

    arr, fmt = IC.decode_image(bytes(payload))
    gray = IC.to_grayscale(arr)
    return {
        "n_bytes": len(payload),
        "format": fmt,
        "width": int(gray.shape[1]),
        "height": int(gray.shape[0]),
        "n_pixels": int(gray.size),
        "px_sum": int(gray.astype("uint64").sum()),
        "content_sha256": hashlib.sha256(payload).hexdigest(),
    }


def decode_media(payload: bytes) -> dict:
    """Deterministic stand-in decoder: sniffs a fake format from magic bytes
    and derives stable pseudo-dimensions from a content hash (sha256 — the
    one hash both this kernel and the driver's DuckDB oracle can compute,
    so the stub's math is replayable in ANSI SQL)."""
    if payload[:4] == b"\x89PNG":
        fmt = "png"
    elif payload[:3] == b"\xff\xd8\xff":
        fmt = "jpeg"
    elif payload[:4] == b"RIFF":
        fmt = "wav"
    else:
        fmt = "bin"
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return {
        "n_bytes": len(payload),
        "format": fmt,
        "width": width,
        "height": height,
        "content_sha256": hashlib.sha256(payload).hexdigest(),
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_media(bytes(p)) for p in pdf["media"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].tolist(),
                "n_bytes": [m["n_bytes"] for m in metas],
                "format": [m["format"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "content_sha256": [m["content_sha256"] for m in metas],
            }
        )


def _decode_batches_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_media_real(bytes(p)) for p in pdf["media"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].tolist(),
                "format": [m["format"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "n_pixels": [m["n_pixels"] for m in metas],
                "px_sum": [m["px_sum"] for m in metas],
            }
        )


def extract_media_metadata(df: DataFrame, real: bool = False) -> DataFrame:
    """df(media_id long, media binary) → metadata rows.

    ``real=True`` runs the actual image decoders (REAL_META_SCHEMA with true
    dimensions + pixel stats); default keeps the audio/video-safe stub
    (MEDIA_META_SCHEMA). Column-pruned before the Python stage either way:
    only (media_id, media) cross the Arrow boundary.
    """
    pruned = df.select("media_id", "media")
    if real:
        return pruned.mapInPandas(_decode_batches_real, schema=REAL_META_SCHEMA)
    return pruned.mapInPandas(_decode_batches, schema=MEDIA_META_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio decode (RIFF/WAV via kernels/audiocodec.py)
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("abs_sum", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def extract_audio_metadata(df: DataFrame) -> DataFrame:
    """df(media_id long, media binary) → real decoded audio metadata.

    The WAV container is parsed for real (chunk walk, fmt validation) and
    every feature is integer-exact (kernels/audiocodec.py), so the DuckDB
    oracle can replay the numbers from the fixture's generative formula.
    Same scale posture as the image path: decode + featurize in ONE
    column-pruned mapInPandas pass — raw media bytes never enter an
    exchange, only fixed-width stat rows leave the Python stage.
    """
    from unified_ocr_pipeline_spark.kernels import audiocodec as AC

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in AUDIO_META_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                samples, rate, bits = AC.decode_wav(bytes(payload))
                feats = AC.audio_features(samples, rate)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["channels"].append(samples.shape[1])
                out["bits"].append(bits)
                out["n_frames"].append(feats["n_frames"])
                out["duration_ms"].append(feats["duration_ms"])
                out["peak_abs"].append(feats["peak_abs"])
                out["abs_sum"].append(feats["abs_sum"])
                out["zero_crossings"].append(feats["zero_crossings"])
            yield pd.DataFrame(out)

    return df.select("media_id", "media").mapInPandas(gen, schema=AUDIO_META_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video decode (AVI/RIFF + uncompressed DIB via kernels/videocodec.py)
# ---------------------------------------------------------------------------

VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("px_sum_sampled", T.LongType()),
        T.StructField("motion_sum", T.LongType()),
    ]
)

REAL_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def extract_video_metadata(df: DataFrame, frame_stride: int = 1) -> DataFrame:
    """df(media_id long, media binary) → real decoded video metadata.

    The AVI container is parsed for real (nested LIST walk, avih/strh/strf
    validation, bottom-up padded DIB rows) and every statistic is
    integer-exact (kernels/videocodec.py), replayable by the DuckDB oracle
    from the fixture's generative formula. One column-pruned mapInPandas
    pass; raw video bytes never enter an exchange.
    """
    from unified_ocr_pipeline_spark.kernels import videocodec as VC

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in VIDEO_META_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                frames, fps, meta = VC.decode_avi(bytes(payload))
                feats = VC.video_features(frames, fps, frame_stride=frame_stride)
                out["media_id"].append(mid)
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["fps"].append(fps)
                out["n_frames"].append(feats["n_frames"])
                out["n_sampled"].append(feats["n_sampled"])
                out["duration_ms"].append(feats["duration_ms"])
                out["px_sum_sampled"].append(feats["px_sum_sampled"])
                out["motion_sum"].append(feats["motion_sum"])
            yield pd.DataFrame(out)

    return df.select("media_id", "media").mapInPandas(gen, schema=VIDEO_META_SCHEMA)


def sample_frames_real(df: DataFrame, frame_stride: int = 2) -> DataFrame:
    """REAL video frame sampling (UDTF shape): decode the AVI, keep every
    ``frame_stride``-th frame, emit one row per kept frame with its true
    pixel sum and the raw (h, w) grayscale grid re-encoded as PNG via
    kernels/imagecodec.py — so downstream image operators (dhash dedup,
    OCR preprocess) consume sampled video frames with no special casing.
    """
    from unified_ocr_pipeline_spark.kernels import imagecodec as IC
    from unified_ocr_pipeline_spark.kernels import videocodec as VC

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "px_sum": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                frames, _fps, _meta = VC.decode_avi(bytes(payload))
                for fno in range(0, len(frames), frame_stride):
                    grid = frames[fno]
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["px_sum"].append(int(grid.astype("int64").sum()))
                    out["frame"].append(IC.encode_png(grid))
            yield pd.DataFrame(out)

    return df.select("media_id", "media").mapInPandas(gen, schema=REAL_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# resize / frame-sample — same stubbed-codec, real-plumbing pattern
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_media_stub(payload: bytes, max_dim: int) -> tuple:
    """Deterministic stand-in for an image resize: clamps the pseudo
    dimensions to ``max_dim`` preserving aspect, and 'transcodes' by
    truncating the payload proportionally (so output byte counts exercise
    realistic Arrow batch shrinkage). A real implementation plugs
    PIL.Image.thumbnail here."""
    meta = decode_media(payload)
    w, h = meta["width"], meta["height"]
    scale = min(1.0, max_dim / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    keep = max(1, int(len(payload) * scale * scale))
    return payload[:keep], nw, nh


def resize_media(df: DataFrame, max_dim: int = 128) -> DataFrame:
    """df(media_id, media) → resized media + new dimensions. Column-pruned,
    Arrow-batched; the decode/encode step is the stub seam."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media": [], "width": [], "height": []}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                blob, w, h = resize_media_stub(bytes(payload), max_dim)
                out["media_id"].append(mid)
                out["media"].append(blob)
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return df.select("media_id", "media").mapInPandas(gen, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (dHash) — real decode, integer-exact hash
# ---------------------------------------------------------------------------

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def dhash_kernel(gray, grid: int = 8) -> int:
    """Difference-hash of a grayscale image, integer-exact.

    The image is partitioned into a ``grid × grid`` block mosaic by the
    index mapping ``block_row = (pixel_row * grid) // height`` (and
    likewise for columns); each bit compares horizontally adjacent block
    MEANS. To keep the hash bit-for-bit reproducible across engines the
    mean comparison is done by integer cross-multiplication —
    ``sum_l * area_r > sum_r * area_l`` — never in floating point, so a
    SQL replay (DuckDB oracle) lands on the identical 56-bit value.
    grid=8 → 7 comparisons × 8 rows = 56 bits, safely inside a signed
    64-bit long. Empty blocks (only possible when a dimension < grid)
    compare as 0-vs-0 → bit 0, deterministically.
    """
    import numpy as np

    h, w = gray.shape
    rows = (np.arange(h, dtype=np.int64) * grid) // h
    cols = (np.arange(w, dtype=np.int64) * grid) // w
    ids = (rows[:, None] * grid + cols[None, :]).ravel()
    sums = np.bincount(ids, weights=gray.astype(np.float64).ravel(),
                       minlength=grid * grid).astype(np.int64)
    areas = np.bincount(ids, minlength=grid * grid).astype(np.int64)
    s = sums.reshape(grid, grid)
    a = areas.reshape(grid, grid)
    bits = s[:, :-1] * a[:, 1:] > s[:, 1:] * a[:, :-1]
    shifts = np.arange(grid * (grid - 1), dtype=np.int64)
    return int(np.sum(bits.ravel().astype(np.int64) << shifts))


def dhash_images(df: DataFrame, grid: int = 8) -> DataFrame:
    """df(media_id, media) → (media_id, dhash): decode each image with the
    pure-stdlib codec and difference-hash it, one Arrow batch at a time.

    Scale posture: decode + hash happen in ONE column-pruned mapInPandas
    pass on the scan partitions — raw image bytes never enter an exchange;
    only (media_id, 8-byte dhash) rows leave the Python stage. Downstream
    grouping is a single hash-agg on the long key.
    """
    from unified_ocr_pipeline_spark.kernels import imagecodec as IC

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "dhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                arr, _fmt = IC.decode_image(bytes(payload))
                gray = IC.to_grayscale(arr)
                out["media_id"].append(mid)
                out["dhash"].append(dhash_kernel(gray, grid=grid))
            yield pd.DataFrame(out)

    return df.select("media_id", "media").mapInPandas(gen, schema=DHASH_SCHEMA)


def dhash_dup_groups(hashed: DataFrame, min_group: int = 2) -> DataFrame:
    """(media_id, dhash) → perceptual-duplicate groups: one row per dhash
    value shared by ≥ ``min_group`` images, with the canonical (minimum)
    id and the sorted member list. One hash-agg shuffle on the 8-byte
    dhash key; partial aggregation collapses each map task's rows first.
    """
    from pyspark.sql import functions as F

    return (
        hashed.groupBy("dhash")
        .agg(
            F.count("*").alias("n_images"),
            F.min("media_id").alias("canonical_id"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("media_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("member_ids"),
        )
        .where(F.col("n_images") >= min_group)
    )


def sample_frames(df: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """df(media_id, media) → one row per sampled 'frame' (UDTF shape: one
    input row fans out to M output rows, like video frame sampling). The
    stub cuts fixed-stride byte windows; a real implementation plugs
    ffmpeg keyframe extraction into the same batch loop — the Spark
    plumbing (explode shape, schema, batching) is identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                b = bytes(payload)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame"].append(b[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame(out)

    return df.select("media_id", "media").mapInPandas(gen, schema=FRAME_SCHEMA)
