"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, batching, partitioning,
UDF signature — is real and tested; the actual codec step is STUBBED
(image/audio libraries are not in this container): ``decode_media`` computes
deterministic pseudo-metadata from the bytes, and ``decode_media_real`` is
the clearly-marked seam where a real decoder (PIL/ffmpeg) would plug in.

Pattern: ``mapInPandas`` with an iterator of batches — same Arrow-batched
shape as the text-extraction stage, so a real decoder inherits the engine's
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


def decode_media_real(payload: bytes) -> dict:
    """The real-decoder seam. Plug PIL/opencv/ffmpeg here on a cluster image
    that ships them."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use the deterministic stub (decode_media) for plumbing tests"
    )


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


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """df(media_id long, media binary) → MEDIA_META_SCHEMA rows.

    Column-pruned before the Python stage: only (media_id, media) cross the
    Arrow boundary.
    """
    return df.select("media_id", "media").mapInPandas(
        _decode_batches, schema=MEDIA_META_SCHEMA
    )


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
