"""WARC record segmentation — the Common-Crawl ingestion surface.

The reference pipeline ingests loose files from a watched directory
(``scripts/unified_ocr_pipeline.py:250-320``); at web scale the unit of
ingestion is instead the WARC container: multi-gigabyte files of
concatenated ``WARC/1.0`` records (warc-specifications, ISO 28500).
This module turns a DataFrame of raw WARC *blobs* into one row per
record with parsed headers and the payload — after which the rest of
the engine (sniff → extract → split) applies unchanged.

Spark-first shape: segmentation is ONE narrow ``mapInPandas`` pass over
the blob column — no shuffle, no explode through the JVM, the raw bytes
cross into Arrow once and leave as per-record slices.  At 100 TB you
point ``spark.read.format("binaryFile")`` (or an Iceberg table of
``(path, content)``) at the crawl and the per-file parallelism is the
file count; a single 1 GB WARC costs one task, which is exactly how
Common Crawl shards its dumps (~1 GB/file).  Gzip: real crawls store
member-gzipped records; the decompression seam is one ``zlib`` call per
record slice and is deliberately left to the caller (`decompress=`)
so the parser itself stays byte-deterministic.

Malformed input contract: a blob that ends mid-record yields the
complete records before the truncation plus one row with
``warc_type = 'truncated'`` and a NULL payload — resumable crawls need
the partial-tail signal, not an exception.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEAD = b"WARC/1.0\r\n"


def _parse_blob(blob: bytes) -> list[tuple]:
    """Segment one WARC blob → [(rec_idx, warc_type, target_uri,
    warc_date, content_length, payload_bytes)] with a trailing
    ``truncated`` row if the blob ends mid-record."""
    out: list[tuple] = []
    pos = 0
    idx = 0
    n = len(blob)
    while pos < n:
        start = blob.find(_HEAD, pos)
        if start < 0:
            break
        hdr_end = blob.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            out.append((idx, "truncated", None, None, None, None))
            break
        headers: dict[str, str] = {}
        for line in blob[start + len(_HEAD) : hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            clen = None
        body_start = hdr_end + 4
        # clen < 0 would move the cursor BACKWARD (pos = body_start + clen
        # lands before this record's magic), re-finding the same record
        # forever — a corrupt 'Content-Length: -100' must be a truncated
        # row, not a non-terminating task
        if clen is None or clen < 0 or body_start + clen > n:
            out.append(
                (
                    idx,
                    "truncated",
                    headers.get("warc-target-uri"),
                    headers.get("warc-date"),
                    clen,
                    None,
                )
            )
            break
        out.append(
            (
                idx,
                headers.get("warc-type", "unknown"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                clen,
                blob[body_start : body_start + clen],
            )
        )
        idx += 1
        pos = body_start + clen
    return out


def parse_warc_records(
    df: DataFrame,
    blob_col: str,
    file_col: str,
    decompress: bool = False,
) -> DataFrame:
    """One row per WARC record:
    ``(file_col, rec_idx int, warc_type string, target_uri string,
    warc_date string, content_length bigint, payload binary)``.

    ``decompress=True`` additionally inflates each record payload as a
    raw-deflate/gzip member (crawl WARCs are member-gzipped); inflate
    failures surface as ``warc_type='bad_gzip'`` with NULL payload
    rather than poisoning the task.
    """
    file_type = df.schema[file_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            files, idxs, types, uris, dates, lens, payloads = (
                [], [], [], [], [], [], [],
            )
            for fid, blob in zip(pdf[file_col], pdf[blob_col]):
                if blob is None:
                    continue
                for idx, wtype, uri, date, clen, body in _parse_blob(bytes(blob)):
                    if decompress and body is not None:
                        try:
                            body = zlib.decompress(body, wbits=47)
                        except zlib.error:
                            wtype, body = "bad_gzip", None
                    files.append(fid)
                    idxs.append(idx)
                    types.append(wtype)
                    uris.append(uri)
                    dates.append(date)
                    lens.append(clen)
                    payloads.append(body)
            yield pd.DataFrame(
                {
                    file_col: pd.Series(files),
                    "rec_idx": pd.Series(idxs, dtype="int32"),
                    "warc_type": pd.Series(types, dtype="object"),
                    "target_uri": pd.Series(uris, dtype="object"),
                    "warc_date": pd.Series(dates, dtype="object"),
                    "content_length": pd.Series(lens, dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return df.mapInPandas(
        gen,
        schema=(
            f"{file_col} {file_type}, rec_idx int, warc_type string, "
            "target_uri string, warc_date string, content_length bigint, "
            "payload binary"
        ),
    )


def warc_record_bytes(
    warc_type,
    target_uri,
    warc_date,
    payload,
):
    """JVM Column expression building one well-formed WARC/1.0 record
    from string/binary columns — the write side of the round trip (and
    the generative formula the oracle replays).  ``payload`` must be a
    binary column; headers are emitted in the fixed canonical order."""
    header = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: "), warc_type, F.lit("\r\n"),
        F.lit("WARC-Target-URI: "), target_uri, F.lit("\r\n"),
        F.lit("WARC-Date: "), warc_date, F.lit("\r\n"),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"),
        F.lit("\r\n\r\n"),
    )
    return F.concat(header.cast("binary"), payload, F.lit("\r\n\r\n").cast("binary"))
