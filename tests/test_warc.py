"""WARC segmentation tests: round trip, truncation, gzip members,
multi-record order, and malformed-header recovery.  The golden field
check is the generative-formula oracle in check_correctness
(`warc_segment`); these tests drive the paths the oracle can't reach."""

from __future__ import annotations

import hashlib
import zlib

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.sources import warc as WARC
from unified_ocr_pipeline_spark.sources.warc import _parse_blob


def _rec(uri: str, payload: bytes, wtype: str = "response") -> bytes:
    return (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {wtype}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
        + payload
        + b"\r\n\r\n"
    )


def test_parse_blob_multi_record_order():
    blob = _rec("http://a/", b"AAA") + _rec("http://b/", b"") + _rec(
        "http://c/", b"C" * 100
    )
    rows = _parse_blob(blob)
    assert [(r[0], r[2], r[4]) for r in rows] == [
        (0, "http://a/", 3),
        (1, "http://b/", 0),
        (2, "http://c/", 100),
    ]
    assert rows[0][5] == b"AAA" and rows[1][5] == b"" and rows[2][5] == b"C" * 100


def test_parse_blob_truncated_tail():
    full = _rec("http://a/", b"AAAA")
    cut = full + _rec("http://b/", b"B" * 50)[:-30]  # body ends early
    rows = _parse_blob(cut)
    assert rows[0][1] == "response" and rows[0][5] == b"AAAA"
    assert rows[1][1] == "truncated" and rows[1][5] is None
    # header itself cut off mid-line
    rows2 = _parse_blob(full + b"WARC/1.0\r\nWARC-Type: resp")
    assert rows2[-1][1] == "truncated"


def test_parse_blob_bad_content_length_is_truncated():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\nContent-Length: nope\r\n\r\nbody"
    )
    rows = _parse_blob(bad)
    assert rows == [(0, "truncated", "http://x/", None, None, None)]


def test_parse_blob_negative_content_length_terminates():
    """Content-Length: -100 must yield a truncated row, not move the
    cursor backward and re-parse the same record forever."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\nContent-Length: -100\r\n\r\nbody"
    )
    rows = _parse_blob(bad)
    assert rows == [(0, "truncated", "http://x/", None, -100, None)]


def test_parse_blob_payload_containing_warc_magic():
    # a payload that embeds the record head must not be split:
    # Content-Length governs, not the magic
    inner = b"xx WARC/1.0\r\n fake \r\n\r\n yy"
    blob = _rec("http://a/", inner) + _rec("http://b/", b"tail")
    rows = _parse_blob(blob)
    assert len(rows) == 2
    assert rows[0][5] == inner and rows[1][5] == b"tail"


def test_parse_warc_records_dataframe_roundtrip(spark):
    payloads = {0: b"alpha body", 1: b"", 2: b"\x00\x01\xffbinary"}
    blob = b"".join(_rec(f"http://d{i}/", p) for i, p in sorted(payloads.items()))
    df = spark.createDataFrame([("f1", bytearray(blob))], "fid string, blob binary")
    out = WARC.parse_warc_records(df, "blob", "fid").collect()
    assert len(out) == 3
    for r in out:
        i = r["rec_idx"]
        assert r["fid"] == "f1"
        assert r["target_uri"] == f"http://d{i}/"
        assert r["content_length"] == len(payloads[i])
        assert bytes(r["payload"]) == payloads[i]
        assert r["warc_type"] == "response"


def test_parse_warc_records_gzip_members(spark):
    body = b"compressed payload " * 10
    gz = zlib.compress(body)
    blob = _rec("http://gz/", gz) + _rec("http://bad/", b"not deflate at all!")
    df = spark.createDataFrame([("f", bytearray(blob))], "fid string, blob binary")
    out = {
        r["target_uri"]: r
        for r in WARC.parse_warc_records(df, "blob", "fid", decompress=True).collect()
    }
    assert bytes(out["http://gz/"]["payload"]) == body
    assert out["http://bad/"]["warc_type"] == "bad_gzip"
    assert out["http://bad/"]["payload"] is None


def test_warc_record_bytes_matches_python_writer(spark):
    df = spark.createDataFrame([("http://u/", "the payload")], "uri string, t string")
    blob = df.select(
        WARC.warc_record_bytes(
            F.lit("response"),
            F.col("uri"),
            F.lit("2024-01-01T00:00:00Z"),
            F.col("t").cast("binary"),
        ).alias("rec")
    ).first()["rec"]
    assert bytes(blob) == _rec("http://u/", b"the payload")
    # and it parses back to itself
    rows = _parse_blob(bytes(blob))
    assert rows[0][2] == "http://u/"
    assert hashlib.md5(rows[0][5]).hexdigest() == hashlib.md5(b"the payload").hexdigest()
