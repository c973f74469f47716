"""HTTP response-layer parse + redirect-chain resolution tests.

The golden field check is the generative-formula oracle in
check_correctness (`http_parse`, `redirect_chains`); these tests drive
the malformed/adversarial paths the oracle can't reach: garbage
payloads, case-twisted headers, missing separators, cycles, hop caps,
and the no-Python / no-shuffle plan contract of the parser.
"""

from __future__ import annotations

import hashlib
import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.functions import http as HTTP
from unified_ocr_pipeline_spark.operators.redirects import resolve_redirects


def _parse_one(spark, payload: bytes) -> dict:
    df = spark.createDataFrame([(payload,)], "payload binary")
    row = df.select(*HTTP.parse_http_response(F.col("payload"))).collect()[0]
    return row.asDict()


def test_parse_full_response_byte_exact_body(spark):
    body = b"hello \xff\x00 world"  # non-utf8 bytes must survive untouched
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"cOnTeNt-TyPe: text/HTML; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    got = _parse_one(spark, payload)
    assert got["http_version"] == "1.1"
    assert got["status"] == 200
    assert got["mime"] == "text/html"
    assert got["charset"] == "utf-8"
    assert got["location"] is None
    assert got["declared_length"] == len(body)
    assert bytes(got["body"]) == body


def test_parse_redirect_location_and_trailing_ws(spark):
    payload = (
        b"HTTP/1.0 302 Found\r\n"
        b"Location:   https://x.example.com/a  \r\n"
        b"Content-Type: text/plain\r\n\r\n"
    )
    got = _parse_one(spark, payload)
    assert got["status"] == 302
    assert got["location"] == "https://x.example.com/a"
    assert got["charset"] is None
    assert bytes(got["body"]) == b""


def test_parse_garbage_payload_all_null(spark):
    got = _parse_one(spark, b"<html>not http at all</html>")
    assert all(
        got[k] is None
        for k in ("http_version", "status", "mime", "charset", "location",
                  "declared_length")
    )


def test_parse_missing_separator_null_body_status_kept(spark):
    got = _parse_one(spark, b"HTTP/1.1 500 Oops\r\nX: y")
    assert got["status"] == 500
    assert got["body"] is None


def test_parse_bad_declared_length_is_null_not_ansi_error(spark):
    got = _parse_one(spark, b"HTTP/1.1 200 OK\r\nContent-Length: xyz\r\n\r\nb")
    assert got["declared_length"] is None
    assert bytes(got["body"]) == b"b"


def test_parse_header_name_inside_value_not_matched(spark):
    # 'Location:' appearing inside another header's VALUE must not match
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"X-Note: see Location: http://evil/\r\n\r\n"
    )
    assert _parse_one(spark, payload)["location"] is None


def test_parser_plan_no_python_no_exchange(spark):
    df = spark.range(8).select(
        F.concat(
            F.lit("HTTP/1.1 200 OK\r\nContent-Type: t/x\r\n\r\nb"),
            F.col("id").cast("string"),
        ).cast("binary").alias("payload")
    )
    out = df.select(*HTTP.parse_http_response(F.col("payload")))
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_response_bytes_round_trip_md5(spark):
    # write side -> parse side closes on itself, md5-exact
    body = "päyload".encode()
    df = spark.range(1).select(
        HTTP.http_response_bytes(
            F.lit(301), F.lit("Moved Permanently"),
            F.lit("text/html; charset=UTF-8"),
            F.lit("http://next/"), F.lit(body),
        ).alias("payload")
    )
    got = df.select(
        *HTTP.parse_http_response(F.col("payload"))
    ).collect()[0].asDict()
    assert got["status"] == 301
    assert got["location"] == "http://next/"
    assert got["declared_length"] == len(body)
    assert hashlib.md5(bytes(got["body"])).hexdigest() == hashlib.md5(body).hexdigest()


def _resolve(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["src"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(e, "src", "dst", **kw).collect()
    }


def test_resolve_plain_chain(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, True), "b": ("d", 2, True), "c": ("d", 1, True)
    }


def test_resolve_cycle_and_self_loop_unresolved(spark):
    got = _resolve(spark, [("a", "b"), ("b", "a"), ("s", "s"), ("x", "y")])
    assert got["a"] == (None, None, False)
    assert got["b"] == (None, None, False)
    assert got["s"] == (None, None, False)
    assert got["x"] == ("y", 1, True)


def test_resolve_hop_cap_gives_up(spark):
    # chain of 3 hops with cap 2: head is over-cap, tail still resolves
    got = _resolve(
        spark, [("a", "b"), ("b", "c"), ("c", "d")], max_hops=2
    )
    assert got["a"] == (None, None, False)
    assert got["b"] == ("d", 2, True)
    assert got["c"] == ("d", 1, True)


def test_resolve_duplicate_src_min_dst_wins(spark):
    got = _resolve(spark, [("a", "z"), ("a", "m")])
    assert got == {"a": ("m", 1, True)}


def test_resolve_rejects_non_power_of_two_cap(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        resolve_redirects(e, "src", "dst", max_hops=5)
