"""WET/WAT derivation tests: the WARC → HTTP → extract composition
(`sources/derivatives.py`).  The golden field check is the generative-
formula oracle in check_correctness (`wet_wat_derive`); these tests
drive routing, charset, and malformed paths the oracle formula keeps
simple."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.sources import derivatives as DER


def _http(status: int, reason: str, ctype: str, body: bytes,
          location: str | None = None) -> bytes:
    loc = f"Location: {location}\r\n" if location else ""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {ctype}\r\n{loc}"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("latin-1") + body


def _warc(uri: str, payload: bytes, wtype: str = "response") -> bytes:
    return (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {wtype}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n" + payload + b"\r\n\r\n"
    )


PARA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
HTML = (
    "<html><head><title>The Title</title></head><body>"
    f"<p>{PARA}</p>"
    '<nav><a href="http://x.example.com/a">x</a>'
    '<a href="https://y.example.com/b">y</a></nav>'
    "</body></html>"
)


@pytest.fixture(scope="module")
def derived(spark):
    blob = (
        _warc("http://plain/", _http(200, "OK", "text/plain", b"plain body text"))
        + _warc("http://html/", _http(200, "OK", "text/html; charset=utf-8",
                                      HTML.encode()))
        + _warc("http://latin/", _http(200, "OK", "text/plain",
                                       "caf\xe9".encode("latin-1")))
        + _warc("http://redir/", _http(301, "Moved", "text/html", b"",
                                       location="https://next.example.com/"))
        + _warc("http://pdf/", _http(200, "OK", "application/pdf", b"%PDF-1.4 x"))
        + _warc("http://garbage/", b"NOT AN HTTP MESSAGE AT ALL")
        + _warc("http://meta/", _http(200, "OK", "text/html", HTML.encode()),
                wtype="metadata")
    )
    blobs = spark.createDataFrame([(1, blob)], "file_id int, blob binary")
    out = DER.derive_wet_wat(blobs, "blob", "file_id")
    return {r.target_uri: r for r in out.collect()}


def test_metadata_records_excluded(derived):
    # the WARC metadata record never reaches the derivation
    assert set(derived) == {
        "http://plain/", "http://html/", "http://latin/", "http://redir/",
        "http://pdf/", "http://garbage/",
    }


def test_plain_text_roundtrip(derived):
    r = derived["http://plain/"]
    assert (r.kind, r.charset, r.text) == ("text", "ascii", "plain body text")
    assert r.title is None and r.n_links is None


def test_html_wet_and_wat(derived):
    r = derived["http://html/"]
    assert r.kind == "text" and r.mime == "text/html"
    assert r.text == PARA          # main-content block, nav dropped
    assert r.title == "The Title"
    assert r.n_links == 2          # but outlinks ARE collected from nav


def test_latin1_charset_ladder(derived):
    r = derived["http://latin/"]
    assert (r.charset, r.text) == ("latin-1", "caf\xe9")


def test_redirect_routing(derived):
    r = derived["http://redir/"]
    assert r.kind == "redirect"
    assert r.location == "https://next.example.com/"
    assert r.text is None and r.charset is None


def test_binary_routing(derived):
    r = derived["http://pdf/"]
    assert r.kind == "binary" and r.mime == "application/pdf"
    assert r.text is None


def test_malformed_payload(derived):
    r = derived["http://garbage/"]
    assert r.kind == "malformed"
    assert r.status is None and r.text is None


def test_no_shuffle_in_derivation(spark):
    blobs = spark.createDataFrame([(1, b"")], "file_id int, blob binary")
    plan = (
        DER.derive_wet_wat(blobs, "blob", "file_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # narrow end-to-end: scan-partition local
