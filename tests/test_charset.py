"""Charset detection ladder tests (BOMs, strict utf-8, latin-1 fallback,
replace-on-mangled-utf16) — the end-to-end golden check is the formula
oracle (`charset_transcode`)."""

from __future__ import annotations

from unified_ocr_pipeline_spark.kernels.sniff import detect_charset
from unified_ocr_pipeline_spark.sources import transcode as TC


def test_detect_ladder():
    assert detect_charset(None) == ("empty", None)
    assert detect_charset(b"") == ("empty", None)
    assert detect_charset(b"plain ascii") == ("ascii", "plain ascii")
    assert detect_charset("héllo".encode()) == ("utf-8", "héllo")
    assert detect_charset(b"\xef\xbb\xbfbom text") == ("utf-8-sig", "bom text")
    assert detect_charset(b"\xff\xfe" + "ab".encode("utf-16-le")) == (
        "utf-16le",
        "ab",
    )
    assert detect_charset(b"\xfe\xff" + "ab".encode("utf-16-be")) == (
        "utf-16be",
        "ab",
    )
    # bare 0xE9 is invalid utf-8 → latin-1 total fallback
    assert detect_charset(b"caf\xe9") == ("latin-1", "café")
    # overlong / truncated multibyte also falls back, never raises
    cs, text = detect_charset(b"ok \xc3")
    assert cs == "latin-1" and text == "ok Ã"


def test_detect_mangled_utf16_replaces_not_raises():
    cs, text = detect_charset(b"\xff\xfeodd")  # odd byte count after BOM
    assert cs == "utf-16le" and text is not None


def test_transcode_dataframe(spark):
    rows = [
        (0, b"ascii only"),
        (1, "snowman ☃".encode()),
        (2, b"caf\xe9"),
        (3, None),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None) for i, p in rows],
        "id long, payload binary",
    )
    got = {
        r["id"]: (r["charset"], r["text"])
        for r in TC.transcode_payloads(df, "payload", "id").collect()
    }
    assert got[0] == ("ascii", "ascii only")
    assert got[1] == ("utf-8", "snowman ☃")
    assert got[2] == ("latin-1", "café")
    assert got[3] == ("empty", None)
