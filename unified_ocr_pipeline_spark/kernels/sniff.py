"""Content-type sniffing from magic bytes.

Reference analog: the file-type filter that admits only ``*.pdf`` into the
pipeline (/root/reference/scripts/unified_ocr_pipeline.py:1137,1155 and
scripts/run_pipeline.sh:30). The rebuild's input is a binary column, so the
filter becomes a magic-byte sniff (SURVEY.md §2.2 P5).
"""

from __future__ import annotations

# Sniffable types emitted by this kernel.
PDF = "pdf"          # reference's native input type (PDF purchase orders)
HTML = "html"        # Common-Crawl-style web page
TEXT = "text"        # no recognizable payload; fall back to the `text` column
EMPTY = "empty"      # nothing to process

_HTML_PREFIXES = (b"<!doctype", b"<html", b"<head", b"<body", b"<?xml")


def sniff_content_type(payload: bytes | None) -> str:
    """Classify raw document bytes by magic prefix.

    ``%PDF`` → pdf (covers both real PDFs and this repo's deterministic
    PDF-SYN layout payloads, which share the prefix on purpose so the sniff
    rule matches the reference's admission rule); leading ``<`` markup → html;
    otherwise text/empty.
    """
    if not payload:
        return EMPTY
    if payload[:4] == b"%PDF":
        return PDF
    head = payload[:256].lstrip()
    low = head[:16].lower()
    for p in _HTML_PREFIXES:
        if low.startswith(p):
            return HTML
    if head[:1] == b"<":
        return HTML
    return TEXT


# ---------------------------------------------------------------------------
# Charset detection / transcoding (crawl payloads arrive as bytes in
# whatever encoding the origin server chose; everything downstream wants
# one canonical utf-8 text column)
# ---------------------------------------------------------------------------

_BOM_UTF8 = b"\xef\xbb\xbf"
_BOM_UTF16_LE = b"\xff\xfe"
_BOM_UTF16_BE = b"\xfe\xff"


def detect_charset(payload: bytes | None) -> tuple[str, str | None]:
    """(charset_name, decoded_text) for raw crawl bytes.

    Deterministic detection ladder (the standard crawler heuristic,
    cf. WHATWG encoding sniffing minus the <meta> scan):

    1. UTF-16 LE/BE BOM → utf-16le / utf-16be;
    2. UTF-8 BOM → utf-8-sig (BOM stripped from the text);
    3. strict UTF-8 decode succeeds → ascii when every byte < 0x80,
       else utf-8;
    4. otherwise latin-1 (total: every byte sequence decodes, the
       classic fallback — mojibake is the caller's quality gate's
       problem, not a task failure).

    Returns ``("empty", None)`` for None/zero-length payloads.
    """
    if not payload:
        return "empty", None
    if payload[:2] == _BOM_UTF16_LE:
        return "utf-16le", payload[2:].decode("utf-16-le", "replace")
    if payload[:2] == _BOM_UTF16_BE:
        return "utf-16be", payload[2:].decode("utf-16-be", "replace")
    if payload[:3] == _BOM_UTF8:
        return "utf-8-sig", payload[3:].decode("utf-8", "replace")
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return "latin-1", payload.decode("latin-1")
    return ("ascii" if all(b < 0x80 for b in payload) else "utf-8"), text
