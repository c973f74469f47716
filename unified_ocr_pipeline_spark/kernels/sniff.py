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
