"""HTTP response-layer Column builders: status line, headers, body.

A Common-Crawl-style ``WARC-Type: response`` record stores the FULL
HTTP message — status line, headers, CRLFCRLF, entity body (ISO 28500
§6.3.2; the reference pipeline never sees this layer because it ingests
loose files from a watched directory, ``scripts/unified_ocr_pipeline.py:
1152-1155``).  The engine's WARC segmentation (``sources/warc.py``)
yields that message as one binary ``payload`` column; this module
splits it into typed columns — HTTP version, status code, Content-Type
(→ mime + charset), Location, declared Content-Length, and the body
BYTES — entirely as JVM Column expressions inside whole-stage codegen.
No Python worker, no shuffle: at 100 TB this is a free projection on
the scan partitions.

Two decisions make it byte-exact:

- The HEAD is decoded ISO-8859-1 (every byte maps to exactly one char,
  the decode is total, and char offsets == byte offsets), capped at
  ``HEAD_CAP`` bytes the way real fetchers cap header size.  All regex
  matching happens on that string.
- The BODY is sliced from the BINARY payload with ``Column.substr`` at
  the byte offset the head's CRLFCRLF gives — no charset ever touches
  the entity bytes, so ``md5(body)`` equals the md5 of the bytes the
  server sent (transcoding is a separate, later stage:
  ``sources/transcode.py``).

Malformed-input contract (crawls are full of garbage): a payload with
no status line parses to NULL status; a head whose CRLFCRLF lies beyond
``HEAD_CAP`` (or is absent) yields a NULL body; nothing throws.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Real fetchers cap the header region (nginx large_client_header_buffers
# is 8k; curl caps at 100k) — 8 KiB covers every well-formed response
# and bounds the per-row decode work.
HEAD_CAP = 8192

_STATUS_RE = r"^HTTP/([0-9.]+) (\d{3})"


def http_head(payload: Column) -> Column:
    """First ``HEAD_CAP`` bytes decoded ISO-8859-1 (total, offset-safe)."""
    return F.decode(payload.substr(F.lit(1), F.lit(HEAD_CAP)), "ISO-8859-1")


def http_version(head: Column) -> Column:
    return F.nullif(F.regexp_extract(head, _STATUS_RE, 1), F.lit(""))


def http_status(head: Column) -> Column:
    """Status code as int, NULL when the payload is not an HTTP response
    (``\\d{3}`` only — the cast can't hit an ANSI parse error)."""
    return F.nullif(F.regexp_extract(head, _STATUS_RE, 2), F.lit("")).cast("int")


def http_header(head: Column, name: str) -> Column:
    """First occurrence of header ``name`` (case-insensitive per RFC
    9110 §5.1), value trimmed of optional whitespace, NULL when absent.

    Anchored at ``\\r\\n`` so a header name appearing inside another
    header's VALUE can't match; the status line itself can't be
    mistaken for a header for the same reason.
    """
    pat = r"(?i)\r\n" + re.escape(name) + r":[ \t]*([^\r\n]*[^\r\n \t])?"
    return F.nullif(F.regexp_extract(head, pat, 1), F.lit(""))


def http_mime(content_type: Column) -> Column:
    """Media type of a Content-Type value: lowercase, parameters
    stripped (``text/HTML; charset=x`` → ``text/html``)."""
    return F.nullif(
        F.lower(F.trim(F.split_part(content_type, F.lit(";"), F.lit(1)))),
        F.lit(""),
    )


def http_charset(content_type: Column) -> Column:
    """``charset`` parameter of a Content-Type value (lowercase, quotes
    stripped), NULL when undeclared — feeds the transcoding ladder."""
    return F.nullif(
        F.lower(
            F.regexp_extract(content_type, r'(?i)charset="?([^\s";]+)', 1)
        ),
        F.lit(""),
    )


def http_body(payload: Column, head: Column) -> Column:
    """Entity body as BINARY — byte-exact slice after the head's
    CRLFCRLF, NULL when the separator is absent or beyond HEAD_CAP."""
    sep = F.instr(head, "\r\n\r\n")
    return F.when(
        sep > 0, payload.substr(sep + 4, F.octet_length(payload))
    )


def parse_http_response(payload: Column) -> list[Column]:
    """The whole layer as one aliased projection:
    ``(http_version, status int, mime, charset, location,
    declared_length bigint, body binary)``.

    ``declared_length`` is the Content-Length HEADER value (what the
    server claimed), not the measured body size — comparing the two is
    how truncated fetches are detected downstream.
    """
    head = http_head(payload)
    ctype = http_header(head, "Content-Type")
    # try_cast: a garbage 'Content-Length: xyz' must be NULL, not an
    # ANSI cast error killing the task
    declared = http_header(head, "Content-Length").try_cast("bigint")
    return [
        http_version(head).alias("http_version"),
        http_status(head).alias("status"),
        http_mime(ctype).alias("mime"),
        http_charset(ctype).alias("charset"),
        http_header(head, "Location").alias("location"),
        declared.alias("declared_length"),
        http_body(payload, head).alias("body"),
    ]


def http_response_bytes(
    status: Column,
    reason: Column,
    content_type: Column,
    location: Column,
    body: Column,
) -> Column:
    """JVM Column expression building one well-formed HTTP/1.1 response
    message from typed columns — the write side of the round trip (and
    the generative formula driver oracles replay).  ``body`` must be a
    binary column; a NULL ``location`` omits the Location header;
    Content-Length is the body's true byte length.
    """
    loc = F.when(
        location.isNotNull(),
        F.concat(F.lit("Location: "), location, F.lit("\r\n")),
    ).otherwise(F.lit(""))
    head = F.concat(
        F.lit("HTTP/1.1 "), status.cast("string"), F.lit(" "), reason,
        F.lit("\r\n"),
        F.lit("Content-Type: "), content_type, F.lit("\r\n"),
        loc,
        F.lit("Content-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
    )
    return F.concat(F.encode(head, "ISO-8859-1"), body)
