"""Structured-data (JSON-LD) extraction Column builders.

Pages embed machine-readable records as ``<script
type="application/ld+json">`` blocks (schema.org: Article, Product,
NewsArticle, ...).  Curation pipelines mine these for publish dates,
authorship, and page-type routing — a NewsArticle and a Product listing
get different quality gates.  The DOM-walking metadata kernel
(``kernels/html_extract.py``) handles <meta>/<title>; JSON-LD blocks are
simpler — a tag-delimited run of bytes — so they stay ENTIRELY JVM-side:
one lazy regex per page (``regexp_extract_all``), then ``get_json_object``
per field, all inside whole-stage codegen.  No Python, no shuffle; the
regex and JSON-path subset used here behaves identically in DuckDB for
the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Lazy body match; (?s) so records may span lines. The type attribute may
# carry other attributes around it (async, nonce) — [^>]* both sides.
_JSONLD_RE = r'(?s)<script[^>]*type="application/ld\+json"[^>]*>(.*?)</script>'


def jsonld_blocks(html: Column) -> Column:
    """array<string> of raw JSON-LD block bodies, document order."""
    return F.regexp_extract_all(html, F.lit(_JSONLD_RE), 1)


def jsonld_field(block: Column, field: str) -> Column:
    """Top-level string field of one JSON-LD block (NULL when absent).

    ``field`` may contain JSON-LD's ``@``-prefixed keys; the bracketed
    JSON-path form keeps Spark's parser happy with them.
    """
    return F.get_json_object(block, f"$['{field}']")


# name-before-content attribute order (the overwhelmingly common form;
# a content-first variant would need a second alternation).
_META_ROBOTS_RE = r'(?i)<meta[^>]*name="robots"[^>]*content="([^"]*)"'


def meta_robots(html: Column) -> list[Column]:
    """Page-level robots directives from ``<meta name="robots">``:
    ``(robots_content string, noindex boolean, nofollow boolean)``.

    A page-level ``noindex`` is how sites opt individual pages out of
    indexes/corpora even when robots.txt admits the fetch — a compliant
    training-data pipeline drops those documents post-fetch.  Directive
    match is per comma-separated token (``none`` implies both, per the
    Google/Bing documented semantics), case-insensitive, whitespace
    tolerated.  Pure JVM regex/array expressions.
    """
    content = F.regexp_extract(html, _META_ROBOTS_RE, 1)
    toks = F.transform(
        F.split(F.lower(content), ","), lambda t: F.trim(t)
    )
    has = lambda name: F.array_contains(toks, name) | F.array_contains(toks, "none")  # noqa: E731
    return [
        content.alias("robots_content"),
        ((content != "") & has("noindex")).alias("noindex"),
        ((content != "") & has("nofollow")).alias("nofollow"),
    ]
