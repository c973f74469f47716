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


# ---------------------------------------------------------------------------
# DOM skeleton (structural template) hashing
# ---------------------------------------------------------------------------

# Opening tags only, in document order: '<' then a letter then the tag
# name. Closing tags / comments / doctypes start with '</', '<!', so the
# [a-z] first-char class skips them; attributes don't matter (the capture
# stops at the first non-name char). Same Java∩RE2 dialect as the rest of
# this module, so the DuckDB oracle replays it verbatim.
_TAG_RE = r"<([a-z][a-z0-9]*)"


def skeleton_key(html: Column) -> Column:
    """md5 of the page's opening-tag sequence — a structural template
    fingerprint (Gibson, Punera & Tomkins 2005 measured ~40-50% of the
    web is template content). Pages generated from the same CMS template
    share a skeleton even when their text differs entirely, so one
    hash-agg on this key finds template families: crawl-trap triage
    (a million structurally-identical calendar pages), boilerplate-family
    discovery, and per-host render-farm detection.

    Pure JVM: one ``regexp_extract_all`` + ``concat_ws`` + ``md5`` inside
    whole-stage codegen; no Python, nothing shuffles until the caller
    aggregates the 32-char key.
    """
    return F.md5(F.concat_ws(">", F.regexp_extract_all(F.lower(html), F.lit(_TAG_RE), 1)))


# ---------------------------------------------------------------------------
# HTML table extraction
# ---------------------------------------------------------------------------

# Lazy block matches, (?is): tables/rows/cells may span lines and sites
# mix tag case. Nested tables are NOT handled (the inner table's cells
# surface under the outer block up to the first </table> — the standard
# regex-extractor contract; a full parser belongs in the DOM kernel).
_TABLE_BLOCK_RE = r"(?is)<table[^>]*>(.*?)</table>"
_TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
_CELL_RE = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"


def table_blocks(html: Column) -> Column:
    """array<string> of raw <table> body blocks, document order."""
    return F.regexp_extract_all(html, F.lit(_TABLE_BLOCK_RE), 1)


def table_rows(block: Column) -> Column:
    """array<string> of raw <tr> bodies within one table block."""
    return F.regexp_extract_all(block, F.lit(_TR_RE), 1)


def table_cells(row: Column) -> Column:
    """array<string> of raw <td>/<th> bodies within one row."""
    return F.regexp_extract_all(row, F.lit(_CELL_RE), 1)


def cell_text(cell: Column) -> Column:
    """Visible cell text: inner tags -> space, whitespace collapsed,
    trimmed. Same normalization recipe as the metadata kernel's titles."""
    stripped = F.regexp_replace(cell, r"(?s)<[^>]*>", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


# ---------------------------------------------------------------------------
# hreflang alternates + OpenGraph meta (multilingual site maps, social cards)
# ---------------------------------------------------------------------------
# <link rel="alternate" hreflang="fr" href="..."/> is how sites DECLARE
# their translation graph (Google's multilingual indexing contract) —
# the metadata-side complement to STRAND's URL-structure inference; a
# page's hreflang set plus its og:* card (title/type/image/url) is the
# standard per-page head profile a crawl warehouse materializes.
# Real crawl HTML serializes attributes in ANY order and with double,
# single, or no quotes, so extraction is two-pass: one tag-level regex
# finds the candidate <link>/<meta> tag (anchored on its most selective
# attribute), then ``_attr_val`` pulls each attribute from the tag
# independently — order-free and quote-tolerant without backreferences
# (the patterns stay in the Java∩RE2 dialect; no lookaround either).
#
# Two hazards the patterns guard against: (1) a '>' INSIDE a quoted
# attribute value ("Home > Products") must not truncate the tag, so the
# tag-body atom ``_TAG_BODY`` skips quoted strings wholesale instead of
# using a bare [^>]*; (2) ``\bname`` would also match hyphenated data-*
# attributes ('-' is a word boundary), so attribute anchors require a
# whitespace-or-quote BEFORE the name (every attribute in a tag follows
# one — the tag name itself is excluded by construction).

# Tag body: any run of non-delimiter chars or complete quoted strings —
# mutually-exclusive first chars, so no pathological backtracking.
# Public (TAG_BODY): sources/feeds.py reuses the same atom for XML tags.
TAG_BODY = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
_TAG_BODY = TAG_BODY


def _attr_val(tag: Column, name: str) -> Column:
    """Attribute value from one raw tag, tolerant of double-quoted,
    single-quoted, and unquoted serializations (checked in that order,
    so a quoted value never half-matches as unquoted). '' when the
    attribute is absent. The ``[\\s"']`` anchor before the name keeps
    ``data-{name}`` from matching as ``{name}``."""
    dq = F.regexp_extract(tag, rf'(?i)[\s"\']{name}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(tag, rf"(?i)[\s\"']{name}\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(
        tag, rf"""(?i)[\s"']{name}\s*=\s*([^\s"'>]+)""", 1
    )
    return F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)


def _rel_is(tag: Column, value: str) -> Column:
    """True when the tag's rel attribute token-contains ``value``
    (rel is a space-separated token list per the HTML spec)."""
    return F.lower(_attr_val(tag, "rel")).rlike(
        rf"(^|\s){value}($|\s)"
    )


_HREFLANG_TAG_RE = (
    rf"(?i)<link\b{_TAG_BODY}[\s\"']hreflang\s*={_TAG_BODY}>"
)


def hreflang_tags(html: Column) -> Column:
    """Array of raw ``<link rel="alternate" hreflang=...>`` tags —
    candidates anchored on the hreflang attribute (any position, any
    quote style), then filtered to rel lists containing ``alternate``
    AND a non-empty href (a declaration with nothing to fetch is not
    an edge — the single-regex predecessor enforced the same)."""
    tags = F.regexp_extract_all(html, F.lit(_HREFLANG_TAG_RE), F.lit(0))
    return F.filter(
        tags,
        lambda t: _rel_is(t, "alternate") & (_attr_val(t, "href") != ""),
    )


def hreflang_lang(tag: Column) -> Column:
    return _attr_val(tag, "hreflang")


def hreflang_href(tag: Column) -> Column:
    return _attr_val(tag, "href")


def _og_tag_re(prop: str) -> str:
    # Quoted og:{prop} closes with its quote; unquoted must be followed
    # by whitespace, '/', or the tag close — so og:image never swallows
    # og:image:width. No lookaround (Java∩RE2): the final alternative
    # binds og:{prop} directly to '>'. _TAG_BODY (not [^>]*) so a '>'
    # inside a quoted content value never truncates the tag.
    return (
        rf"(?i)<meta\b{_TAG_BODY}[\s\"']property\s*=\s*"
        rf"""(?:"og:{prop}"{_TAG_BODY}|'og:{prop}'{_TAG_BODY}"""
        rf"|og:{prop}[\s/]{_TAG_BODY}|og:{prop})>"
    )


def og_meta(html: Column) -> list[Column]:
    """(og_title, og_type, og_image, og_url) from the OpenGraph card;
    absent properties are NULL (empty-string match → NULL, so "no tag"
    and "no content" read the same downstream). Two-pass per property:
    find the <meta property="og:..."> tag in either attribute order,
    then pull content with the quote-tolerant attribute extractor."""
    cols = []
    for prop in ("title", "type", "image", "url"):
        tag = F.regexp_extract(html, _og_tag_re(prop), 0)
        v = _attr_val(tag, "content")
        cols.append(F.when(v != "", v).alias(f"og_{prop}"))
    return cols


# The quoted alternatives allow content after the MIME (";
# charset=utf-8" params, trailing space) up to the value's own closing
# quote; the unquoted one runs to the next delimiter.
_FEED_LINK_RE = (
    rf"(?i)<link\b{_TAG_BODY}[\s\"']type\s*=\s*"
    rf"(?:\"application/(?:rss|atom)\+xml[^\"]*\""
    rf"|'application/(?:rss|atom)\+xml[^']*'"
    rf"|application/(?:rss|atom)\+xml[^\s\"'>]*)"
    rf"{_TAG_BODY}>"
)


def feed_link_tags(html: Column) -> Column:
    """Raw feed-autodiscovery tags (``rel="alternate"
    type="application/rss+xml|atom+xml"``) — how a crawler finds a
    site's feeds from any page's head, the entry point into
    ``sources/feeds.py``. Candidates anchor on the MIME type (any
    attribute order/quote style, ``data-type`` excluded by the
    whitespace-or-quote anchor); rel must token-contain alternate and
    an href must be present (nothing to fetch otherwise)."""
    tags = F.regexp_extract_all(html, F.lit(_FEED_LINK_RE), F.lit(0))
    return F.filter(
        tags,
        lambda t: _rel_is(t, "alternate") & (_attr_val(t, "href") != ""),
    )


def feed_link_type(tag: Column) -> Column:
    return F.lower(
        F.regexp_extract(
            _attr_val(tag, "type"), r"(?i)application/(rss|atom)\+xml", 1
        )
    )


def feed_link_href(tag: Column) -> Column:
    return _attr_val(tag, "href")
