"""RSS/Atom feed parsing — the third crawl-discovery channel next to
sitemaps (``sources/sitemap.py``) and robots directives
(``operators/robots.py``).

Feeds are how a crawler finds NEW urls minutes after publication
instead of days (sitemap refresh lag): news/blog hosts push fresh
entries to RSS 2.0 ``<item>`` or Atom ``<entry>`` blocks long before
the pages reach any sitemap. Web-scale feed files share the sitemap
corpus's pathologies — truncation, unescaped ampersands, mixed case,
CDATA wrapping — so parsing is the same tolerant tag scan as
``parse_sitemap``, not a strict XML parser.

Spark shape: one narrow mapInPandas pass over feed bodies → one row
per entry with its ordinal; link rows feed URL admission, timestamps
feed the refresh scheduler (``crawl_schedule``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.html import TAG_BODY as _XML_TAG_BODY

_ENTRY = re.compile(r"<(item|entry)\b[^>]*>(.*?)</\1>", re.S | re.I)
# RSS uses <link>url</link>; Atom uses <link href="url"/>. One regex
# per shape, CDATA-tolerant, case-insensitive.
_TEXT_FIELD = re.compile(
    r"<(title|link|pubDate|updated|guid|id)\b[^>]*>"
    r"\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</\1>",
    re.S | re.I,
)
# Locating <link> tags: the strict pattern uses the quote-skipping tag
# body shared with functions/html (one atom — a raw '>' inside a quoted
# attribute value, legal in XML, never truncates the tag); the loose
# [^>]* form tolerates UNBALANCED quotes (title=o'brien) at the cost
# of '>'-in-value truncation. ``_link_tags`` merges both per POSITION
# (strict wins where it matched), so a broken link next to a
# well-formed one is still recovered.
_LINK_TAG = re.compile(rf"<link\b{_XML_TAG_BODY}/?>", re.I)
_LINK_TAG_LOOSE = re.compile(r"<link\b[^>]*/?>", re.I)
# Attribute scanner: sequential name=value tokens, quoted values
# consumed WHOLE — so 'rel=' or 'href=' inside some other attribute's
# VALUE can never surface as an attribute (the misclassification the
# old position-anchored regexes kept re-admitting through edge chars).
_ATTR_SCAN = re.compile(
    r"([A-Za-z][\w-]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+)"
)


def _unquote(v: str) -> str:
    """Strip exactly ONE matching quote pair — never a quote of the
    other kind that legitimately starts/ends the value."""
    if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
        return v[1:-1]
    return v


def _tag_attrs(tag: str) -> dict:
    """{lowercased-name: unquoted-value} for one raw tag; on duplicate
    names the first wins (browser behavior)."""
    out: dict = {}
    for m in _ATTR_SCAN.finditer(tag):
        out.setdefault(m.group(1).lower(), _unquote(m.group(2)))
    return out


def _link_tags(inner: str) -> list:
    """All <link> tags in document order: strict matches plus any loose
    match that starts OUTSIDE every strict span (per-position fallback,
    not all-or-nothing — one unbalanced-quote link must not vanish just
    because a sibling parsed cleanly)."""
    strict = list(_LINK_TAG.finditer(inner))
    spans = [m.span() for m in strict]
    merged = [(m.start(), m.group(0)) for m in strict]
    for m in _LINK_TAG_LOOSE.finditer(inner):
        if not any(lo <= m.start() < hi for lo, hi in spans):
            merged.append((m.start(), m.group(0)))
    return [tag for _, tag in sorted(merged)]


def _atom_fetch_link(inner: str) -> str | None:
    """The entry's FETCH url: Atom entries commonly list rel="self" /
    rel="edit" links before the article link, so prefer a <link> whose
    rel token-list contains "alternate" (or has no rel — the spec
    default), falling back to the first href only when no such link
    exists."""
    tags = _link_tags(inner)
    first = None
    for tag in tags:
        attrs = _tag_attrs(tag)
        href = attrs.get("href")
        if not href:
            continue
        if first is None:
            first = href
        rel = attrs.get("rel", "").strip().lower()
        if rel == "" or "alternate" in rel.split():
            return href
    return first


def parse_feed(body: str) -> tuple[str, list[tuple]]:
    """(kind, [(ord, title, link, published, entry_id)]).

    kind: 'rss' if any <item> block parses, 'atom' if any <entry>
    does, else 'empty'. Entries missing a link are skipped (nothing to
    fetch). RSS <pubDate> and Atom <updated> both land in
    ``published``; RSS <guid> and Atom <id> both land in
    ``entry_id``."""
    entries: list[tuple] = []
    kinds = set()
    for mtch in _ENTRY.finditer(body or ""):
        tag = mtch.group(1).lower()
        inner = mtch.group(2)
        fields = {k.lower(): v.strip() for k, v in _TEXT_FIELD.findall(inner)}
        link = fields.get("link")
        if not link:
            fl = _atom_fetch_link(inner)
            link = fl.strip() if fl else None
        if not link:
            continue
        kinds.add("rss" if tag == "item" else "atom")
        entries.append(
            (
                len(entries),
                fields.get("title"),
                link,
                fields.get("pubdate") or fields.get("updated"),
                fields.get("guid") or fields.get("id"),
            )
        )
    if "rss" in kinds:
        kind = "rss"
    elif "atom" in kinds:
        kind = "atom"
    else:
        kind = "empty"
    return kind, entries


def feed_entries(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """(id_col, kind string, ord int, title string, link string,
    published string, entry_id string) — one row per parsed entry;
    feeds with no parseable entries yield a single (kind='empty', ord
    NULL) row so broken files stay visible downstream. Same
    column-pruned single-Arrow-pass shape as ``sitemap_entries``."""
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                id_col: [], "kind": [], "ord": [], "title": [],
                "link": [], "published": [], "entry_id": [],
            }
            for i, body in zip(pdf[id_col], pdf[body_col]):
                kind, entries = parse_feed(body if body is not None else "")
                if not entries:
                    out[id_col].append(i)
                    out["kind"].append(kind)
                    for c in ("ord", "title", "link", "published", "entry_id"):
                        out[c].append(None)
                    continue
                for o, title, link, published, eid in entries:
                    out[id_col].append(i)
                    out["kind"].append(kind)
                    out["ord"].append(o)
                    out["title"].append(title)
                    out["link"].append(link)
                    out["published"].append(published)
                    out["entry_id"].append(eid)
            yield pd.DataFrame(
                {
                    c: pd.Series(v, dtype="object")
                    if c != id_col
                    else pd.Series(v)
                    for c, v in out.items()
                }
            )

    return df.mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_type}, kind string, ord int, title string, "
            "link string, published string, entry_id string"
        ),
    )
