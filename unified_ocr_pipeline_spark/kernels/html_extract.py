"""Readability-style HTML main-content extraction (boilerplate stripping).

The reference has no HTML path; the north star (BASELINE.json) mandates
"readability-style DOM boilerplate stripping (text-density + link-density
scoring over block elements)". The design template inside the reference is
its *described* three-method splitter with confidence scoring
(/root/reference/NAS_DEPLOYMENT_GUIDE.md:120-133, SURVEY.md §2.9 G4).

Deterministic, stdlib-only (html.parser), zero Spark imports. The same code
runs inside the Spark pandas-UDF stage and the sequential oracle, so the
extracted text is byte-identical by construction and pinned by golden tests.

Algorithm (classic text-density / link-density block scoring):
 1. Stream-parse the HTML, dropping <script>/<style>/<noscript>/<template>
    subtrees and comments.
 2. Cut the text into blocks at block-level element boundaries; within each
    block track total text chars and anchor-text chars, plus whether any
    ancestor at block-open time was a structural-boilerplate container
    (<nav>/<header>/<footer>/<aside>).
 3. Score: a block is CONTENT iff it is not inside structural boilerplate,
    its normalized text length ≥ MIN_BLOCK_CHARS, and its link density
    (anchor chars / text chars) ≤ MAX_LINK_DENSITY.
 4. Main text = content-block texts joined with "\n" (whitespace inside a
    block collapsed to single spaces — the canonical form).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape
from html.parser import HTMLParser
from typing import List, Optional, Tuple

# Tags whose subtree contributes no text at all.
_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}

# Structural boilerplate containers: all text inside them is boilerplate.
_BOILER_TAGS = {"nav", "header", "footer", "aside"}

# Block-level boundaries: opening or closing one of these flushes the block.
_BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6", "td", "th", "tr", "table",
    "pre", "blockquote", "figure", "figcaption", "br", "hr",
    "form", "button", "nav", "header", "footer", "aside", "body",
}

MIN_BLOCK_CHARS = 25      # below this a block can't be main content
MAX_LINK_DENSITY = 0.33   # above this a block is navigation-like


@dataclass
class Block:
    text: str            # whitespace-normalized block text
    link_chars: int      # anchor-text chars (pre-normalization count)
    total_chars: int     # all text chars (pre-normalization count)
    in_boiler: bool      # opened inside nav/header/footer/aside

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0

    @property
    def is_content(self) -> bool:
        return (
            not self.in_boiler
            and len(self.text) >= MIN_BLOCK_CHARS
            and self.link_density <= MAX_LINK_DENSITY
        )


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = []
        self._buf: List[str] = []
        self._buf_link_chars = 0
        self._buf_total_chars = 0
        self._drop_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0

    # -- block lifecycle ----------------------------------------------------
    def _flush(self) -> None:
        raw = "".join(self._buf)
        text = " ".join(raw.split())
        if text:
            self.blocks.append(
                Block(
                    text=text,
                    link_chars=self._buf_link_chars,
                    total_chars=self._buf_total_chars,
                    in_boiler=self._boiler_depth > 0,
                )
            )
        self._buf = []
        self._buf_link_chars = 0
        self._buf_total_chars = 0

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            # anchor scope is clamped to the block: crawl HTML routinely
            # omits </a>, and HTMLParser never synthesizes end tags — an
            # unclosed anchor would otherwise mark EVERY later block as
            # pure link text and the whole page would extract empty
            self._anchor_depth = 0
        if tag in _BOILER_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILER_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        stripped_len = len(data.strip())
        if stripped_len == 0 and not data:
            return
        self._buf.append(data)
        self._buf_total_chars += stripped_len
        if self._anchor_depth:
            self._buf_link_chars += stripped_len

    def close(self) -> None:  # final flush
        super().close()
        self._flush()


def segment_blocks_reference(html_text: str) -> List[Block]:
    """Parse HTML into scored text blocks via the stdlib ``HTMLParser``
    subclass — the readable reference implementation. ``segment_blocks``
    below is the compiled-regex fast path, differential-tested against
    this one (``tests/test_kernels.py``); both must stay in lockstep."""
    parser = _BlockParser()
    parser.feed(html_text)
    parser.close()
    return parser.blocks


# Fast tokenizer. One compiled alternation, matched left-to-right exactly
# like HTMLParser's goahead loop: comments/decls/PIs are boundaries that
# emit nothing, end tags are tolerant (name then anything to '>'), start
# tags allow quoted '>' inside the attribute blob, and a '<' that opens
# none of these is literal text (HTMLParser emits it as a lone data
# event — replicated in _append_text so the per-event stripped-length
# sums that feed link-density scoring stay byte-identical).
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|\Z)"
    r"|<!\[CDATA\[.*?(?:\]\]>|\Z)"
    r"|<![^>]*>?"
    r"|<\?[^>]*>?"
    r"|</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)[^>]*>"
    # start tag: name, then attr units mirroring the stdlib's tolerant
    # attr grammar (an UNQUOTED value greedily eats a trailing '/', so
    # <a href=x/> is a start tag while <br/> / <p c="x" /> self-close)
    r"|<([a-zA-Z][^\t\n\r\f />\x00]*)"
    r"((?:\s+[^\s/>=][^\s/=>]*(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^>\s]*))?)*)"
    r"\s*(/?)>",
    re.DOTALL,
)
# script/style content is CDATA: no entity decoding, no tag events, data
# runs to the matching close tag (HTMLParser.set_cdata_mode semantics)
_CDATA_END = {
    "script": re.compile(r"</\s*script[^>]*>", re.I),
    "style": re.compile(r"</\s*style[^>]*>", re.I),
}


def segment_blocks(html_text: str) -> List[Block]:
    """Parse HTML into scored text blocks (deterministic) — fast path.

    Same event semantics as ``segment_blocks_reference`` (stdlib
    HTMLParser, convert_charrefs=True) but driven by one compiled regex
    scan instead of the stdlib's per-construct Python state machine —
    the extraction pipeline spends the majority of its kernel time here,
    and this form is ~3× faster. Behavioral lockstep is pinned by a
    differential test over the fixture generator and an HTML-soup
    corpus; scoring-relevant bookkeeping (per-event stripped lengths,
    anchor/boiler/drop depths, block flush order) is replicated exactly.
    """
    blocks: List[Block] = []
    buf: List[str] = []
    buf_link = 0
    buf_total = 0
    drop_depth = 0
    boiler_depth = 0
    anchor_depth = 0

    def flush() -> None:
        nonlocal buf, buf_link, buf_total
        raw = "".join(buf)
        text = " ".join(raw.split())
        if text:
            blocks.append(
                Block(
                    text=text,
                    link_chars=buf_link,
                    total_chars=buf_total,
                    in_boiler=boiler_depth > 0,
                )
            )
        buf = []
        buf_link = 0
        buf_total = 0

    def append_text(span: str) -> None:
        # split at literal '<' exactly like HTMLParser's lone-'<' data
        # events: the per-event strip lengths feed total/link char sums
        nonlocal buf_link, buf_total
        if drop_depth or not span:
            return
        for i, piece in enumerate(span.split("<")):
            if i:
                buf.append("<")
                buf_total += 1
                if anchor_depth:
                    buf_link += 1
            if not piece:
                continue
            if "&" in piece:
                piece = unescape(piece)
            buf.append(piece)
            sl = len(piece.strip())
            buf_total += sl
            if anchor_depth:
                buf_link += sl

    pos = 0
    n = len(html_text)
    search = _TOKEN_RE.search
    while pos < n:
        m = search(html_text, pos)
        if m is None:
            append_text(html_text[pos:])
            break
        if m.start() > pos:
            append_text(html_text[pos : m.start()])
        pos = m.end()
        tag = m.group(2)
        if tag is not None:  # start tag (or self-closing)
            tag = tag.lower()
            if m.group(4):  # self-closing -> handle_startendtag semantics
                if tag in _BLOCK_TAGS:
                    flush()
                continue
            if tag in _DROP_TAGS:
                drop_depth += 1
                if tag in _CDATA_END:
                    # CDATA fast-forward: content is dropped anyway, but
                    # tags inside must NOT fire events (stdlib semantics)
                    em = _CDATA_END[tag].search(html_text, pos)
                    if em is None:
                        break  # unclosed script/style swallows the tail
                    pos = em.end()
                    drop_depth -= 1
                continue
            if tag in _BLOCK_TAGS:
                flush()
                # anchor scope clamps to the block (see _BlockParser)
                anchor_depth = 0
            if tag in _BOILER_TAGS:
                boiler_depth += 1
            if tag == "a":
                anchor_depth += 1
        else:
            tag = m.group(1)
            if tag is None:
                continue  # comment / declaration / PI: boundary, no event
            tag = tag.lower()
            if tag in _DROP_TAGS:
                drop_depth = max(0, drop_depth - 1)
                continue
            if tag in _BLOCK_TAGS:
                flush()
            if tag in _BOILER_TAGS:
                boiler_depth = max(0, boiler_depth - 1)
            if tag == "a":
                anchor_depth = max(0, anchor_depth - 1)
    flush()
    return blocks


def extract_main_text(html_text: str) -> Tuple[str, List[Tuple[int, int]]]:
    """Return (main_text, span_offsets).

    ``main_text`` is content-block texts joined with "\\n";
    ``span_offsets`` is a list of (start, end) character offsets of each kept
    block inside ``main_text`` — the HTML analog of the reference's page
    spans (SURVEY.md §2.5 W4 cumulative offsets).
    """
    blocks = segment_blocks(html_text)
    parts: List[str] = []
    offsets: List[Tuple[int, int]] = []
    pos = 0
    for b in blocks:
        if not b.is_content:
            continue
        if parts:
            pos += 1  # the "\n" separator
        start = pos
        parts.append(b.text)
        pos += len(b.text)
        offsets.append((start, pos))
    return "\n".join(parts), offsets


# ---------------------------------------------------------------------------
# Outlink extraction (crawl link graph)
# ---------------------------------------------------------------------------

class _LinkCollector(HTMLParser):
    """Collect absolute http(s) hrefs from <a> tags, in document order.
    Relative, fragment, javascript: and mailto: hrefs are skipped — the
    link-graph consumer wants host-resolvable edges, and resolving
    relative urls against a base is the caller's policy decision."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: List[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v and v.startswith(("http://", "https://")):
                    self.links.append(v)
                    break


def extract_links(html_text: str) -> List[str]:
    """All absolute outlinks of a page, in document order (duplicates
    kept — edge multiplicity is signal for the link graph)."""
    p = _LinkCollector()
    try:
        p.feed(html_text or "")
        p.close()
    except Exception:
        pass  # malformed tail: keep whatever parsed before the error
    return p.links


class _AnchorCollector(HTMLParser):
    """Collect (absolute href, visible anchor text) pairs from <a> tags.
    Text is everything rendered between the open and close tag
    (whitespace-normalized); nested <a> (invalid HTML, but crawls have
    it) attributes the inner text to the innermost open anchor, matching
    how browsers recover."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: List[Tuple[str, str]] = []
        self._stack: List[Tuple[Optional[str], List[str]]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            href = None
            for k, v in attrs:
                if k == "href" and v and v.startswith(("http://", "https://")):
                    href = v
                    break
            self._stack.append((href, []))

    def handle_data(self, data: str) -> None:
        if self._stack:
            self._stack[-1][1].append(data)

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._stack:
            href, parts = self._stack.pop()
            if href is not None:
                text = " ".join("".join(parts).split())
                self.anchors.append((href, text))


def extract_anchors(html_text: str) -> List[Tuple[str, str]]:
    """All (absolute href, anchor text) pairs of a page in document
    order — the raw material for anchor-text aggregation (the classic
    web-corpus signal: what OTHER pages call a target page/host).
    Duplicates kept; text whitespace-normalized, may be empty."""
    p = _AnchorCollector()
    try:
        p.feed(html_text or "")
        p.close()
    except Exception:
        pass  # malformed tail: keep whatever parsed before the error
    # Anchors never closed by EOF: browsers auto-close at document end,
    # so flush them too (innermost first, matching nested-pop order).
    while p._stack:
        href, parts = p._stack.pop()
        if href is not None:
            p.anchors.append((href, " ".join("".join(parts).split())))
    return p.anchors


# ---------------------------------------------------------------------------
# Head-metadata extraction (title / description / canonical / published time)
# ---------------------------------------------------------------------------

class _MetaCollector(HTMLParser):
    """First-occurrence-wins head metadata:

    - ``title``      — text inside the first <title> (whitespace-normalized)
    - ``description``— first <meta name="description" content=...>
                       (attr-value case-insensitive, like browsers)
    - ``canonical``  — first <link rel="canonical" href=...>
    - ``published``  — first <meta property="article:published_time"
                       content=...>, falling back to the first
                       <time datetime=...> in the body (the trafilatura-
                       style cascade: explicit metadata beats markup)

    HTMLParser lowercases tag/attr NAMES but not values, so the value
    comparisons normalize case themselves. First occurrence wins for every
    field — crawl pages repeat meta tags and browsers keep the first.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: Optional[str] = None
        self.description: Optional[str] = None
        self.canonical: Optional[str] = None
        self.meta_published: Optional[str] = None
        self.time_published: Optional[str] = None
        self._title_buf: Optional[List[str]] = None

    def handle_starttag(self, tag: str, attrs) -> None:
        a = {k: v for k, v in attrs if v is not None}
        if tag == "title" and self.title is None:
            self._title_buf = []
        elif tag == "meta":
            name = (a.get("name") or "").lower()
            prop = (a.get("property") or "").lower()
            content = a.get("content")
            if content is not None:
                if name == "description" and self.description is None:
                    self.description = " ".join(content.split())
                if prop == "article:published_time" and self.meta_published is None:
                    self.meta_published = content.strip()
        elif tag == "link":
            rel = (a.get("rel") or "").lower()
            href = a.get("href")
            if rel == "canonical" and href and self.canonical is None:
                self.canonical = href.strip()
        elif tag == "time":
            dt = a.get("datetime")
            if dt and self.time_published is None:
                self.time_published = dt.strip()

    # <meta>/<link> are void elements; some crawls self-close them.
    handle_startendtag = handle_starttag

    def handle_data(self, data: str) -> None:
        if self._title_buf is not None:
            self._title_buf.append(data)

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._title_buf is not None:
            text = " ".join("".join(self._title_buf).split())
            self.title = text if text else None
            self._title_buf = None

    @property
    def published(self) -> Optional[str]:
        return self.meta_published or self.time_published


def extract_page_meta(html_text: str) -> Tuple[
    Optional[str], Optional[str], Optional[str], Optional[str]
]:
    """(title, description, canonical_url, published) of a page, each None
    when absent. Deterministic, stdlib-only; malformed tails keep whatever
    parsed before the error (same recovery policy as the link collectors)."""
    p = _MetaCollector()
    try:
        p.feed(html_text or "")
        p.close()
    except Exception:
        pass
    if p._title_buf is not None:  # EOF inside <title>: browsers keep the text
        text = " ".join("".join(p._title_buf).split())
        if p.title is None and text:
            p.title = text
    return p.title, p.description, p.canonical, p.published


# ---------------------------------------------------------------------------
# HTML → Markdown conversion (structure-preserving extraction)
# ---------------------------------------------------------------------------

_HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


class _MarkdownParser(HTMLParser):
    """Structure-preserving text extraction: headings → ``#`` prefixes,
    list items → ``- ``, blockquotes → ``> ``, absolute-href anchors →
    ``[text](url)``, everything else → plain paragraphs. LLM-corpus
    pipelines increasingly keep this structure instead of flat text
    (markdown survives tokenization and teaches document layout).

    Same recovery posture as the other collectors: script/style subtrees
    dropped, whitespace normalized per block, malformed tails keep
    whatever parsed before the error."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Tuple[str, str]] = []  # (kind, text)
        self._buf: List[str] = []
        self._kind = "p"
        self._drop_depth = 0
        self._anchor: Optional[Tuple[str, List[str]]] = None

    def _flush(self) -> None:
        if self._anchor is not None:  # unterminated anchor: keep its text
            self._buf.append("".join(self._anchor[1]))
            self._anchor = None
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((self._kind, text))
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            href = None
            for k, v in attrs:
                if k == "href" and v and v.startswith(("http://", "https://")):
                    href = v
                    break
            if self._anchor is None and href is not None:
                self._anchor = (href, [])
            return
        if tag in _HEADING_TAGS:
            self._flush()
            self._kind = f"h{_HEADING_TAGS[tag]}"
        elif tag == "li":
            self._flush()
            self._kind = "li"
        elif tag == "blockquote":
            self._flush()
            self._kind = "quote"
        elif tag in _BLOCK_TAGS:
            self._flush()
            self._kind = "p"

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            if self._anchor is not None:
                href, parts = self._anchor
                self._anchor = None
                text = " ".join("".join(parts).split())
                if text:
                    self._buf.append(f"[{text}]({href})")
            return
        if tag in _HEADING_TAGS or tag in ("li", "blockquote") or tag in _BLOCK_TAGS:
            self._flush()
            self._kind = "p"

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()
            self._kind = "p"

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        if self._anchor is not None:
            self._anchor[1].append(data)
        else:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


_MD_PREFIX = {"li": "- ", "quote": "> ", "p": ""}


def html_to_markdown(html_text: str) -> str:
    """Render a page as markdown: ``#``-prefixed headings, ``- `` list
    items (consecutive items stay adjacent lines), ``> `` blockquotes,
    ``[text](url)`` for absolute-href anchors, blank lines between
    blocks. Deterministic, stdlib-only."""
    p = _MarkdownParser()
    try:
        p.feed(html_text or "")
        p.close()
    except Exception:
        pass
    out: List[str] = []
    prev_kind = None
    for kind, text in p.blocks:
        if kind.startswith("h"):
            line = "#" * int(kind[1]) + " " + text
        else:
            line = _MD_PREFIX[kind] + text
        if out:
            out.append("\n" if prev_kind == "li" and kind == "li" else "\n\n")
        out.append(line)
        prev_kind = kind
    return "".join(out)
