"""Unit tests for sniff, HTML extraction, PDF-SYN layout, and the
per-document kernel (no Spark)."""

from __future__ import annotations

import random

from unified_ocr_pipeline_spark.kernels import sniff
from unified_ocr_pipeline_spark.kernels import html_extract as H
from unified_ocr_pipeline_spark.kernels import pdf_layout as P
from unified_ocr_pipeline_spark.kernels import document as D


# -- sniff -------------------------------------------------------------------

def test_sniff_magic_bytes():
    assert sniff.sniff_content_type(b"%PDF-1.7 ...") == sniff.PDF
    assert sniff.sniff_content_type(b"%PDF-SYN1\nP 1\n") == sniff.PDF
    assert sniff.sniff_content_type(b"<!DOCTYPE html><html>") == sniff.HTML
    assert sniff.sniff_content_type(b"  \n<html lang='en'>") == sniff.HTML
    assert sniff.sniff_content_type(b"<div>frag</div>") == sniff.HTML
    assert sniff.sniff_content_type(b"plain words") == sniff.TEXT
    assert sniff.sniff_content_type(b"") == sniff.EMPTY
    assert sniff.sniff_content_type(None) == sniff.EMPTY


# -- HTML boilerplate stripping ------------------------------------------------

ARTICLE = b"""<!DOCTYPE html>
<html><head><title>t</title><script>var x=1;</script>
<style>.a{color:red}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/b">Blog</a> <a href="/c">Contact</a></nav>
<div class="sidebar"><a href="1">L1</a> <a href="2">L2</a> <a href="3">L3</a></div>
<article>
<h1>A Real Headline About Purchase Orders</h1>
<p>This is the first paragraph of the main content and it is long enough to count as content.</p>
<p>Second paragraph with more meaningful prose that should definitely survive the boilerplate strip.</p>
</article>
<footer>Copyright 2024 Example Inc. All rights reserved worldwide forever.</footer>
</body></html>"""


def test_html_extract_keeps_article_drops_nav_footer():
    text, offsets = H.extract_main_text(ARTICLE.decode())
    assert "first paragraph of the main content" in text
    assert "Second paragraph" in text
    assert "Home" not in text
    assert "L1" not in text
    assert "Copyright 2024" not in text  # footer is structural boilerplate
    assert "var x=1" not in text
    # offsets index into the text exactly
    for s, e in offsets:
        assert text[s:e] == text[s:e].strip()
        assert "\n" not in text[s:e]


def test_html_link_density_filter():
    linky = (
        "<body><div>"
        + " ".join(f'<a href="{i}">word{i} word</a>' for i in range(10))
        + "</div><p>"
        + "genuine long-form content sentence with many words here "
        + "</p></body>"
    )
    text, _ = H.extract_main_text(linky)
    assert "genuine long-form content" in text
    assert "word1 word" not in text


def test_html_empty_main():
    text, offsets = H.extract_main_text(
        "<body><nav><a href='/'>Home</a></nav><footer>foot words</footer></body>"
    )
    assert text == ""
    assert offsets == []


def test_html_extract_deterministic():
    a = H.extract_main_text(ARTICLE.decode())
    b = H.extract_main_text(ARTICLE.decode())
    assert a == b


# -- PDF-SYN layout parsing ----------------------------------------------------

def test_pdf_syn_roundtrip_reading_order():
    pages = [
        [
            (10, 0, "HEADER LINE"),
            (30, 0, "left column"),
            (30, 300, "right column"),
            (60, 0, "bottom block\nwith two lines"),
        ]
    ]
    payload = P.render_pages(pages)
    assert P.is_pdf_syn(payload)
    out = P.parse_pages(payload)
    assert out == ["HEADER LINE\nleft column\nright column\nbottom block\nwith two lines"]


def test_pdf_syn_shuffled_blocks_restore_order():
    blocks = [
        (10, 0, "first"),
        (30, 0, "second"),
        (50, 0, "third"),
        (70, 0, "fourth"),
    ]
    rng = random.Random(7)
    shuffled = blocks[:]
    rng.shuffle(shuffled)
    out = P.parse_pages(P.render_pages([shuffled]))
    assert out == ["first\nsecond\nthird\nfourth"]


def test_pdf_syn_band_quantization():
    # y=34 and y=33 fall in the same 16-unit band → ordered by x
    payload = P.render_pages([[(34, 0, "left"), (33, 200, "right")]])
    assert P.parse_pages(payload) == ["left\nright"]


def test_pdf_syn_multipage():
    payload = P.render_pages([[(0, 0, "page one")], [(0, 0, "page two")]])
    assert P.parse_pages(payload) == ["page one", "page two"]


# -- per-document kernel ---------------------------------------------------------

PO_PAGES = [
    "PURCHASE ORDER #4551234567\nMJO NO: 12345678\nQTY SHIP: 100 EA",
    "continuation page with details",
    "ROUTER SECTION\nOperation 10: Mill",
]


def _po_payload():
    return P.render_pages([[(0, 0, t)] for t in PO_PAGES])


def test_process_document_po_split_and_spans():
    res = D.process_document("https://a/x.pdf", _po_payload(), None)
    assert res.status == D.STATUS_OK
    assert res.content_type == sniff.PDF
    assert res.total_pages == 3
    assert res.po_number == "4551234567"
    # W4: pages 0,1 are PO (idx<2); page 2 has no anchor → router
    assert res.po_page_count == 2
    assert res.router_page_count == 1
    assert [s.label for s in res.spans] == ["po", "po", "router"]
    # byte-identity: combined text joins pages with the exact separator
    assert res.extracted_text == D.PAGE_BREAK.join(PO_PAGES)
    # spans slice the combined text back into the original pages
    for i, s in enumerate(res.spans):
        assert res.extracted_text[s.start:s.end] == PO_PAGES[i]


def test_process_document_anchor_late_page_is_po():
    pages = ["p1", "p2", "see the purchase order here", "plain"]
    payload = P.render_pages([[(0, 0, t)] for t in pages])
    res = D.process_document("u", payload, None)
    assert [s.label for s in res.spans] == ["po", "po", "po", "router"]


def test_process_document_unknown_po():
    payload = P.render_pages([[(0, 0, "no numbers here")]])
    res = D.process_document("u", payload, None)
    assert res.po_number == D.UNKNOWN_PO
    assert res.fields["Whittaker_Shipper"] == D.UNKNOWN_PO


def test_process_document_html():
    res = D.process_document("https://h/x", ARTICLE, None)
    assert res.content_type == sniff.HTML
    assert res.status == D.STATUS_OK
    assert "Real Headline" in res.extracted_text
    assert all(s.label == "main" for s in res.spans)
    for s in res.spans:
        seg = res.extracted_text[s.start:s.end]
        assert seg and "\n" not in seg


def test_process_document_text_fallback_and_empty():
    res = D.process_document("u", None, "PO: 4551234567 text layer")
    assert res.content_type == sniff.TEXT
    assert res.po_number == "4551234567"
    res2 = D.process_document("u", None, None)
    assert res2.status == D.STATUS_EMPTY
    assert res2.extracted_text == ""


def test_process_document_oversize_guard():
    res = D.process_document("u", b"%PDF" + b"x" * 100, None, max_bytes=50)
    assert res.status == D.STATUS_OVERSIZE
    assert res.extracted_text == ""


# --------------------------------------------------------------------------
# round-2 self-review regressions
# --------------------------------------------------------------------------

def test_unclosed_anchor_does_not_poison_later_blocks():
    from unified_ocr_pipeline_spark.kernels.html_extract import extract_main_text

    broken = ("<html><body><p><a href=x>home</p>"
              "<p>" + "long article text " * 20 + "</p></body></html>")
    text, _ = extract_main_text(broken)
    assert "long article text" in text


def test_truncated_payload_falls_back_to_lenient():
    from unified_ocr_pipeline_spark.kernels import pdf_layout as P

    truncated = b"%PDF-SYN1\nP 1\nB 10 0\nPURCHASE ORDER 4512345678"
    pages, _counts, backend = P.parse_with_backend(truncated)
    assert backend == "syn-lenient"
    assert "PURCHASE ORDER 4512345678" in pages[0]


def test_lenient_counts_image_inside_unterminated_block():
    from unified_ocr_pipeline_spark.kernels import pdf_layout as P

    payload = b"%PDF-SYN1\nP 1\nB 10 0\ntext line\nI 5 3 1000\nE"
    pages, counts = P.parse_pages_lenient_with_images(payload)
    assert counts == [1]
    assert "I 5 3 1000" not in pages[0]


def test_render_pages_refuses_structural_collision():
    import pytest
    from unified_ocr_pipeline_spark.kernels import pdf_layout as P

    with pytest.raises(ValueError):
        P.render_pages([[(10, 0, "COL A\nE\nCOL B")]])


def test_empty_main_html_reports_zero_pages():
    from unified_ocr_pipeline_spark.kernels import document as D

    nav_only = b"<html><body><nav><a href=x>a b c d e f g h</a></nav></body></html>"
    r = D.process_document("http://x/", nav_only, None)
    assert r.status == D.STATUS_EMPTY
    assert r.total_pages == 0 and r.po_page_count == 0


# --- head-metadata extraction (title/description/canonical/published) ----


def test_page_meta_full_head_and_first_wins():
    from unified_ocr_pipeline_spark.kernels.html_extract import extract_page_meta

    html = (
        '<html><head><title> A  \n Title </title>'
        '<meta name="description" content="first desc">'
        '<meta name="description" content="second desc">'
        '<link rel="canonical" href=" http://c.example.com/x ">'
        '<meta property="article:published_time" content="2024-01-02T03:04:05Z">'
        '</head><body><time datetime="1999-01-01">old</time></body></html>'
    )
    title, desc, canon, pub = extract_page_meta(html)
    assert title == "A Title"
    assert desc == "first desc"           # first occurrence wins
    assert canon == "http://c.example.com/x"  # value stripped
    assert pub == "2024-01-02T03:04:05Z"  # meta beats <time>


def test_page_meta_case_insensitive_values_and_self_closed():
    from unified_ocr_pipeline_spark.kernels.html_extract import extract_page_meta

    html = (
        '<head><META NAME="Description" CONTENT="mixed case"/>'
        '<LINK REL="Canonical" HREF="http://c.example.com/y"/></head>'
        '<body><time datetime="2023-12-31">d</time></body>'
    )
    title, desc, canon, pub = extract_page_meta(html)
    assert (title, desc, canon, pub) == (
        None, "mixed case", "http://c.example.com/y", "2023-12-31"
    )


def test_page_meta_absent_empty_and_malformed():
    from unified_ocr_pipeline_spark.kernels.html_extract import extract_page_meta

    assert extract_page_meta("<body><p>no head</p></body>") == (None,) * 4
    assert extract_page_meta("") == (None,) * 4
    # empty <title></title> is NOT a title; a later one may still win
    t, _, _, _ = extract_page_meta("<title></title><title>real</title>")
    assert t == "real"
    # EOF inside <title>: browsers keep the buffered text
    t, _, _, _ = extract_page_meta("<title>trunc")
    assert t == "trunc"
    # meta with no content attr is skipped, not crashed on
    assert extract_page_meta('<meta name="description">')[1] is None


def test_html_to_markdown_structures():
    from unified_ocr_pipeline_spark.kernels.html_extract import html_to_markdown

    md = html_to_markdown(
        "<h1>Title</h1><h3>Sub</h3><p>Body text.</p>"
        "<ul><li>one</li><li>two</li></ul><p>between</p><ol><li>three</li></ol>"
        "<blockquote>wise words</blockquote>"
        '<p>see <a href="http://x.com/p">the docs</a> now</p>'
        "<script>drop()</script><style>p{}</style>"
    )
    assert md == (
        "# Title\n\n### Sub\n\nBody text.\n\n- one\n- two\n\nbetween\n\n"
        "- three\n\n> wise words\n\nsee [the docs](http://x.com/p) now"
    )


def test_html_to_markdown_edges():
    from unified_ocr_pipeline_spark.kernels.html_extract import html_to_markdown

    assert html_to_markdown("") == ""
    assert html_to_markdown(None) == ""
    assert html_to_markdown("<p>plain") == "plain"            # EOF mid-block
    # relative href: anchor text kept, no link syntax
    assert html_to_markdown('<p>go <a href="/x">here</a>.</p>') == "go here."
    # unterminated anchor keeps its text
    assert html_to_markdown('<p>go <a href="http://a.io/">here') == "go here"
    # whitespace normalization inside blocks
    assert html_to_markdown("<h2>  Big \n title </h2>") == "## Big title"


# ---------------------------------------------------------------------------
# fast block segmenter ≡ stdlib HTMLParser reference
# ---------------------------------------------------------------------------

_SOUP = [
    'a &amp; b <P CLASS="x">c &lt;3</p><script>var x = "<div>" && 1;'
    '</script><br/>d < e &#65; <!-- <p>no</p> --> f <b hidden>g</b> '
    '<img src="a>b"> tail',
    '<nav><a href="/x">Home</a> | <a href="/y">About</a></nav><div>'
    + "real content sentence here with enough characters to pass " * 2
    + "</div>",
    "<style>p { color: red; } </style><p>kept &nbsp; text with entities "
    "&copy; and more length padding here</p>",
    "<noscript><p>inside noscript block that is long enough to be content"
    "</p></noscript><p>outside content long enough to be kept around</p>",
    "<a href=x>unclosed anchor <p>paragraph text long enough to be content "
    "after unclosed anchor</p>",
    "<div>x</div",
    "<p>a<p>b<p>c",
    "<SCRIPT>never closed... <p>swallowed</p>",
    "<![CDATA[ <p>not a tag</p> ]]><p>after cdata marker long enough to be "
    "a content block here</p>",
    '<?php echo "<p>hi</p>"; ?><p>after a processing instruction, long '
    "enough to be content</p>",
    "<p>&notanentity; &amp stray amp &#x41;</p>",
    "<table><tr><td>cell one content</td><td>cell two content</td></tr>"
    "</table>",
    "</p>orphan close<p>then text long enough to become a real content "
    "block in the output</p>",
    "<p>" + "x" * 30 + "<a>" + "y" * 30 + "</a></p>",
    "<script/>x<p>" + "q" * 30 + "</p>",
    "<a href=x/>" + "y" * 30,
    '<a href="x"/>' + "y" * 30,
    '<p class="c" />after self closed paragraph, long enough content',
    "<script />sw<p>" + "q" * 30 + "</p>",
    "<script src=a.js>body</script>" + "a" * 30,
    "<a href=a\'b>" + "t" * 30 + "</a>",
    "<b hidden>" + "g" * 30 + "</b>",
    '<p  class = "x"   id=y >' + "z" * 30,
    "<aside>side bar stuff that is long enough to be content by length "
    "alone</aside><main>the main body content, also long enough</main>",
    "<script/>self closed script does not swallow <p>this long enough "
    "content paragraph stays visible</p>",
]


def test_fast_segmenter_matches_stdlib_on_soup():
    from unified_ocr_pipeline_spark.kernels.html_extract import (
        segment_blocks,
        segment_blocks_reference,
    )

    for i, s in enumerate(_SOUP):
        assert segment_blocks(s) == segment_blocks_reference(s), (i, s[:60])


def test_fast_segmenter_matches_stdlib_on_fixture_corpus():
    """Every HTML page the deterministic fixture generator can produce
    must segment identically under the regex fast path and the stdlib
    reference parser — scoring counters included (dataclass equality)."""
    from unified_ocr_pipeline_spark.kernels.html_extract import (
        segment_blocks,
        segment_blocks_reference,
    )
    from unified_ocr_pipeline_spark.sources.fixtures import generate_pages_rows

    for r in generate_pages_rows(800, seed=99):
        h = r["html"]
        if h is None:
            continue
        s = h.decode("utf-8", "replace")
        assert segment_blocks(s) == segment_blocks_reference(s), r["url"]
