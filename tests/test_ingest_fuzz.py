"""Hypothesis fuzz: the ingestion parsers (WARC, robots, sitemap,
charset) must never raise on arbitrary input — malformed crawl bytes
are data, not exceptions — plus structural invariants on whatever they
do return, and a plan assertion that LM scoring stays shuffle-free."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from unified_ocr_pipeline_spark.kernels.sniff import detect_charset
from unified_ocr_pipeline_spark.operators.robots import parse_robots_body
from unified_ocr_pipeline_spark.sources.sitemap import parse_sitemap
from unified_ocr_pipeline_spark.sources.warc import _parse_blob


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_warc_parse_never_raises(blob):
    rows = _parse_blob(blob)
    # complete records reconstruct to in-bounds slices; at most one
    # truncated row, always last
    trunc = [r for r in rows if r[1] == "truncated"]
    assert len(trunc) <= 1
    if trunc:
        assert rows[-1][1] == "truncated"
    for rec in rows:
        if rec[1] != "truncated":
            assert rec[4] == len(rec[5])


_ROBOTS_LINE = st.one_of(
    st.text(max_size=60),  # arbitrary junk lines
    st.builds(
        lambda k, v: f"{k}: {v}",
        st.sampled_from(
            ["User-agent", "user-AGENT", "Allow", "Disallow", "Crawl-delay",
             "Sitemap", "Host", "Noindex"]
        ),
        st.text(alphabet="ab/*.$% \t0-9", max_size=20),
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_ROBOTS_LINE, max_size=20), st.text(max_size=20))
def test_robots_parse_never_raises(lines, agent):
    # structured generation: a healthy share of inputs form real groups,
    # rules, wildcards, and delays — not just unparseable noise
    body = "\n".join(lines)
    rules, n_wild = parse_robots_body(body, agent or "*")
    assert n_wild >= 0
    import re as _re

    for path, allow, rx in rules:
        assert path  # empty rules are filtered
        assert isinstance(allow, bool)
        if rx is None:
            assert "*" not in path and not path.endswith("$")
        else:
            _re.compile(rx)  # every emitted wildcard pattern compiles
            assert rx.startswith("^")
    from unified_ocr_pipeline_spark.operators.robots import (
        parse_crawl_delay,
        parse_sitemap_directives,
    )

    d = parse_crawl_delay(body, agent or "*")
    assert d is None or d >= 0
    for u in parse_sitemap_directives(body):
        assert u.startswith(("http://", "https://"))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_sitemap_parse_never_raises(body):
    kind, entries = parse_sitemap(body)
    assert kind in ("urlset", "sitemapindex", "empty")
    for o, loc, lastmod, prio in entries:
        assert loc  # loc-less entries are skipped
        assert prio is None or isinstance(prio, float)
    assert [e[0] for e in entries] == list(range(len(entries)))


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=1024))
def test_charset_detect_never_raises(payload):
    cs, text = detect_charset(payload)
    if not payload:
        assert cs == "empty" and text is None
    else:
        assert cs in (
            "utf-16le", "utf-16be", "utf-8-sig", "utf-8", "ascii", "latin-1"
        )
        assert text is not None  # every non-empty payload decodes


def test_lm_score_plan_is_shuffle_free(spark):
    """The LM scoring pass must stay narrow: broadcast dict + Arrow
    batch kernel, no exchange between the scan and the output."""
    import io
    from contextlib import redirect_stdout

    from unified_ocr_pipeline_spark.operators import lm as LM

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model, meta = LM.lm_train(df, "text", "doc_id", sample_mod=4, vocab_size=64)
    scored = LM.lm_score(df, model, meta, "text", "doc_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        scored.explain("formatted")
    assert "Exchange" not in buf.getvalue()
