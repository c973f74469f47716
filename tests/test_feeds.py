"""RSS/Atom feed parsing (sources/feeds.py) and the dedup cluster-size
histogram query."""

from unified_ocr_pipeline_spark.sources.feeds import parse_feed


def test_parse_rss_items():
    body = (
        "<rss><channel>"
        "<item><title>A</title><link>http://h/a</link>"
        "<pubDate>2024-02-01</pubDate><guid>g1</guid></item>"
        "<item><title>B</title><link>http://h/b</link></item>"
        "</channel></rss>"
    )
    kind, entries = parse_feed(body)
    assert kind == "rss"
    assert entries[0] == (0, "A", "http://h/a", "2024-02-01", "g1")
    assert entries[1] == (1, "B", "http://h/b", None, None)


def test_parse_atom_href_link_and_id():
    body = (
        '<feed><entry><title>T</title><link rel="alternate" '
        'href="http://h/x"/><updated>2024-02-02</updated>'
        "<id>tag:1</id></entry></feed>"
    )
    kind, entries = parse_feed(body)
    assert kind == "atom"
    assert entries == [(0, "T", "http://h/x", "2024-02-02", "tag:1")]


def test_parse_feed_tolerates_garbage():
    # CDATA title, mixed case tags, truncated trailing item, entry
    # without any link (skipped)
    body = (
        "<RSS><Item><Title><![CDATA[Hello & <stuff>]]></Title>"
        "<Link>http://h/ok</Link></Item>"
        "<item><title>no link</title></item>"
        "<item><title>cut off mid-"
    )
    kind, entries = parse_feed(body)
    assert kind == "rss"
    assert entries == [(0, "Hello & <stuff>", "http://h/ok", None, None)]


def test_parse_feed_empty_kinds():
    assert parse_feed("")[0] == "empty"
    assert parse_feed("<html>not a feed</html>")[0] == "empty"
    assert parse_feed(None)[0] == "empty"


def test_feed_entries_dataframe(spark):
    from unified_ocr_pipeline_spark.sources.feeds import feed_entries

    df = spark.createDataFrame(
        [
            (1, "<item><title>A</title><link>http://h/a</link></item>"),
            (2, "nothing here"),
        ],
        "file_id int, body string",
    )
    rows = {
        (r["file_id"], r["ord"]): r for r in feed_entries(df, "file_id", "body").collect()
    }
    assert rows[(1, 0)]["kind"] == "rss" and rows[(1, 0)]["link"] == "http://h/a"
    # broken feed stays visible as one empty-marker row
    assert rows[(2, None)]["kind"] == "empty" and rows[(2, None)]["link"] is None


def test_component_sizes_histogram(spark):
    """Planted 3-node components + singletons: histogram is exactly
    {3: n_planted, 1: n_singletons}."""
    import __spark_entry__ as E

    got = {
        r["csize"]: r["n_components"]
        for r in E.queries()["component_sizes"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # 50 originals + 2x5 planted copies = 60 nodes; the 5 planted
    # triples are present; organic near-dups in the synthetic corpus may
    # add a few extra small clusters, so pin totals not exact counts
    assert sum(size * n for size, n in got.items()) == 60
    assert got[3] >= 5
    assert got[1] >= 40


def test_parse_atom_prefers_rel_alternate_over_self():
    # Atom entries commonly list rel="self"/"edit" before the article
    # link — the fetch url must be the rel="alternate" (or rel-less) one
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = (
        "<feed><entry><title>T</title>"
        '<link rel="self" href="http://h/api/entry/1"/>'
        '<link rel="edit" href="http://h/api/entry/1/edit"/>'
        '<link rel="alternate" href="http://h/article/1"/>'
        "<id>a1</id></entry></feed>"
    )
    kind, entries = parse_feed(body)
    assert kind == "atom"
    assert entries[0][2] == "http://h/article/1"


def test_parse_atom_relless_link_counts_as_alternate():
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = (
        "<feed><entry><title>T</title>"
        '<link rel="self" href="http://h/api/1"/>'
        '<link href="http://h/article/1"/>'
        "<id>a1</id></entry></feed>"
    )
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/article/1"


def test_parse_atom_only_self_falls_back_to_first():
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = (
        "<feed><entry><title>T</title>"
        '<link rel="self" href="http://h/api/1"/>'
        "<id>a1</id></entry></feed>"
    )
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/api/1"


def test_parse_atom_quote_styles():
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = (
        "<feed><entry><title>T</title>"
        "<link rel='self' href='http://h/api/1'/>"
        "<link rel=alternate href=http://h/article/1>"
        "<id>a1</id></entry></feed>"
    )
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/article/1"


def test_parse_atom_rel_inside_href_value_not_misread():
    # 'rel=' inside a URL query string is not the rel ATTRIBUTE: the
    # rel-less first link is the spec-default alternate and must win
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = (
        "<feed><entry><title>T</title>"
        '<link href="http://h/a?rel=bookmark"/>'
        '<link rel="alternate" href="http://h/other"/>'
        "<id>a1</id></entry></feed>"
    )
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/a?rel=bookmark"


def test_parse_atom_link_with_angle_bracket_in_title_attr():
    # raw '>' is legal in XML attribute values — it must not truncate
    # the link tag (same guard as the html.py head extractors)
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = (
        "<feed><entry><title>T</title>"
        '<link rel="self" href="http://h/api/1"/>'
        '<link rel="alternate" title="A > B" href="http://h/art"/>'
        "<id>a1</id></entry></feed>"
    )
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/art"


def test_parse_atom_rel_after_closing_quote_still_attribute():
    # minimized markup: rel directly after the previous value's quote
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = (
        "<feed><entry><title>T</title>"
        '<link href="http://h/self.xml"rel="self"/>'
        '<link rel="alternate" href="http://h/art"/>'
        "<id>a1</id></entry></feed>"
    )
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/art"


def test_parse_atom_minimized_rel_before_href():
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = ('<feed><entry><title>T</title>'
            '<link rel="alternate"href="http://h/art"/>'
            "<id>a1</id></entry></feed>")
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/art"


def test_parse_atom_unbalanced_quote_in_other_attr():
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = ("<feed><entry><title>T</title>"
            "<link title=o'brien href=\"http://h/art\"/>"
            "<id>a1</id></entry></feed>")
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/art"


def test_parse_atom_rel_like_text_inside_href_value_with_quote():
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = ("<feed><entry><title>T</title>"
            "<link href=\"http://h/article?t='rel=x\"/>"
            '<link href="http://h/comments"/>'
            "<id>a1</id></entry></feed>")
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/article?t='rel=x"


def test_parse_atom_href_preserves_other_quote_kind_at_edges():
    # stripping must remove exactly the ONE enclosing pair — an
    # apostrophe that legitimately ends the value survives
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = ("<feed><entry><title>T</title>"
            "<link href=\"http://h/art?q='x'\"/>"
            "<id>a1</id></entry></feed>")
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/art?q='x'"


def test_parse_atom_broken_link_recovered_next_to_clean_one():
    # per-position fallback: the unbalanced-quote alternate link is
    # recovered even though a sibling link parsed strictly
    from unified_ocr_pipeline_spark.sources.feeds import parse_feed

    body = ("<feed><entry><title>T</title>"
            '<link rel="self" href="http://h/self"/>'
            "<link title=o'brien rel=\"alternate\" href=\"http://h/art\"/>"
            "<id>a1</id></entry></feed>")
    _, entries = parse_feed(body)
    assert entries[0][2] == "http://h/art"
