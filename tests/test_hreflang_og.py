"""hreflang translation-graph and OpenGraph card extraction."""

from pyspark.sql import functions as F


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_hreflang_edges(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = (
        '<html><head>'
        '<link rel="alternate" hreflang="en" href="http://h/en/x"/>'
        '<link rel="alternate" hreflang="fr" href="http://h/fr/x"/>'
        '<link rel="alternate" hreflang="x-default" href="http://h/x"/>'
        '<link rel="stylesheet" href="http://h/css"/>'
        '</head></html>'
    )
    got = MD.hreflang_graph(_pages(spark, [("http://h/x", html)])).collect()
    edges = {(r["ord"], r["hreflang"], r["alt_url"]) for r in got}
    assert edges == {
        (0, "en", "http://h/en/x"),
        (1, "fr", "http://h/fr/x"),
        (2, "x-default", "http://h/x"),
    }


def test_hreflang_case_insensitive_and_no_tags(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    rows = [
        ("u1", '<LINK REL="alternate" HREFLANG="de" HREF="http://h/de"/>'),
        ("u2", "<html><head></head></html>"),
    ]
    got = MD.hreflang_graph(_pages(spark, rows)).collect()
    assert [(r["url"], r["hreflang"], r["alt_url"]) for r in got] == [
        ("u1", "de", "http://h/de")
    ]


def test_og_cards_fields_and_nulls(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = (
        '<head><meta property="og:title" content="Hello"/>'
        '<meta property="og:image" content="http://h/img.png"/>'
        '<meta property="og:url" content="http://h/page"/></head>'
    )
    r = MD.og_cards(_pages(spark, [("http://h/page", html)])).first()
    assert r["og_title"] == "Hello"
    assert r["og_image"] == "http://h/img.png"
    assert r["og_type"] is None  # absent property -> NULL, not ''
    assert r["og_url"] == "http://h/page"


def test_og_cards_no_card(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    r = MD.og_cards(_pages(spark, [("u", "<html/>")])).first()
    assert (
        r["og_title"] is None and r["og_type"] is None
        and r["og_image"] is None and r["og_url"] is None
    )


def test_feed_discovery_types_and_order(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = (
        '<head>'
        '<link rel="alternate" type="application/rss+xml" href="http://h/feed"/>'
        '<link rel="alternate" type="application/atom+xml" href="http://h/atom"/>'
        '<link rel="alternate" hreflang="fr" href="http://h/fr"/>'
        '</head>'
    )
    got = MD.feed_discovery(_pages(spark, [("u", html)])).collect()
    assert [(r["ord"], r["feed_type"], r["feed_url"]) for r in got] == [
        (0, "rss", "http://h/feed"),
        (1, "atom", "http://h/atom"),
    ]


def test_feed_discovery_none(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    assert MD.feed_discovery(_pages(spark, [("u", "<html/>")])).count() == 0


def test_mad_approx_mode_close_to_exact(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    df = spark.createDataFrame(
        [(i, "h", v) for i, v in enumerate([10, 11, 12, 13, 14, 500])],
        "id int, g string, x int",
    )
    got = {r["id"]: r for r in ST.mad_outliers(df, "g", "x", approx=True).collect()}
    # sketch percentile still flags the planted outlier and nothing else
    assert got[5]["is_outlier"] is True
    assert not any(got[i]["is_outlier"] for i in range(5))


def test_hreflang_quote_styles_and_attribute_order(spark):
    # single-quoted, unquoted, and reordered attributes — common in
    # real crawl HTML — must all extract
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = (
        "<head>"
        "<link rel='alternate' hreflang='fr' href='http://h/fr'/>"
        '<link hreflang="de" href="http://h/de" rel="alternate"/>'
        "<link rel=alternate hreflang=es href=http://h/es>"
        '<link rel="stylesheet" hreflang="xx" href="http://h/css"/>'
        "</head>"
    )
    got = MD.hreflang_graph(_pages(spark, [("u", html)])).collect()
    edges = {(r["hreflang"], r["alt_url"]) for r in got}
    assert edges == {
        ("fr", "http://h/fr"),
        ("de", "http://h/de"),
        ("es", "http://h/es"),
    }


def test_og_cards_quote_styles_and_order(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = (
        "<head><meta content='Hello World' property='og:title'/>"
        '<meta property="og:image:width" content="640"/>'
        '<meta property="og:image" content="http://h/i.png"/>'
        "<meta property=og:type content=article></head>"
    )
    r = MD.og_cards(_pages(spark, [("u", html)])).first()
    assert r["og_title"] == "Hello World"
    assert r["og_image"] == "http://h/i.png"  # not swallowed by :width
    assert r["og_type"] == "article"


def test_feed_discovery_quote_styles_and_order(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = (
        "<head>"
        "<link type='application/rss+xml' rel='alternate' href='/feed.rss'/>"
        '<link rel="alternate" type="application/atom+xml" href="/feed.atom"/>'
        '<link rel="stylesheet" type="text/css" href="/css"/>'
        "</head>"
    )
    got = MD.feed_discovery(_pages(spark, [("u", html)])).collect()
    assert {(r["feed_type"], r["feed_url"]) for r in got} == {
        ("rss", "/feed.rss"),
        ("atom", "/feed.atom"),
    }


def test_og_unquoted_property_as_final_attribute(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = '<head><meta content="article" property=og:type></head>'
    r = MD.og_cards(_pages(spark, [("u", html)])).first()
    assert r["og_type"] == "article"


def test_og_content_with_angle_bracket_not_truncated(spark):
    # '>' inside a quoted attribute value must not truncate the tag
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = '<head><meta property="og:title" content="Home > Products"/></head>'
    r = MD.og_cards(_pages(spark, [("u", html)])).first()
    assert r["og_title"] == "Home > Products"


def test_feed_discovery_ignores_data_type_attribute(spark):
    # data-type must not satisfy the type anchor ('-' is a word
    # boundary, so \btype would have matched)
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = ('<head><link rel="alternate" data-type="application/rss+xml" '
            'href="/not-a-feed"/>'
            '<link rel="alternate" type="application/rss+xml" '
            'href="/feed"/></head>')
    got = MD.feed_discovery(_pages(spark, [("u", html)])).collect()
    assert [(r["feed_type"], r["feed_url"]) for r in got] == [("rss", "/feed")]


def test_hreflang_without_href_yields_no_edge(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = ('<head><link rel="alternate" hreflang="fr"/>'
            '<link rel="alternate" hreflang="de" href="http://h/de"/></head>')
    got = MD.hreflang_graph(_pages(spark, [("u", html)])).collect()
    assert [(r["hreflang"], r["alt_url"]) for r in got] == [("de", "http://h/de")]


def test_feed_discovery_type_with_charset_param(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = ('<head><link rel="alternate" '
            'type="application/rss+xml; charset=utf-8" href="/feed"/>'
            "<link rel='alternate' type='application/atom+xml ' "
            "href='/a'/></head>")
    got = MD.feed_discovery(_pages(spark, [("u", html)])).collect()
    assert {(r["feed_type"], r["feed_url"]) for r in got} == {
        ("rss", "/feed"), ("atom", "/a"),
    }
