"""Sitemap tag-scan tests: index vs urlset, CDATA, missing loc, bad
priority, malformed tails.  Golden check: the sitemap_entries formula
oracle."""

from __future__ import annotations

from unified_ocr_pipeline_spark.sources import sitemap as SM
from unified_ocr_pipeline_spark.sources.sitemap import parse_sitemap


def test_urlset_entries_in_order():
    body = (
        "<urlset>"
        "<url><loc>http://a/1</loc><lastmod>2024-01-02</lastmod>"
        "<priority>0.8</priority></url>"
        "<url><loc> http://a/2 </loc></url>"
        "</urlset>"
    )
    kind, entries = parse_sitemap(body)
    assert kind == "urlset"
    assert entries == [
        (0, "http://a/1", "2024-01-02", 0.8),
        (1, "http://a/2", None, None),
    ]


def test_sitemapindex_and_cdata():
    body = (
        "<sitemapindex>"
        "<sitemap><loc><![CDATA[http://a/s1.xml]]></loc>"
        "<lastmod>2024-02-03</lastmod></sitemap>"
        "</sitemapindex>"
    )
    kind, entries = parse_sitemap(body)
    assert kind == "sitemapindex"
    assert entries == [(0, "http://a/s1.xml", "2024-02-03", None)]


def test_malformed_inputs_never_raise():
    assert parse_sitemap("")[0] == "empty"
    assert parse_sitemap(None)[0] == "empty"
    assert parse_sitemap("<urlset><url><loc>http://a")[0] == "empty"  # no close
    # missing loc → skipped; bad priority → None
    kind, entries = parse_sitemap(
        "<urlset><url><lastmod>2024</lastmod></url>"
        "<url><loc>http://a/x</loc><priority>high</priority></url></urlset>"
    )
    assert kind == "urlset"
    assert entries == [(0, "http://a/x", None, None)]


def test_sitemap_entries_dataframe_empty_row(spark):
    df = spark.createDataFrame(
        [(1, "<urlset><url><loc>http://a/1</loc></url></urlset>"),
         (2, "totally not xml")],
        "fid long, body string",
    )
    rows = {r["fid"]: r for r in SM.sitemap_entries(df, "fid", "body").collect()}
    assert rows[1]["kind"] == "urlset" and rows[1]["loc"] == "http://a/1"
    # broken file stays visible as a single empty-kind row
    assert rows[2]["kind"] == "empty" and rows[2]["ord"] is None


def test_sitemap_coverage_counts(spark):
    from unified_ocr_pipeline_spark.sources.sitemap import (
        sitemap_coverage,
        sitemap_entries,
    )

    body = (
        "<urlset>"
        "<url><loc>http://a.com/1</loc></url>"
        "<url><loc>http://a.com/2</loc></url>"
        "<url><loc>http://b.com/1</loc></url>"
        "</urlset>"
    )
    sm = spark.createDataFrame([(1, body)], "file_id int, body string")
    crawled = spark.createDataFrame(
        [("http://a.com/1",), ("http://a.com/1",), ("http://c.com/x",)],
        "url string",
    )
    got = {
        r["host"]: r
        for r in sitemap_coverage(
            sitemap_entries(sm, "file_id", "body"), crawled
        ).collect()
    }
    assert (got["a.com"]["n_declared"], got["a.com"]["n_crawled"]) == (2, 1)
    assert got["a.com"]["coverage"] == 0.5
    assert got["b.com"]["n_crawled"] == 0 and got["b.com"]["coverage"] == 0.0
    # urls crawled but never declared don't invent hosts
    assert "c.com" not in got


def test_sitemap_coverage_empty_feed_rows_excluded(spark):
    from unified_ocr_pipeline_spark.sources.sitemap import (
        sitemap_coverage,
        sitemap_entries,
    )

    sm = spark.createDataFrame(
        [(1, "<urlset><url><loc>http://a.com/1</loc></url></urlset>"),
         (2, "not a sitemap at all")],
        "file_id int, body string",
    )
    crawled = spark.createDataFrame([("http://a.com/1",)], "url string")
    rows = sitemap_coverage(
        sitemap_entries(sm, "file_id", "body"), crawled
    ).collect()
    assert len(rows) == 1 and rows[0]["coverage"] == 1.0
