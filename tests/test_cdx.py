"""CDX index / revisit classification and JSON-LD extraction tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.functions import html as HTML
from unified_ocr_pipeline_spark.operators import cdx as CDX


def test_cdx_index_revisit_classification(spark):
    rows = [
        # page A: v1, v1 (revisit), v2, v2 (revisit) — note www/case
        # variants of the url key to the SAME surt history
        ("http://www.A.com/x", 10, "v1"),
        ("http://a.com/x", 20, "v1"),
        ("http://A.com/x", 30, "v2"),
        ("http://a.com/x", 40, "v2"),
        # page B: single capture
        ("http://b.com/y", 15, "v1"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long, html string")
    out = CDX.cdx_index(df).orderBy("surt", "ts").collect()
    a = [r for r in out if r["surt"] == "com,a)/x"]
    b = [r for r in out if r["surt"] == "com,b)/y"]
    assert len(a) == 4 and len(b) == 1
    assert [r["capture_no"] for r in a] == [0, 1, 2, 3]
    assert [r["record_type"] for r in a] == [
        "response", "revisit", "response", "revisit"]
    # revisits point at their response's ts
    assert [r["response_ts"] for r in a] == [10, 10, 30, 30]
    assert b[0]["record_type"] == "response"
    assert b[0]["response_ts"] == 15


def test_cdx_same_digest_different_page_is_not_revisit(spark):
    rows = [
        ("http://a.com/x", 10, "same"),
        ("http://a.com/OTHER", 20, "same"),  # same bytes, different surt
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long, html string")
    out = CDX.cdx_index(df).collect()
    assert all(r["record_type"] == "response" for r in out)


def test_cdx_merge_against_stored_index(spark):
    stored_caps = spark.createDataFrame(
        [("http://a.com/x", 10, "v1"), ("http://a.com/x", 20, "v2")],
        "url string, warc_ts long, html string",
    )
    stored = CDX.cdx_index(stored_caps)
    new_caps = spark.createDataFrame(
        [
            ("http://www.A.com/x", 30, "v2"),   # matches stored response
            ("http://a.com/x", 40, "v3"),       # fresh content → response
            ("http://a.com/x", 50, "v3"),       # within-batch dup → revisit
            ("http://b.com/y", 35, "v2"),       # same bytes, new page → response
        ],
        "url string, warc_ts long, html string",
    )
    out = {
        (r["surt"], r["ts"]): (r["record_type"], r["response_ts"])
        for r in CDX.cdx_merge(stored, new_caps).collect()
    }
    assert out[("com,a)/x", 30)] == ("revisit", 20)
    assert out[("com,a)/x", 40)] == ("response", 40)
    assert out[("com,a)/x", 50)] == ("revisit", 40)
    assert out[("com,b)/y", 35)] == ("response", 35)


def test_storage_savings(spark):
    rows = [
        ("http://a.com/x", 10, "v1"),
        ("http://a.com/x", 20, "v1"),
        ("http://a.com/x", 30, "v1"),
        ("http://b.com/y", 10, "w"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long, html string")
    got = {
        r["host"]: r
        for r in CDX.storage_savings(CDX.cdx_index(df)).collect()
    }
    assert got["com,a"]["n_captures"] == 3
    assert got["com,a"]["n_revisits"] == 2
    assert abs(got["com,a"]["revisit_share"] - 2 / 3) < 1e-9
    assert got["com,b"]["n_revisits"] == 0


def test_meta_robots_directives(spark):
    cases = [
        ('<meta name="robots" content="noindex, follow">',
         ("noindex, follow", True, False)),
        ('<meta charset="x"><meta name="robots" content="index,nofollow">',
         ("index,nofollow", False, True)),
        ('<meta name="robots" content="none">', ("none", True, True)),
        ('<META name="robots" content=" NOINDEX ,  NOFOLLOW ">',
         (" NOINDEX ,  NOFOLLOW ", True, True)),
        ("<title>no robots meta</title>", ("", False, False)),
    ]
    df = spark.createDataFrame(
        [(f"<html><head>{c}</head></html>",) for c, _ in cases], ["html"]
    )
    got = df.select(*HTML.meta_robots(F.col("html"))).collect()
    for (_, want), row in zip(cases, got):
        assert (row["robots_content"], row["noindex"], row["nofollow"]) == want


def test_jsonld_blocks_and_fields(spark):
    pages = [
        # plain block + a second with extra attributes, multiline body
        (
            '<html><script type="application/ld+json">'
            '{"@type":"Article","name":"T1"}</script>'
            '<script async type="application/ld+json">\n'
            '{"@type":"Product",\n "name":"P1"}\n</script></html>'
        ),
        "<html><body>no structured data</body></html>",
    ]
    df = spark.createDataFrame([(p,) for p in pages], ["html"])
    rows = df.select(
        HTML.jsonld_blocks(F.col("html")).alias("blocks")
    ).collect()
    assert len(rows[0]["blocks"]) == 2
    assert rows[1]["blocks"] == []
    typed = (
        df.select(F.posexplode(HTML.jsonld_blocks(F.col("html")))
                  .alias("pos", "block"))
        .select(
            "pos",
            HTML.jsonld_field(F.col("block"), "@type").alias("t"),
            HTML.jsonld_field(F.col("block"), "name").alias("n"),
            HTML.jsonld_field(F.col("block"), "missing").alias("m"),
        )
        .collect()
    )
    assert [(r["pos"], r["t"], r["n"], r["m"]) for r in typed] == [
        (0, "Article", "T1", None),
        (1, "Product", "P1", None),
    ]
