"""Page head-metadata extraction: HTML -> (title, description, canonical,
published) columns.

Crawl curation leans on head metadata constantly — canonical urls collapse
syndicated duplicates before any content hash runs, titles/descriptions feed
quality classifiers and search indexing, and publish dates drive freshness
mixing. The reference is a PDF pipeline with no HTML surface; this family is
mandated by the round brief's web-scale posture (Common-Crawl-style pages),
and the extraction cascade mirrors trafilatura's metadata step: explicit
<meta> beats markup (<time datetime>), first occurrence wins.

Scale shape: the parse is the sanctioned Arrow-batch kernel pattern
(kernels/html_extract.extract_page_meta — compiled stdlib parser, one
JVM<->Python crossing per batch, runs on scan partitions BEFORE any
exchange). Raw HTML never shuffles; only the four small string columns
leave the Python stage. Canonical-dedup afterwards is one hash-agg on the
canonical url (coalesced to the fetch url), the same exchange shape as the
pipeline's url dedup.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.html_extract import extract_page_meta

_META_SCHEMA = (
    "url string, title string, description string, "
    "canonical_url string, published string"
)


def page_metadata(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """One row per page: (url, title, description, canonical_url,
    published), NULL where the page carries no such field. HTML may be
    string or binary (utf-8, errors replaced)."""

    def gen(batches: Iterator["pd.DataFrame"]):  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {"url": [], "title": [], "description": [],
                   "canonical_url": [], "published": []}
            for url, html in zip(pdf["_url"], pdf["_html"]):
                if html is None:
                    title = desc = canon = pub = None
                else:
                    if isinstance(html, (bytes, bytearray)):
                        html = bytes(html).decode("utf-8", errors="replace")
                    title, desc, canon, pub = extract_page_meta(html)
                out["url"].append(url)
                out["title"].append(title)
                out["description"].append(desc)
                out["canonical_url"].append(canon)
                out["published"].append(pub)
            yield pd.DataFrame(out)

    narrow = pages.select(
        F.col(url_col).alias("_url"), F.col(html_col).alias("_html")
    )
    return narrow.mapInPandas(gen, schema=_META_SCHEMA)


def canonical_dedup(meta: DataFrame) -> DataFrame:
    """Collapse syndicated/parameterized fetches onto their declared
    canonical url: group by coalesce(canonical_url, url), keep the
    lexicographically-least member url as the fetch representative and
    count the collapsed members. One hash-agg shuffle on the canonical
    key; partial aggregation collapses map-side duplicates first."""
    keyed = meta.select(
        F.coalesce("canonical_url", "url").alias("canonical_key"), "url"
    )
    return keyed.groupBy("canonical_key").agg(
        F.count("*").alias("n_fetches"),
        F.min("url").alias("representative_url"),
    )


def page_markdown(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(url, markdown): structure-preserving extraction — headings,
    list items, blockquotes, and [text](url) links survive as markdown
    instead of flattening to plain text (the format modern LLM-corpus
    pipelines keep because structure survives tokenization). Same
    scan-partition Arrow pass as page_metadata; raw HTML never shuffles."""
    from ..kernels.html_extract import html_to_markdown

    def gen(batches: Iterator["pd.DataFrame"]):  # noqa: F821
        import pandas as pd

        for pdf in batches:
            urls, mds = [], []
            for url, html in zip(pdf["_url"], pdf["_html"]):
                if html is None:
                    md = ""
                else:
                    if isinstance(html, (bytes, bytearray)):
                        html = bytes(html).decode("utf-8", errors="replace")
                    md = html_to_markdown(html)
                urls.append(url)
                mds.append(md)
            yield pd.DataFrame({"url": urls, "markdown": mds})

    narrow = pages.select(
        F.col(url_col).alias("_url"), F.col(html_col).alias("_html")
    )
    return narrow.mapInPandas(gen, schema="url string, markdown string")


def host_lang_profile(
    df: DataFrame, host_col: str, lang_col: str
) -> DataFrame:
    """Per-host language profile: document count, majority language
    (ties by language ascending), and the language entropy in nats —
    the CCNet-style routing view (a host that is 95% one language gets
    that language's pipeline; a high-entropy host is mixed content or
    mislabeled and deserves per-document language ID).

    Returns (host, n_docs, majority_lang, lang_entropy double).

    Scale shape: one (host, lang)-keyed hash-agg with map-side combine
    (the shuffle carries host x language cardinality, not documents),
    one host-keyed window for the totals (language fan-in per host is
    tiny, no skew), and a final host-keyed agg. The majority pick is a
    min over (-count, lang) structs — no second pass, no sort.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(host_col).alias("host"), F.col(lang_col).alias("lang"))
        .groupBy("host", "lang")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("host")
    counts = counts.withColumn("n", F.sum("c").over(w))
    p = F.col("c").cast("double") / F.col("n")
    return counts.groupBy("host").agg(
        F.max("n").alias("n_docs"),
        F.min(
            F.struct((-F.col("c")).alias("nc"), F.col("lang").alias("l"))
        )["l"].alias("majority_lang"),
        F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
    )


def page_tables(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Structured-table mining: one row per (url, table_idx, row_idx,
    col_idx, cell) across every <table> on every page — the WebTables /
    WDC-web-table extraction shape (Cafarella et al. 2008: relational
    tables embedded in HTML are the web's largest structured corpus;
    training-data pipelines mine them for table-QA and text-to-SQL sets).

    ENTIRELY JVM-side: three lazy ``regexp_extract_all`` passes
    (table -> tr -> td/th) fanned out with ``posexplode``, inner markup
    stripped with ``regexp_replace`` — all inside codegen on the scan
    partitions, no Python, and the raw HTML never enters an exchange
    (each explode is a narrow generate over the scanned row). Nested
    tables surface under the outer block (regex-extractor contract, see
    functions/html.py).
    """
    from ..functions import html as H

    t = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(H.table_blocks(F.col(html_col))).alias("table_idx", "_tbl"),
    )
    r = t.select(
        "url", "table_idx",
        F.posexplode(H.table_rows(F.col("_tbl"))).alias("row_idx", "_row"),
    )
    c = r.select(
        "url", "table_idx", "row_idx",
        F.posexplode(H.table_cells(F.col("_row"))).alias("col_idx", "_cell"),
    )
    return c.select(
        "url", "table_idx", "row_idx", "col_idx",
        H.cell_text(F.col("_cell")).alias("cell"),
    )


def template_profile(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-host structural-template census over the DOM skeleton key
    (functions/html.skeleton_key): how many pages each host serves from
    each template, and each template's share of the host's pages.
    Template families with huge page counts and near-total host share
    are machine-generated farms (calendars, faceted listings, tag
    clouds) — the crawl scheduler caps them; high template diversity is
    organic content.

    Returns (host, skeleton, n_pages, host_pages, template_share).

    Scale shape: skeleton_key is codegen on the scan; then ONE
    (host, skeleton) hash-agg with map-side combine, and the per-host
    total is a window over the ALREADY-aggregated (tiny) relation — no
    second scan, no second full-size exchange.
    """
    from pyspark.sql import Window

    from ..functions import html as H

    keyed = pages.select(
        F.regexp_extract(F.col(url_col), r"^https?://([^/?#]+)", 1).alias("host"),
        H.skeleton_key(F.col(html_col)).alias("skeleton"),
    )
    per = keyed.groupBy("host", "skeleton").agg(F.count("*").alias("n_pages"))
    w = Window.partitionBy("host")
    return per.select(
        "host", "skeleton", "n_pages",
        F.sum("n_pages").over(w).alias("host_pages"),
        F.round(F.col("n_pages") / F.sum("n_pages").over(w), 4).alias(
            "template_share"
        ),
    )


def hreflang_graph(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per declared translation edge: (url, hreflang, alt_url)
    from ``<link rel="alternate" hreflang>`` head tags — the
    DECLARED multilingual graph (sites publishing their own translation
    map per Google's indexing contract), complementing the INFERRED
    STRAND URL pairs. Pure JVM posexplode fan-out on scan partitions —
    raw HTML never crosses an exchange; x-default rows kept (they name
    the fallback page)."""
    from ..functions import html as H

    tags = H.hreflang_tags(F.col(html_col))
    exploded = pages.select(
        F.col(url_col).alias("url"), F.posexplode(tags).alias("ord", "tag")
    )
    return exploded.select(
        "url",
        F.col("ord").cast("int").alias("ord"),
        H.hreflang_lang(F.col("tag")).alias("hreflang"),
        H.hreflang_href(F.col("tag")).alias("alt_url"),
    )


def og_cards(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, og_title, og_type, og_image, og_url): the OpenGraph social
    card per page — four codegen regexp_extracts, no explode, no
    shuffle; NULL where the page declares no card."""
    from ..functions import html as H

    return pages.select(
        F.col(url_col).alias("url"), *H.og_meta(F.col(html_col))
    )


def feed_discovery(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, ord, feed_type, feed_url): feed-autodiscovery links from
    page heads — the crawl-side entry point into the RSS/Atom parser
    (``sources/feeds.py``); same posexplode-on-scan-partitions shape as
    ``hreflang_graph``, raw HTML never crosses an exchange."""
    from ..functions import html as H

    tags = H.feed_link_tags(F.col(html_col))
    return pages.select(
        F.col(url_col).alias("url"), F.posexplode(tags).alias("ord", "tag")
    ).select(
        "url",
        F.col("ord").cast("int").alias("ord"),
        H.feed_link_type(F.col("tag")).alias("feed_type"),
        H.feed_link_href(F.col("tag")).alias("feed_url"),
    )
