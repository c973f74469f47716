"""Crawl link-graph extraction: page HTML -> outlink edges -> domain stats.

The north star's corpus is Common-Crawl-style pages; the link graph is
the other first-class artifact a crawl pipeline produces besides text
(PageRank-family quality priors, host-level dedup hints, seed discovery).
The reference is a single-host document pipeline with no link surface;
this family is mandated by the round brief's web-scale posture.

Scale shape: href parsing is the sanctioned Arrow-batch kernel pattern
(kernels/html_extract.extract_links, compiled stdlib parser, one
JVM<->Python crossing per batch, runs on scan partitions BEFORE any
exchange — edges leave the Python stage as small strings, the raw HTML
never shuffles). Host extraction and the degree aggregation are JVM
expressions + one hash-agg keyed by host (map-side partial combine).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.html_extract import extract_links

_HOST_RE = r"^https?://([^/?#]+)"


def outlink_edges(pages: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """One row per (src_url, href) absolute outlink, document order
    preserved per page via link_pos. HTML may be string or binary
    (utf-8, errors replaced)."""

    def gen(batches: Iterator["pd.DataFrame"]):  # noqa: F821
        import pandas as pd

        for pdf in batches:
            srcs, hrefs, poss = [], [], []
            for url, html in zip(pdf["_url"], pdf["_html"]):
                if html is None:
                    continue
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                for i, href in enumerate(extract_links(html)):
                    srcs.append(url)
                    hrefs.append(href)
                    poss.append(i)
            yield pd.DataFrame(
                {"src_url": srcs, "href": hrefs, "link_pos": poss}
            )

    narrow = pages.select(
        F.col(url_col).alias("_url"), F.col(html_col).alias("_html")
    )
    return narrow.mapInPandas(
        gen, schema="src_url string, href string, link_pos int"
    )


def domain_link_stats(edges: DataFrame) -> DataFrame:
    """Aggregate the edge list to per-destination-host stats:
    (dst_host, n_links, n_src_urls). One hash-agg; the two counts share
    the shuffle (count + count_distinct via expand)."""
    return (
        edges.select(
            F.regexp_extract("href", _HOST_RE, 1).alias("dst_host"), "src_url"
        )
        .where(F.col("dst_host") != "")
        .groupBy("dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.count_distinct("src_url").alias("n_src_urls"),
        )
    )
