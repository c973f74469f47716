"""Sitemap parsing — the other half of crawl discovery next to
``operators/robots.py``.

sitemaps.org XML comes in two kinds: ``<urlset>`` leaves carrying
``<url><loc/><lastmod/><priority/></url>`` entries, and
``<sitemapindex>`` nodes pointing at child sitemaps.  Crawl-scale
sitemap files are frequently malformed (truncated, unescaped
ampersands, stray bytes), so parsing is a tolerant tag scan — the same
recovery philosophy as ``kernels/html_extract`` — not a strict XML
parser that would fail the task on the first bad file.

Spark shape: one narrow mapInPandas pass over sitemap bodies → one row
per entry with its ordinal; index rows feed back into the fetch
frontier (join against ``robots.schedule_fetches``), leaf rows into
URL admission.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_BLOCK = re.compile(r"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.S | re.I)
_FIELD = re.compile(
    r"<(loc|lastmod|priority)\b[^>]*>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</\1>",
    re.S | re.I,
)


def parse_sitemap(body: str) -> tuple[str, list[tuple]]:
    """(kind, [(ord, loc, lastmod, priority_float_or_None)]).

    kind: 'urlset' if any <url> block parses, 'sitemapindex' if any
    <sitemap> block does, else 'empty'.  Entries missing <loc> are
    skipped (nothing to fetch); non-numeric priority becomes None
    rather than an error."""
    entries: list[tuple] = []
    kinds = set()
    for i, mtch in enumerate(_BLOCK.finditer(body or "")):
        tag = mtch.group(1).lower()
        fields = {
            k.lower(): v.strip()
            for k, v in _FIELD.findall(mtch.group(2))
        }
        loc = fields.get("loc")
        if not loc:
            continue
        prio = None
        if "priority" in fields:
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        kinds.add("urlset" if tag == "url" else "sitemapindex")
        entries.append((len(entries), loc, fields.get("lastmod"), prio))
    if "urlset" in kinds:
        kind = "urlset"
    elif "sitemapindex" in kinds:
        kind = "sitemapindex"
    else:
        kind = "empty"
    return kind, entries


def sitemap_entries(
    df: DataFrame,
    id_col: str,
    body_col: str,
) -> DataFrame:
    """(id_col, kind string, ord int, loc string, lastmod string,
    priority double) — one row per parsed entry; sitemaps with no
    parseable entries yield a single (kind='empty', ord NULL) row so
    broken files stay visible downstream."""
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, ords, locs, lastmods, prios = [], [], [], [], [], []
            for i, body in zip(pdf[id_col], pdf[body_col]):
                kind, entries = parse_sitemap(
                    body if body is not None else ""
                )
                if not entries:
                    ids.append(i)
                    kinds.append(kind)
                    ords.append(None)
                    locs.append(None)
                    lastmods.append(None)
                    prios.append(None)
                    continue
                for o, loc, lastmod, prio in entries:
                    ids.append(i)
                    kinds.append(kind)
                    ords.append(o)
                    locs.append(loc)
                    lastmods.append(lastmod)
                    prios.append(prio)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "kind": pd.Series(kinds, dtype="object"),
                    "ord": pd.Series(ords, dtype="object"),
                    "loc": pd.Series(locs, dtype="object"),
                    "lastmod": pd.Series(lastmods, dtype="object"),
                    "priority": pd.Series(prios, dtype="object"),
                }
            )

    return df.mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_type}, kind string, ord int, loc string, "
            "lastmod string, priority double"
        ),
    )


def sitemap_coverage(entries, crawled, loc_col: str = "loc",
                     url_col: str = "url"):
    """Crawl-completeness audit per host: of the urls a host DECLARES
    in its sitemaps (urlset rows), how many has the crawl actually
    fetched? (host, n_declared, n_crawled, coverage) — the dashboard
    that catches a dead frontier shard or a host-level fetch policy
    gone wrong before the corpus ships.

    Scale shape: declared and crawled both reduce to distinct url
    relations; ONE url-keyed left join + ONE host agg. Coverage rounds
    to 4 (float canon)."""
    from pyspark.sql import functions as F

    decl = (
        entries.where(
            (F.col("kind") == "urlset") & F.col(loc_col).isNotNull()
        )
        .select(
            F.regexp_extract(F.col(loc_col), r"^https?://([^/?#]+)", 1)
            .alias("host"),
            F.col(loc_col).alias("_u"),
        )
        .distinct()
    )
    got = crawled.select(F.col(url_col).alias("_u")).distinct().withColumn(
        "_c", F.lit(1)
    )
    j = decl.join(got, "_u", "left")
    return (
        j.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_declared"),
            F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_crawled"),
        )
        .select(
            "host", "n_declared", "n_crawled",
            F.round(
                F.col("n_crawled") / F.col("n_declared").cast("double"), 4
            ).alias("coverage"),
        )
    )
