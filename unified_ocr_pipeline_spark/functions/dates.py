"""Publication-date mining: find and normalize date mentions in text.

Training corpora need a per-document timestamp for freshness mixing,
time-based train/eval splits, and dedup tie-breaking ("keep newest").
Crawl metadata (warc_ts) says when a page was FETCHED, not when its
content was written — the standard trick (CommonCrawl news pipelines,
web-archive temporal analyses) is to pull the first date MENTION from
the body and normalize it.

All JVM: three regexp_extract passes (ISO / US-slash / long-form) and
``try_to_date`` parses (ANSI-safe — malformed candidates become NULL,
never a job abort), coalesced in precedence order. No Python, no
shuffle; the regexes live in the Java∩RE2 dialect so a SQL oracle can
replay the extraction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_DATE_REGEX = r"\b\d{4}-\d{2}-\d{2}\b"
US_DATE_REGEX = r"\b\d{2}/\d{2}/\d{4}\b"
LONG_DATE_REGEX = (
    r"\b(January|February|March|April|May|June|July|August|September|"
    r"October|November|December) \d{1,2}, \d{4}\b"
)


def date_mention_cols(text: Column) -> list[Column]:
    """(mention string, mention_fmt string, date_norm date) for the
    FIRST date mention, trying ISO then US-slash then long-form.
    Documents with no mention yield (NULL, NULL, NULL); a regex hit
    that fails calendar validation (e.g. 2024-13-40) yields the
    mention with a NULL date_norm — kept visible, not silently
    dropped."""
    iso = F.regexp_extract(text, ISO_DATE_REGEX, 0)
    us = F.regexp_extract(text, US_DATE_REGEX, 0)
    lng = F.regexp_extract(text, LONG_DATE_REGEX, 0)
    mention = (
        F.when(iso != "", iso).when(us != "", us).when(lng != "", lng)
    )
    fmt = (
        F.when(iso != "", F.lit("iso"))
        .when(us != "", F.lit("us"))
        .when(lng != "", F.lit("long"))
    )
    norm = (
        F.when(iso != "", F.try_to_date(iso, "yyyy-MM-dd"))
        .when(us != "", F.try_to_date(us, "MM/dd/yyyy"))
        .when(lng != "", F.try_to_date(lng, "MMMM d, yyyy"))
    )
    return [
        mention.alias("mention"),
        fmt.alias("mention_fmt"),
        norm.alias("date_norm"),
    ]
