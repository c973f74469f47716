"""URL canonicalization Column builders for crawl curation.

Common-Crawl-style corpora key everything on url (the pipeline's dedup,
resume manifests, and latest-view all group by it — plans/pipeline.py), so
a deterministic canonical form is the difference between "one page" and
"four near-identical rows that differ only in tracking params". All pure
`pyspark.sql.functions` compositions (regexp + higher-order array lambdas),
whole-stage-codegen friendly, each with an exact DuckDB mirror in
``__spark_entry__.oracle_sql`` (the regex subset used here — no lookaround,
no backrefs — behaves identically under Java regex and RE2).

Canonical form produced by :func:`canonicalize_url`:

- fragment dropped;
- scheme lower-cased;
- host lower-cased, userinfo (``user:pw@``) removed, default port
  (``:80`` for http, ``:443`` for https) removed, leading ``www.``
  stripped; non-default ports are kept;
- path kept byte-for-byte (paths are case-sensitive);
- tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``ref``), remaining params kept in original order, ``?``
  dropped when nothing survives.

``registered_domain`` is the last-two-labels heuristic; a production
deployment would swap in the public-suffix list (multi-label TLDs like
``.co.uk`` collapse to ``co.uk`` under this heuristic) — the function seam
is what matters at 100 TB, not the table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query params that never identify content. Kept as a frozen module constant
# so the DuckDB oracle can embed the identical alternation.
TRACKING_PARAM_REGEX = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)="

_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTHORITY = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"


def strip_fragment(url: Column) -> Column:
    return F.regexp_replace(url, r"#.*", "")


def scheme_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(strip_fragment(url), _SCHEME, 1))


def host_of(url: Column) -> Column:
    """Lower-cased hostname: authority minus userinfo and port."""
    auth = F.lower(F.regexp_extract(strip_fragment(url), _AUTHORITY, 1))
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":\d+$", "")


def port_of(url: Column) -> Column:
    """Explicit port as a string, '' when absent."""
    auth = F.regexp_extract(strip_fragment(url), _AUTHORITY, 1)
    return F.regexp_extract(F.regexp_replace(auth, r"^[^@]*@", ""), r":(\d+)$", 1)


def registered_domain(host: Column) -> Column:
    """Last-two-labels registered domain ('' for bare/empty hosts)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def clean_query_params(url: Column) -> Column:
    """array<string> of surviving query params, original order."""
    q = F.regexp_extract(strip_fragment(url), r"\?(.*)$", 1)
    return F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form per the module docstring. Malformed urls (no
    scheme://host) canonicalize to '' so they can be quarantined upstream."""
    scheme = scheme_of(url)
    host = F.regexp_replace(host_of(url), r"^www\.", "")
    port = port_of(url)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(strip_fragment(url), _PATH, 1)
    params = clean_query_params(url)
    return F.when((scheme == "") | (host == ""), F.lit("")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(
                F.size(params) > 0,
                F.concat(F.lit("?"), F.array_join(params, "&")),
            ).otherwise(F.lit("")),
        )
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the canonical
    index key of web-archive CDX indexes (OpenWayback/pywb): host labels
    reversed and comma-joined, ``)`` separator, then the lower-cased
    path and the sorted surviving query params::

        http://www.Example.com:80/Path?b=2&utm_x=1&a=1
            → com,example)/path?a=1&b=2

    Reversed-host ordering clusters a registered domain's subdomains
    into one contiguous key range, which is exactly what a 100 TB crawl
    index wants: per-domain scans become range scans, and a sort/bucket
    by SURT co-locates each site's pages in the same partitions.

    Rules (the pywb "default" canonicalizer subset): scheme dropped,
    host lower-cased with leading ``www.`` and default ports stripped,
    path lower-cased (SURT trades path case-sensitivity for match
    recall), tracking params removed and the rest SORTED, fragment
    dropped. Malformed urls (no scheme://host) key to ''. Pure JVM
    expressions — regexp + array lambdas, whole-stage codegen.
    """
    scheme = scheme_of(url)
    host = F.regexp_replace(host_of(url), r"^www\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(F.regexp_extract(strip_fragment(url), _PATH, 1))
    # lower BEFORE sorting: SURT lowercases params for match recall, so
    # ?B=2&a=1 and ?b=2&a=1 must emit the same key — sorting the
    # original-case strings would order them differently ('B' < 'a')
    # and split one page's captures across two keys
    params = F.array_sort(F.transform(clean_query_params(url), F.lower))
    return F.when((scheme == "") | (host == ""), F.lit("")).otherwise(
        F.concat(
            rev_host,
            F.lit(")"),
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(
                F.size(params) > 0,
                F.concat(F.lit("?"), F.array_join(params, "&")),
            ).otherwise(F.lit("")),
        )
    )


def path_segments(url: Column) -> Column:
    """array<string> of non-empty path segments of an absolute url."""
    path = F.regexp_extract(strip_fragment(url), _PATH, 1)
    return F.filter(F.split(path, "/"), lambda s: s != "")


def trap_signals(url: Column, max_depth: int = 8, max_params: int = 5,
                 max_dup_segments: int = 2) -> list[Column]:
    """Crawl-trap feature Columns for one url: ``(path_depth int,
    n_params int, dup_segments int, is_trap boolean)``.

    Crawler traps — calendar pages, session-id mazes, faceted-search
    explosions — produce unbounded url spaces under one host.  The three
    classic per-url signals (Heydon & Najork, Mercator 1999): very deep
    paths, repeated path segments (``/a/b/a/b/a`` — a cycle through a
    relative-link maze), and query-parameter explosions.  ``dup_segments``
    counts repeated occurrences (segments minus distinct segments);
    ``is_trap`` fires when any signal crosses its threshold.  Pure array
    expressions, no shuffle; host-level aggregation belongs to the
    caller (see ``operators.robots.crawl_trap_hosts``).
    """
    segs = path_segments(url)
    depth = F.size(segs)
    n_params = F.size(
        F.filter(
            F.split(F.regexp_extract(strip_fragment(url), r"\?(.*)$", 1), "&"),
            lambda p: p != "",
        )
    )
    dup = depth - F.size(F.array_distinct(segs))
    return [
        depth.cast("int").alias("path_depth"),
        n_params.cast("int").alias("n_params"),
        dup.cast("int").alias("dup_segments"),
        (
            (depth > max_depth)
            | (n_params > max_params)
            | (dup >= max_dup_segments)
        ).alias("is_trap"),
    ]


def url_template(url: Column) -> Column:
    """Collapse volatile path/query tokens to placeholders: long
    (>= 8 char) lower-hex runs -> {h} FIRST (an 8+ char pure-digit run
    is hex too and becomes {h} — RE2 has no lookahead to demand a
    letter), then remaining digit runs -> {d} — so /item/8731/page and
    /item/99/page share one template row. The
    classic crawl-trap / site-structure mining normalization (Mercator
    lineage): a host whose url space collapses into few templates is
    navigable; one that stays high-cardinality after collapsing is
    generating urls. Java∩RE2 regex subset, replayable in SQL."""
    t = F.regexp_replace(url, r"[0-9a-f]{8,}", "{h}")
    return F.regexp_replace(t, r"[0-9]+", "{d}")
