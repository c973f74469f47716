"""robots.txt parsing and URL admission — the crawl-politeness gate.

The reference ingests whatever lands in its watch directory
(``scripts/unified_ocr_pipeline.py:250-320``); a web crawler must first
decide *which URLs it may fetch at all*.  This module implements the
RFC 9309 / Googlebot subset that covers the overwhelming majority of
real robots files:

- groups of ``User-agent:`` lines followed by ``Allow:`` / ``Disallow:``
  rules; comments (``#``) and blank lines ignored; keys case-insensitive;
- group selection: the group whose user-agent token exactly matches the
  crawler (case-insensitive) wins over the ``*`` group; if neither
  exists the host is unrestricted;
- rule matching: path rules with LONGEST-MATCH precedence (most octets
  in the rule, per RFC 9309 §2.2.2), ``Allow`` winning length ties
  (Google's documented tie-break); an empty ``Disallow:`` means "allow
  everything" (per the RFC) and is dropped at parse time;
- full ``*`` / end-anchor ``$`` wildcard support (RFC 9309 §2.2.3):
  ``*`` matches any run of characters, a trailing ``$`` anchors the rule
  to the path end, a ``$`` anywhere else is literal.  Wildcard rules are
  compiled to anchored Java regexes at parse time; plain prefix rules
  keep the cheap ``startswith`` fast path.

Spark shape: parsing is one narrow mapInPandas pass over the (tiny)
robots bodies → a ``(host, rule_path, allow)`` relation; admission is a
host-keyed left join of the URL table against that relation plus ONE
window for the longest-match pick.  Rules-per-host is bounded (~dozens),
so the join carries no skew risk; the URL side never moves twice.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rule_to_regex(path: str) -> str | None:
    """Anchored Java-regex for a wildcard rule, None for a plain prefix
    rule (which matching keeps on the ``startswith`` fast path).

    RFC 9309 §2.2.3: ``*`` matches any character run, ``$`` at the END
    of the rule anchors it to the path end; a ``$`` anywhere else is a
    literal octet.  Everything else is regex-escaped, so the emitted
    pattern stays inside the Java∩RE2 dialect the rest of the repo uses.
    """
    import re as _re

    if "*" not in path and not path.endswith("$"):
        return None
    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    pattern = ".*".join(_re.escape(part) for part in body.split("*"))
    return "^" + pattern + ("$" if anchored else "")


def _parse_groups(body: str) -> list[tuple[list[str], list[tuple], float | None]]:
    """Group-structured parse of a robots body: ``[(agents, [(path,
    allow_bool)], crawl_delay_or_None)]`` per RFC 9309 grouping — later
    ``User-agent`` lines extend the same group until the first rule line
    (Allow/Disallow/Crawl-delay) closes the agent run."""
    groups: list[tuple[list[str], list[tuple], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple] = []
    cur_delay: float | None = None
    in_agent_run = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run and (cur_agents or cur_rules or cur_delay is not None):
                groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], [], None
            cur_agents.append(val.lower())
            in_agent_run = True
        elif key in ("allow", "disallow"):
            in_agent_run = False
            cur_rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            in_agent_run = False
            try:
                cur_delay = float(val)
            except ValueError:
                pass  # malformed delay: ignored, line still closes the run
    if cur_agents or cur_rules or cur_delay is not None:
        groups.append((cur_agents, cur_rules, cur_delay))
    return groups


def _select_pool(groups, agent: str):
    """RFC group selection: every group naming ``agent`` exactly, else
    every ``*`` group."""
    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    return exact if exact else [g for g in groups if "*" in g[0]]


def parse_robots_body(body: str, agent: str = "*") -> tuple[list[tuple], int]:
    """Pure-Python parse → ([(path, allow_bool, regex_or_None)],
    n_wildcard) where ``regex`` is the compiled-at-parse-time anchored
    pattern for wildcard rules (None → plain prefix rule) and
    ``n_wildcard`` counts the wildcard rules in the returned group.

    Returns the rules of the best-matching group: exact ``agent`` match
    beats ``*``; within a group, later ``User-agent`` lines extend the
    same group until the first rule line closes it (RFC 9309 grouping).
    """
    chosen: list[tuple] = []
    for _, rules, _ in _select_pool(_parse_groups(body), agent):
        chosen.extend(rules)

    out: list[tuple] = []
    n_wildcard = 0
    for path, allow in chosen:
        if not path:
            continue  # empty Disallow == allow-all (and empty Allow is a no-op)
        rx = rule_to_regex(path)
        if rx is not None:
            n_wildcard += 1
        out.append((path, allow, rx))
    return out, n_wildcard


def parse_crawl_delay(body: str, agent: str = "*") -> float | None:
    """Crawl-delay (seconds) of the group governing ``agent``, or None.

    Crawl-delay is non-standard but honored by Bing/Yandex and present
    in a large share of real robots files.  When several selected
    groups declare one, the MAXIMUM wins — the most conservative
    politeness reading.  Negative values are ignored as malformed.
    """
    delays = [
        d for _, _, d in _select_pool(_parse_groups(body), agent)
        if d is not None and d >= 0
    ]
    return max(delays) if delays else None


def crawl_delays(
    df: DataFrame,
    host_col: str,
    body_col: str,
    agent: str = "*",
) -> DataFrame:
    """(host, crawl_delay double) — one row per host whose robots.txt
    declares a Crawl-delay for the group governing ``agent``.  Same
    Arrow-batch scan shape as :func:`robots_rules`; join the result to a
    frontier and pass it to :func:`schedule_fetches` via ``delay_col``.
    """
    host_type = df.schema[host_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, delays = [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                d = parse_crawl_delay(body if body is not None else "", agent)
                if d is not None:
                    hosts.append(host)
                    delays.append(d)
            yield pd.DataFrame(
                {
                    host_col: pd.Series(hosts, dtype="object"),
                    "crawl_delay": pd.Series(delays, dtype="float64"),
                }
            )

    return df.mapInPandas(
        gen, schema=f"{host_col} {host_type}, crawl_delay double"
    )


def robots_rules(
    df: DataFrame,
    host_col: str,
    body_col: str,
    agent: str = "*",
) -> DataFrame:
    """(host, rule_path string, allow boolean, rule_regex string) — one
    row per rule of the group governing ``agent``; ``rule_regex`` is
    NULL for plain prefix rules and the anchored pattern for wildcard
    rules (see :func:`rule_to_regex`)."""
    host_type = df.schema[host_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, paths, allows, regexes = [], [], [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                rules, _ = parse_robots_body(
                    body if body is not None else "", agent
                )
                for path, allow, rx in rules:
                    hosts.append(host)
                    paths.append(path)
                    allows.append(allow)
                    regexes.append(rx)
            yield pd.DataFrame(
                {
                    host_col: pd.Series(hosts, dtype="object"),
                    "rule_path": pd.Series(paths, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "rule_regex": pd.Series(regexes, dtype="object"),
                }
            )

    return df.mapInPandas(
        gen,
        schema=(
            f"{host_col} {host_type}, rule_path string, allow boolean, "
            "rule_regex string"
        ),
    )


def robots_admit(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str,
    host_col: str,
) -> DataFrame:
    """Admission decision per URL row: all of ``urls``'s columns plus
    ``admitted boolean`` and the winning ``matched_rule`` (NULL when no
    rule matched — default-allow).

    Longest-match precedence (most octets in the RULE, RFC 9309
    §2.2.2 — the FULL pattern length including ``*`` and ``$``, the
    same specificity measure as Google's reference robots.txt parser;
    the RFC itself does not say whether metacharacters count), Allow
    wins ties: ONE window ordered by (rule length desc, allow desc,
    rule text asc for determinism) after
    the host join + match filter.  Plain prefix rules match with
    ``startswith`` (codegen fast path); wildcard rules match their
    parse-time-compiled anchored regex via ``rlike``.  URLs whose host
    has no rules survive via the left join.
    """
    path = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]+(/[^#?]*)", 1), F.lit("")),
        F.lit("/"),
    )
    # per-row window key: partitioning by *urls.columns would (a) collapse
    # duplicate input rows to one output row and (b) hash/sort every
    # payload column (document bodies riding through the admission gate)
    # as exchange keys
    u = urls.withColumn("_path", path).withColumn(
        "_row", F.monotonically_increasing_id()
    )
    r = rules.select(
        F.col(host_col).alias("_rhost"),
        "rule_path",
        F.col("allow").alias("_allow"),
        (F.col("rule_regex") if "rule_regex" in rules.columns else F.lit(None).cast("string")).alias("_rx"),
    )
    joined = u.join(r, u[host_col] == r["_rhost"], "left").withColumn(
        "_hit",
        F.col("rule_path").isNotNull()
        & F.when(
            F.col("_rx").isNull(), F.col("_path").startswith(F.col("rule_path"))
        ).otherwise(F.expr("_path rlike _rx")),
    )
    w = Window.partitionBy("_row").orderBy(
        F.col("_hit").desc(),
        F.length("rule_path").desc(),
        F.col("_allow").desc(),
        F.col("rule_path").asc(),
    )
    ranked = joined.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") == 1)
    return ranked.select(
        *urls.columns,
        F.when(F.col("_hit"), F.col("_allow")).otherwise(F.lit(True)).alias("admitted"),
        F.when(F.col("_hit"), F.col("rule_path")).alias("matched_rule"),
    )


def schedule_fetches(
    urls: DataFrame,
    host_col: str,
    url_col: str,
    delay_sec: int = 5,
    epoch: int = 0,
    priority_col: str | None = None,
    delay_col: str | None = None,
) -> DataFrame:
    """Per-host politeness schedule: all of ``urls``'s columns plus
    ``slot int`` (0-based position in the host's fetch queue) and
    ``fetch_at bigint`` (``epoch + slot * delay`` seconds, floored).

    One fetch per host per delay is the standard courtesy rule (and
    what Crawl-delay asks for); the schedule is ONE window partitioned
    by host — exactly the parallelism a fetch fleet has, since requests
    to different hosts never contend.  The per-fetch delay is
    ``delay_col`` when given (e.g. the host's declared Crawl-delay from
    :func:`crawl_delays`, joined upstream; NULLs fall back to
    ``delay_sec``), else the constant ``delay_sec``.  Queue order is
    ``priority_col`` descending when given (e.g. a pagerank prior),
    ties and the default both by ``url_col`` for determinism.
    """
    order = (
        [F.col(priority_col).desc(), F.col(url_col).asc()]
        if priority_col
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy(host_col).orderBy(*order)
    slot = F.row_number().over(w) - F.lit(1)
    delay = (
        F.coalesce(F.col(delay_col).cast("double"), F.lit(float(delay_sec)))
        if delay_col
        else F.lit(float(delay_sec))
    )
    return urls.select(
        *urls.columns,
        slot.cast("int").alias("slot"),
        F.floor(F.lit(epoch) + slot.cast("double") * delay)
        .cast("bigint")
        .alias("fetch_at"),
    )


def crawl_trap_hosts(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    min_urls: int = 100,
    trap_share: float = 0.5,
) -> DataFrame:
    """Host-level crawl-trap detection over per-url trap signals
    (:func:`~unified_ocr_pipeline_spark.functions.url.trap_signals`):
    ``(host, n_urls, n_trap_urls, trap_url_share double, avg_depth
    double, avg_params double, is_trap_host boolean)``.

    A trap host (calendar maze, session-id explosion) reveals itself in
    aggregate: a large and growing url count where most urls carry trap
    signals.  ``is_trap_host`` fires when the host has ≥ ``min_urls``
    discovered urls AND the share of trap-flagged urls ≥ ``trap_share``.
    Scale shape: the per-url signals are pure array expressions computed
    map-side, then ONE hash-agg keyed by host (partial agg) — the url
    table moves through exactly one exchange and frontier filtering
    becomes a broadcast-anti of this (tiny) host list.
    """
    from ..functions.url import trap_signals

    sig = urls.select(
        F.col(host_col).alias("host"), *trap_signals(F.col(url_col))
    )
    agg = sig.groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.col("is_trap").cast("long")).alias("n_trap_urls"),
        F.avg("path_depth").alias("avg_depth"),
        F.avg("n_params").alias("avg_params"),
    )
    share = F.col("n_trap_urls") / F.col("n_urls")
    return agg.select(
        "host",
        "n_urls",
        "n_trap_urls",
        share.alias("trap_url_share"),
        "avg_depth",
        "avg_params",
        (
            (F.col("n_urls") >= F.lit(int(min_urls)))
            & (share >= F.lit(float(trap_share)))
        ).alias("is_trap_host"),
    )


def parse_sitemap_directives(body: str) -> list[str]:
    """``Sitemap:`` lines of a robots.txt, in file order.

    Per RFC 9309 §2.3 / sitemaps.org these are GROUP-INDEPENDENT — they
    apply regardless of any User-agent group they appear inside — so the
    scan is a flat line pass: case-insensitive key, comments stripped,
    values that aren't absolute http(s) urls skipped (relative sitemap
    refs are invalid per the protocol), duplicates kept (order is
    discovery signal)."""
    out: list[str] = []
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if val.startswith(("http://", "https://")):
            out.append(val)
    return out


def sitemap_directives(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url, pos int) — one row per Sitemap: directive per
    robots.txt, in file order. Same Arrow-batch scan shape as
    robots_rules: the parse runs on scan partitions, raw robots bodies
    never shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, urls, poss = [], [], []
            for host, body in zip(pdf["_host"], pdf["_body"]):
                for i, u in enumerate(parse_sitemap_directives(body)):
                    hosts.append(host)
                    urls.append(u)
                    poss.append(i)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls, "pos": poss})

    narrow = df.select(
        F.col(host_col).alias("_host"), F.col(body_col).alias("_body")
    )
    return narrow.mapInPandas(gen, schema="host string, sitemap_url string, pos int")


def refresh_schedule(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    changed_col: str = "changed",
    min_days: float = 0.25,
    max_days: float = 30.0,
) -> DataFrame:
    """Adaptive re-crawl scheduling from fetch history (Cho &
    Garcia-Molina 2003): per url, estimate the Poisson page-change rate
    and derive the refresh interval a freshness-maximizing crawler
    should use.

    Input: one row per past fetch ``(url, fetch_ts, changed)`` where
    ``changed`` says the fetch observed a different page than the
    previous one. Output per url: ``(url, n_fetches, n_changed,
    span_days double, lambda_per_day double, refresh_days double)``
    using the bias-corrected estimator
    ``λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / mean_gap`` — finite even when
    every fetch changed — and ``refresh = clamp(1/λ̂, min, max)``.

    Degenerate histories are defined, not ANSI-crash (Spark 4 runs ANSI
    mode, so an unguarded 1/λ̂ throws DIVIDE_BY_ZERO): a url whose
    fetches never observed a change has λ̂ = 0 and refreshes at
    ``max_days`` (the slowest cadence); a url whose fetches all share
    one timestamp but DID change has no observable rate — λ̂ is NULL and
    it refreshes at ``min_days`` (changes faster than we can see).

    Scale shape: ONE hash-agg keyed by url (count/sum/min/max all share
    it, partial agg map-side); the estimator math is pure JVM column
    arithmetic on the aggregated row. Urls with a single fetch are
    dropped (no interval to estimate).
    """
    agg = history.groupBy(F.col(url_col).alias("url")).agg(
        F.count("*").alias("n_fetches"),
        F.sum(F.col(changed_col).cast("int")).alias("n_changed"),
        F.unix_micros(F.min(ts_col).cast("timestamp")).alias("_t0"),
        F.unix_micros(F.max(ts_col).cast("timestamp")).alias("_t1"),
    ).where(F.col("n_fetches") >= 2)
    day_us = 86400.0 * 1e6
    span_days = (F.col("_t1") - F.col("_t0")) / F.lit(day_us)
    mean_gap = span_days / (F.col("n_fetches") - 1)
    # Branch order matters: the division only runs where its guard holds
    # (If evaluates one branch per row, so ANSI mode never sees a 0
    # divisor). n_changed = 0 → λ = 0; zero span with changes → NULL.
    lam = (
        F.when(
            (mean_gap > 0) & (F.col("n_changed") > 0),
            -F.log(
                (F.col("n_fetches") - F.col("n_changed") + 0.5)
                / (F.col("n_fetches") + 0.5)
            ) / mean_gap,
        )
        .when(F.col("n_changed") == 0, F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
    )
    refresh = (
        F.when(
            lam > 0,
            F.least(
                F.greatest(F.lit(1.0) / lam, F.lit(float(min_days))),
                F.lit(float(max_days)),
            ),
        )
        .when(lam.isNull(), F.lit(float(min_days)))
        .otherwise(F.lit(float(max_days)))
    )
    return agg.select(
        "url", "n_fetches", "n_changed",
        span_days.alias("span_days"),
        lam.alias("lambda_per_day"),
        refresh.alias("refresh_days"),
    )
