"""robots.txt parser + admission tests: group selection, longest-match,
allow-wins-ties, empty-Disallow, RFC 9309 wildcard rules, default
allow.  The end-to-end golden check is the formula oracle in
check_correctness (`robots_admission`)."""

from __future__ import annotations

from unified_ocr_pipeline_spark.operators import robots as ROB
from unified_ocr_pipeline_spark.operators.robots import parse_robots_body

BODY = """
# global policy
User-agent: googlebot
Disallow: /

User-agent: spark-crawler
User-agent: *
Crawl-delay: 5
Disallow: /private/
Allow: /private/public/
Disallow: /tmp
Allow:
Disallow: /wild/*
Disallow: /end$
"""


def test_group_selection_exact_beats_star():
    rules, _ = parse_robots_body(BODY, agent="googlebot")
    assert rules == [("/", False, None)]
    # the shared-agent-run group governs both its named agent and *
    for agent in ("spark-crawler", "*", "SPARK-CRAWLER"):
        rules, n_wild = parse_robots_body(BODY, agent)
        plain = {(p, a) for p, a, rx in rules if rx is None}
        assert ("/private/", False) in plain
        assert ("/private/public/", True) in plain
        assert ("/tmp", False) in plain
        # /wild/* and /end$ are kept as compiled wildcard rules
        wild = {(p, rx) for p, _, rx in rules if rx is not None}
        assert wild == {("/wild/*", "^/wild/.*"), ("/end$", "^/end$")}
        assert n_wild == 2
        # empty Allow dropped entirely
        assert not any(p == "" for p, _, _ in rules)


def test_rule_to_regex():
    from unified_ocr_pipeline_spark.operators.robots import rule_to_regex

    assert rule_to_regex("/plain") is None
    assert rule_to_regex("/a/*/b") == "^/a/.*/b"
    assert rule_to_regex("/fish$") == "^/fish$"
    assert rule_to_regex("/*.php$") == "^/.*\\.php$"
    # $ not at the end is a literal octet, regex-escaped
    assert rule_to_regex("/pa$th*") == "^/pa\\$th.*"


def test_no_matching_group_is_unrestricted():
    rules, _ = parse_robots_body("User-agent: other\nDisallow: /\n", "mybot")
    assert rules == []
    rules, _ = parse_robots_body("", "mybot")
    assert rules == []


def test_rule_line_before_any_group_is_ignored_group_wise():
    # rules with no preceding user-agent form a group with no agents:
    # never selected
    rules, _ = parse_robots_body("Disallow: /x\nUser-agent: *\nAllow: /y\n", "*")
    assert rules == [("/y", True, None)]


def _admit(spark, body: str, urls):
    robots = spark.createDataFrame([("h.com", body)], "host string, body string")
    rules = ROB.robots_rules(robots, "host", "body", agent="*")
    u = spark.createDataFrame(
        [(i, "h.com", f"http://h.com{p}") for i, p in enumerate(urls)],
        "i long, host string, url string",
    )
    out = ROB.robots_admit(u, rules, "url", "host").collect()
    return {r["i"]: (r["admitted"], r["matched_rule"]) for r in out}


def test_admit_longest_match_and_ties(spark):
    body = (
        "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
        "Disallow: /a/b/c/\nAllow: /a/b/c/\n"
    )
    got = _admit(
        spark,
        body,
        ["/a/x", "/a/b/x", "/a/b/c/x", "/elsewhere", "/"],
    )
    assert got[0] == (False, "/a/")
    assert got[1] == (True, "/a/b/")
    # equal-length allow+disallow on /a/b/c/ — allow wins the tie
    assert got[2] == (True, "/a/b/c/")
    assert got[3] == (True, None)  # default allow, no rule matched
    assert got[4] == (True, None)


def test_admit_prefix_semantics_and_rootless_url(spark):
    got = _admit(spark, "User-agent: *\nDisallow: /tmp\n", ["/tmpfile", "/tm"])
    assert got[0] == (False, "/tmp")  # prefix, not path-segment, semantics
    assert got[1] == (True, None)
    # URL with no path component evaluates as "/"
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /\n")], "host string, body string"
    )
    rules = ROB.robots_rules(robots, "host", "body")
    u = spark.createDataFrame(
        [(0, "h.com", "http://h.com")], "i long, host string, url string"
    )
    r = ROB.robots_admit(u, rules, "url", "host").first()
    assert r["admitted"] is False and r["matched_rule"] == "/"


def test_admit_wildcard_rules(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /*.php$\n"
        "Disallow: /cal/*/day\n"
        "Allow: /cal/2024/day\n"
        "Disallow: /exact$\n"
    )
    got = _admit(
        spark,
        body,
        [
            "/index.php",        # wildcard .php$ blocks
            "/index.php?x=1",    # query stripped from path → still .php$
            "/index.phpx",       # $ anchor → not blocked
            "/cal/1999/day",     # wildcard disallow
            "/cal/2024/day",     # longer Allow (13 octets > 10) wins
            "/exact",            # $-anchored exact block
            "/exactly",          # anchor → allowed
        ],
    )
    assert got[0] == (False, "/*.php$")
    assert got[1] == (False, "/*.php$")
    assert got[2][0] is True
    assert got[3] == (False, "/cal/*/day")
    assert got[4] == (True, "/cal/2024/day")
    assert got[5] == (False, "/exact$")
    assert got[6][0] is True


def test_admit_host_without_rules(spark):
    robots = spark.createDataFrame(
        [("other.com", "User-agent: *\nDisallow: /\n")], "host string, body string"
    )
    rules = ROB.robots_rules(robots, "host", "body")
    u = spark.createDataFrame(
        [(0, "h.com", "http://h.com/x")], "i long, host string, url string"
    )
    r = ROB.robots_admit(u, rules, "url", "host").first()
    assert r["admitted"] is True and r["matched_rule"] is None


def test_parse_crawl_delay():
    from unified_ocr_pipeline_spark.operators.robots import parse_crawl_delay

    # exact group beats *; delay lines close agent runs
    assert parse_crawl_delay(BODY, "googlebot") is None
    assert parse_crawl_delay(BODY, "*") == 5.0
    # max over several selected groups (conservative politeness)
    body = "User-agent: *\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 7.5\n"
    assert parse_crawl_delay(body, "*") == 7.5
    # malformed / negative ignored
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: -3\n") is None
    assert parse_crawl_delay("", "*") is None
    # a crawl-delay line closes the agent run: the next User-agent
    # starts a NEW group, so bot2 does not inherit bot1's delay
    body = "User-agent: bot1\nCrawl-delay: 9\nUser-agent: bot2\nDisallow: /x\n"
    assert parse_crawl_delay(body, "bot1") == 9.0
    assert parse_crawl_delay(body, "bot2") is None


def test_crawl_delays_df_and_schedule_delay_col(spark):
    from unified_ocr_pipeline_spark.operators import robots as ROB

    robots = spark.createDataFrame(
        [
            ("slow.com", "User-agent: *\nCrawl-delay: 10\n"),
            ("fast.com", "User-agent: *\nDisallow: /x\n"),  # no delay
        ],
        "host string, body string",
    )
    delays = ROB.crawl_delays(robots, "host", "body")
    got = {r["host"]: r["crawl_delay"] for r in delays.collect()}
    assert got == {"slow.com": 10.0}

    urls = spark.createDataFrame(
        [(i, h, f"http://{h}/{i}") for i in range(2) for h in ("slow.com", "fast.com")],
        "i long, host string, url string",
    )
    sched = ROB.schedule_fetches(
        urls.join(delays, "host", "left"),
        "host", "url", delay_sec=5, epoch=100, delay_col="crawl_delay",
    )
    out = {(r["host"], r["slot"]): r["fetch_at"] for r in sched.collect()}
    assert out[("slow.com", 0)] == 100 and out[("slow.com", 1)] == 110
    # NULL delay falls back to delay_sec
    assert out[("fast.com", 0)] == 100 and out[("fast.com", 1)] == 105


def test_schedule_fetches_per_host_queue(spark):
    rows = [
        (0, "a.com", "http://a.com/1", 10),
        (1, "a.com", "http://a.com/2", 30),
        (2, "a.com", "http://a.com/0", 30),
        (3, "b.com", "http://b.com/x", 1),
    ]
    from unified_ocr_pipeline_spark.operators import robots as ROB

    df = spark.createDataFrame(rows, "i long, host string, url string, pri long")
    out = {
        r["i"]: (r["slot"], r["fetch_at"])
        for r in ROB.schedule_fetches(
            df, "host", "url", delay_sec=7, epoch=100, priority_col="pri"
        ).collect()
    }
    # pri desc, url asc ties: /0 before /2 (both pri=30), then /1
    assert out[2] == (0, 100)
    assert out[1] == (1, 107)
    assert out[0] == (2, 114)
    # other host starts its own queue at the epoch
    assert out[3] == (0, 100)


def test_schedule_fetches_default_order_is_url(spark):
    from unified_ocr_pipeline_spark.operators import robots as ROB

    df = spark.createDataFrame(
        [(0, "a.com", "http://a.com/b"), (1, "a.com", "http://a.com/a")],
        "i long, host string, url string",
    )
    out = {
        r["i"]: r["slot"]
        for r in ROB.schedule_fetches(df, "host", "url", delay_sec=1).collect()
    }
    assert out[1] == 0 and out[0] == 1


def test_parse_sitemap_directives_edge_cases():
    from unified_ocr_pipeline_spark.operators.robots import parse_sitemap_directives

    body = (
        "User-agent: *\n"
        "Disallow: /x\n"
        "Sitemap: http://a.com/s1.xml   # trailing comment\n"
        "SITEMAP:https://a.com/s2.xml\n"     # mixed case, no space
        "sitemap: /relative.xml\n"           # relative: skipped
        "Sitemap: ftp://a.com/s.xml\n"       # non-http scheme: skipped
        "Sitemap: http://a.com/s1.xml\n"     # duplicate: kept, in order
        "Sitemap:\n"                         # empty value: skipped
        "NotSitemap: http://a.com/no.xml\n"
    )
    assert parse_sitemap_directives(body) == [
        "http://a.com/s1.xml",
        "https://a.com/s2.xml",
        "http://a.com/s1.xml",
    ]
    assert parse_sitemap_directives("") == []
    assert parse_sitemap_directives(None) == []


def test_rule_to_regex_differential_hypothesis():
    """Differential: matching a wildcard rule via the compiled regex
    (Python re — same semantics as Java/RE2 for this .*-and-anchor
    subset) must agree with a straightforward interpreter of RFC 9309
    §2.2.3 wildcard semantics on random rule/path pairs."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from unified_ocr_pipeline_spark.operators.robots import rule_to_regex

    def interp_match(rule: str, path: str) -> bool:
        anchored = rule.endswith("$")
        body = rule[:-1] if anchored else rule
        parts = body.split("*")
        pos = 0
        # first part must match at the start
        if not path.startswith(parts[0]):
            return False
        pos = len(parts[0])
        for part in parts[1:-1] if len(parts) > 1 else []:
            i = path.find(part, pos)
            if i < 0:
                return False
            pos = i + len(part)
        if len(parts) > 1:
            last = parts[-1]
            if anchored:
                return path.endswith(last) and (
                    len(path) - len(last) >= pos
                )
            i = path.find(last, pos)
            return i >= 0
        return path == body if anchored else True

    alphabet = "ab/*.$%"
    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet=alphabet, min_size=1, max_size=12),
        st.text(alphabet="ab/.$%", min_size=0, max_size=16),
    )
    def check(rule, path):
        rx = rule_to_regex(rule)
        if rx is None:
            # plain prefix rule: engine matches via startswith
            assert "*" not in rule and not rule.endswith("$")
            return
        got = re.search(rx, path) is not None
        want = interp_match(rule, path)
        assert got == want, (rule, path, rx)

    check()


def test_refresh_schedule_degenerate_histories(spark):
    """Guards: never-changed url -> lambda 0 / refresh max_days; zero-span
    changed url -> lambda NULL / refresh min_days; no ANSI DIVIDE_BY_ZERO
    on either (Spark 4 runs ANSI mode by default)."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = [
        # u_never: 3 fetches over 2 days, no change observed
        ("u_never", t, False),
        ("u_never", t + dt.timedelta(days=1), False),
        ("u_never", t + dt.timedelta(days=2), False),
        # u_same_ts: 2 fetches at one instant, changed
        ("u_same_ts", t, True),
        ("u_same_ts", t, True),
        # u_normal: changes once over 2 days
        ("u_normal", t, False),
        ("u_normal", t + dt.timedelta(days=1), True),
        ("u_normal", t + dt.timedelta(days=2), False),
        # u_single: one fetch only -> dropped
        ("u_single", t, True),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts timestamp, changed boolean"
    )
    out = {r["url"]: r for r in ROB.refresh_schedule(df).collect()}
    assert set(out) == {"u_never", "u_same_ts", "u_normal"}
    assert out["u_never"]["lambda_per_day"] == 0.0
    assert out["u_never"]["refresh_days"] == 30.0
    assert out["u_same_ts"]["lambda_per_day"] is None
    assert out["u_same_ts"]["refresh_days"] == 0.25
    lam = out["u_normal"]["lambda_per_day"]
    import math

    assert lam is not None and abs(lam - (-math.log(2.5 / 3.5))) < 1e-9
    assert abs(out["u_normal"]["refresh_days"] - 1.0 / lam) < 1e-9


def test_admit_preserves_duplicate_rows(spark):
    """Two identical discovered urls must yield two admitted rows — the
    window key is a per-row id, not the full column set."""
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, body string",
    )
    rules = ROB.robots_rules(robots, "host", "body")
    u = spark.createDataFrame(
        [("h.com", "http://h.com/x")] * 2 + [("h.com", "http://h.com/private/x")],
        "host string, url string",
    )
    out = ROB.robots_admit(u, rules, "url", "host")
    assert out.count() == 3
    assert out.where("admitted").count() == 2
