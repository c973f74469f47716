"""Unit tests for the crawl-curation kernels added in round 2: URL
canonicalization, PII redaction, repetition collapse, and the CDC-style
snapshot diff. Each also has a driver-facing query + DuckDB oracle in
``__spark_entry__`` — these tests pin the kernel semantics on hand-written
edge cases the synthetic tables don't cover."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.functions import pii as PII
from unified_ocr_pipeline_spark.functions import text as TX
from unified_ocr_pipeline_spark.functions import url as URL
from unified_ocr_pipeline_spark.operators.diff import snapshot_diff


def _one_col(spark, values, name="v"):
    return spark.createDataFrame([(v,) for v in values], [name])


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

URL_CASES = [
    # (raw, canon, host, domain)
    (
        "HTTP://WWW.Example.COM:80/Docs/A?utm_source=x&id=7&utm_campaign=y#frag",
        "http://example.com/Docs/A?id=7",
        "www.example.com",
        "example.com",
    ),
    (
        "https://User:Pw@Sub.Example.org:8443/p?gclid=1&q=spark",
        "https://sub.example.org:8443/p?q=spark",
        "sub.example.org",
        "example.org",
    ),
    # https default port dropped; tracking-only query drops the '?'
    ("https://A.B.net:443/x?ref=rss", "https://a.b.net/x", "a.b.net", "b.net"),
    # no path, no query, fragment only
    ("http://example.com#top", "http://example.com", "example.com", "example.com"),
    # param order preserved; unknown params kept verbatim (incl. case)
    (
        "http://h.io/p?b=2&utm_x=1&A=1",
        "http://h.io/p?b=2&A=1",
        "h.io",
        "h.io",
    ),
    # malformed → '' canon, '' host
    ("not a url at all", "", "", ""),
    ("/relative/path?id=1", "", "", ""),
]


def test_canonicalize_url_golden(spark):
    df = _one_col(spark, [c[0] for c in URL_CASES], "u")
    host = URL.host_of(F.col("u"))
    got = df.select(
        URL.canonicalize_url(F.col("u")).alias("c"),
        host.alias("h"),
        URL.registered_domain(host).alias("d"),
    ).collect()
    for (raw, canon, h, d), row in zip(URL_CASES, got):
        assert row["c"] == canon, raw
        assert row["h"] == h, raw
        assert row["d"] == d, raw


def test_canonicalize_is_idempotent(spark):
    df = _one_col(spark, [c[0] for c in URL_CASES if c[1]], "u")
    once = df.select(URL.canonicalize_url(F.col("u")).alias("u"))
    twice = once.select(URL.canonicalize_url(F.col("u")).alias("u"))
    assert [r["u"] for r in once.collect()] == [r["u"] for r in twice.collect()]


SURT_CASES = [
    # www + default port stripped, path lowered, params sorted, tracking out
    ("http://www.Example.com:80/Path?b=2&utm_x=1&a=1", "com,example)/path?a=1&b=2"),
    # subdomains cluster under the reversed registered domain
    ("https://news.Sub.Example.org/A/B#frag", "org,example,sub,news)/a/b"),
    # no path → '/'
    ("http://h.io", "io,h)/"),
    # param VALUES lower-cased too (SURT match-recall tradeoff)
    ("http://h.io/?Q=Xyz", "io,h)/?q=xyz"),
    # lower-cased BEFORE sorting: case variants share one key, and the
    # emitted params really are in sorted order ('B' < 'a' in bytes)
    ("http://h.io/?B=2&a=1", "io,h)/?a=1&b=2"),
    ("http://h.io/?b=2&a=1", "io,h)/?a=1&b=2"),
    ("not a url", ""),
]


def test_surt_key_golden(spark):
    df = _one_col(spark, [c[0] for c in SURT_CASES], "u")
    got = [r["s"] for r in df.select(URL.surt_key(F.col("u")).alias("s")).collect()]
    for (raw, want), s in zip(SURT_CASES, got):
        assert s == want, raw


def test_surt_key_clusters_subdomains(spark):
    # sort by surt ⇒ one host's subdomains form a contiguous range
    urls = [
        "http://a.example.com/1",
        "http://zz.other.net/x",
        "http://b.example.com/2",
        "http://www.example.com/3",
    ]
    df = _one_col(spark, urls, "u")
    ordered = [
        r["u"]
        for r in df.orderBy(URL.surt_key(F.col("u"))).collect()
    ]
    ex = [u for u in ordered if "example.com" in u]
    assert ordered.index(ex[-1]) - ordered.index(ex[0]) == len(ex) - 1


def test_trap_signals_golden(spark):
    cases = [
        ("http://h.io/a/b/c", (3, 0, 0, False)),
        # repeated segments: /a/b/a/b/a → 5 segs, 2 distinct → dup 3
        ("http://h.io/a/b/a/b/a", (5, 0, 3, True)),
        # param explosion
        ("http://h.io/p?a=1&b=2&c=3&d=4&e=5&f=6", (1, 6, 0, True)),
        # deep path
        ("http://h.io/1/2/3/4/5/6/7/8/9", (9, 0, 0, True)),
        ("no url", (0, 0, 0, False)),
    ]
    df = _one_col(spark, [c[0] for c in cases], "u")
    got = df.select(*URL.trap_signals(F.col("u"))).collect()
    for (raw, want), row in zip(cases, got):
        assert (
            row["path_depth"], row["n_params"], row["dup_segments"], row["is_trap"]
        ) == want, raw


def test_crawl_trap_hosts(spark):
    from unified_ocr_pipeline_spark.operators.robots import crawl_trap_hosts

    rows = [("maze.com", f"http://maze.com/a/b/a/b/a/{i}") for i in range(6)]
    rows += [("ok.com", f"http://ok.com/page/{i}") for i in range(6)]
    rows += [("small.com", "http://small.com/a/b/a/b/a")]  # trappy but tiny
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r["host"]: r for r in crawl_trap_hosts(df, min_urls=5).collect()}
    assert got["maze.com"]["is_trap_host"] is True
    assert got["maze.com"]["n_trap_urls"] == 6
    assert got["ok.com"]["is_trap_host"] is False
    # below min_urls never flags, whatever the share
    assert got["small.com"]["is_trap_host"] is False
    assert got["small.com"]["trap_url_share"] == 1.0


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_all_kinds(spark):
    text = (
        "mail a.b+c@ex-1.co.uk or x@y.io, call 25-989-741-2988, "
        "host 192.168.0.1 ok; version 1.2 and 1.2.3 stay"
    )
    df = _one_col(spark, [text], "t")
    n_e, n_p, n_i = PII.pii_counts(F.col("t"))
    row = df.select(
        PII.redact_pii(F.col("t")).alias("r"), n_e.alias("e"),
        n_p.alias("p"), n_i.alias("i"),
    ).collect()[0]
    assert row["e"] == 2 and row["p"] == 1 and row["i"] == 1
    assert row["r"] == (
        "mail [EMAIL] or [EMAIL], call [PHONE], "
        "host [IP] ok; version 1.2 and 1.2.3 stay"
    )


def test_redact_pii_no_false_positives(spark):
    clean = (
        "totals 10-20 and 1.5% at row 3.4.5 weight 12-345-678, "
        "ISO date 2024-05-12, order #123456789012, pages 100-200"
    )
    row = _one_col(spark, [clean], "t").select(
        PII.redact_pii(F.col("t")).alias("r")
    ).collect()[0]
    assert row["r"] == clean


def test_redact_pii_phone_format_family(spark):
    # the NANP/international family from the ADVICE finding — every common
    # real-world shape redacts, and Spark agrees with DuckDB on the extents
    import duckdb

    cases = [
        ("call +1 (555) 123-4567 now", "call [PHONE] now"),
        ("call (555) 123-4567 now", "call [PHONE] now"),
        ("call 555.123.4567 now", "call [PHONE] now"),
        ("call 555-123-4567 now", "call [PHONE] now"),
        ("call 555 123 4567 now", "call [PHONE] now"),
        ("call 1-555-123-4567 now", "call [PHONE] now"),
        ("call +44 20 7946 0958 now", "call [PHONE] now"),
        ("call 25-989-741-2988 now", "call [PHONE] now"),
    ]
    rows = _one_col(spark, [c for c, _ in cases], "t").select(
        "t", PII.redact_pii(F.col("t")).alias("r")
    ).collect()
    got = {r["t"]: r["r"] for r in rows}
    for raw, want in cases:
        assert got[raw] == want, raw
        (ducked,) = duckdb.sql(
            "SELECT regexp_replace(?, ?, '[PHONE]', 'g')",
            params=[raw, PII.PHONE_REGEX],
        ).fetchone()
        assert ducked == want, f"duckdb disagrees on {raw!r}: {ducked!r}"


# ---------------------------------------------------------------------------
# repetition collapse
# ---------------------------------------------------------------------------


def _py_collapse_runs(s: str) -> str:
    out = []
    for w in s.split():
        if not out or out[-1] != w:
            out.append(w)
    return " ".join(out)


def _py_distinct(s: str) -> str:
    seen, out = set(), []
    for w in s.split():
        if w not in seen:
            seen.add(w)
            out.append(w)
    return " ".join(out)


def test_collapse_matches_python_reference(spark):
    cases = [
        "batch batch batch stream spark spark window",
        "a b a b a b",
        "x",
        "",
        "  padded   run run  ",
        "one two two two one",
    ]
    df = _one_col(spark, cases, "t")
    got = df.select(
        TX.collapse_token_runs(F.col("t")).alias("runs"),
        TX.distinct_token_text(F.col("t")).alias("dist"),
    ).collect()
    for s, row in zip(cases, got):
        assert row["runs"] == _py_collapse_runs(s), repr(s)
        assert row["dist"] == _py_distinct(s), repr(s)


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")], ["url", "fingerprint"]
    )
    new = spark.createDataFrame(
        [("u2", "h2"), ("u3", "hX"), ("u4", "h4")], ["url", "fingerprint"]
    )
    got = {
        r["url"]: r["change"]
        for r in snapshot_diff(old, new, ["url"]).collect()
    }
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }


def test_snapshot_diff_null_fingerprints(spark):
    # presence, not fingerprint nullness, decides added/removed: a key in
    # BOTH snapshots with one null fp is changed (null-safe compare), a key
    # with null fps on both sides is unchanged
    schema = "url string, fingerprint string"
    old = spark.createDataFrame(
        [("u1", None), ("u2", None), ("u3", "h3"), ("u5", None)], schema
    )
    new = spark.createDataFrame(
        [("u1", "h1"), ("u2", None), ("u3", None), ("u4", None)], schema
    )
    got = {
        r["url"]: r["change"]
        for r in snapshot_diff(old, new, ["url"]).collect()
    }
    assert got == {
        "u1": "changed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
        "u5": "removed",
    }


def test_snapshot_diff_is_jvm_only(spark):
    old = spark.range(10).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("fp")
    )
    new = spark.range(5, 15).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("fp")
    )
    plan = snapshot_diff(old, new, ["k"], "fp")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup (C4/CCNet-style)
# ---------------------------------------------------------------------------

def test_line_dedup_drops_boilerplate_keeps_body(spark):
    from unified_ocr_pipeline_spark.operators.curation import line_dedup

    rows = [(i, f"NAV\nbody {i}\n\nFOOTER") for i in range(6)]
    rows.append((9, "NAV\nFOOTER"))  # all-boilerplate page
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in line_dedup(df, "doc_id", "text", max_df=3).collect()}
    assert len(got) == 7  # every input doc present
    for i in range(6):
        r = got[i]
        assert r["clean_text"] == f"body {i}"
        assert r["n_lines_in"] == 3  # blank line not counted
        assert r["n_lines_kept"] == 1
    assert got[9]["clean_text"] == "" and got[9]["n_lines_kept"] == 0


def test_line_dedup_threshold_boundary_and_order(spark):
    from unified_ocr_pipeline_spark.operators.curation import line_dedup

    # "shared" appears in exactly max_df docs -> kept (strict > threshold)
    rows = [
        (0, "alpha\nshared\nomega"),
        (1, "beta\nshared\ngamma"),
        (2, "solo only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["clean_text"]
           for r in line_dedup(df, "doc_id", "text", max_df=2).collect()}
    assert got[0] == "alpha\nshared\nomega"  # original order preserved
    assert got[1] == "beta\nshared\ngamma"
    assert got[2] == "solo only"


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_flags_overlap_once(spark):
    from unified_ocr_pipeline_spark.operators.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (0, "a quick brown fox here"),       # 1 overlapping 3-gram
            (1, "completely different words"),   # 0
            (2, "quick brown fox " * 5),         # repeated gram counts ONCE
            (3, "too short"),                    # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: (r["overlap_ngrams"], r["contaminated"])
           for r in decontaminate(corpus, bench, "doc_id", "text",
                                  n=3, min_overlap=1).collect()}
    assert got[0] == (1, True)
    assert got[1] == (0, False)
    assert got[2] == (1, True)
    assert got[3] == (0, False)


# --- soft-404 + sentence stats --------------------------------------------


def test_soft404_rules(spark):
    from unified_ocr_pipeline_spark.functions import text as TX
    from pyspark.sql import functions as F

    rows = [
        (0, "sorry, this Page Not Found here"),                 # 1 hit, short
        (1, "x " * 300 + "page not found"),                     # 1 hit, long
        (2, "x " * 300 + "error 404 ... does not exist"),       # 2 hits, long
        (3, "perfectly fine content about cats"),               # clean
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: (r["h"], r["s"])
        for r in df.select(
            "id",
            TX.soft404_hits(F.col("t")).alias("h"),
            TX.is_soft404(F.col("t")).alias("s"),
        ).collect()
    }
    assert got[0] == (1, True)     # case-insensitive, short page
    assert got[1] == (1, False)    # one phrase but long page
    assert got[2] == (2, True)     # two phrases override length
    assert got[3] == (0, False)


def test_sentence_stats_edges(spark):
    from unified_ocr_pipeline_spark.functions import text as TX
    from pyspark.sql import functions as F

    rows = [
        (0, "One two. Three four! Five??  Six"),  # 3 terminator runs
        (1, "no punctuation at all"),
        (2, ""),
        (3, "Trailing ok."),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r for r in df.select("id", *TX.sentence_stats(F.col("t"))).collect()}
    assert got[0]["n_sentences"] == 3          # '??' is one run
    assert got[0]["n_tokens"] == 6
    assert got[0]["terminal_end"] is False
    assert got[1]["n_sentences"] == 0 and got[1]["avg_sentence_tokens"] is None
    assert got[2]["n_tokens"] == 0
    assert got[3]["n_sentences"] == 1 and got[3]["terminal_end"] is True


def test_fix_mojibake_kernel_and_udf(spark):
    from unified_ocr_pipeline_spark.functions.normalize import fix_mojibake
    from unified_ocr_pipeline_spark.kernels.mojibake import fix_mojibake_str as fix

    assert fix("cafÃ©") == "café"
    assert fix("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    assert fix("plain ascii") == "plain ascii"     # no-op
    assert fix("café") == "café"                   # already clean: no-op
    assert fix("日本語") == "日本語"                 # non-latin clean: no-op
    assert fix(None) is None
    # double mojibake unwinds twice
    s = "é".encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    assert fix(s) == "é"
    # cp1252 fallback covers the 0x80-0x9F gap (smart quotes)
    s2 = "it’s".encode("utf-8").decode("cp1252")
    assert fix(s2) == "it’s"
    # and the vectorized UDF matches the scalar kernel
    df = spark.createDataFrame(
        [(0, "cafÃ©"), (1, "ok"), (2, None)], "id long, t string"
    )
    got = {r["id"]: r["f"] for r in df.select("id", fix_mojibake("t").alias("f")).collect()}
    assert got == {0: "café", 1: "ok", 2: None}


def test_c4_line_rules(spark):
    from unified_ocr_pipeline_spark.functions import text as TX
    from pyspark.sql import functions as F

    body = "\n".join([
        "This sentence has enough words and ends well.",   # keep
        "Short line here.",                                # <5 words
        "plenty of words but missing the terminal mark",   # no terminal
        "Please enable javascript to continue reading.",   # banned word
        "Lorem Ipsum filler text should be dropped now.",  # banned phrase
        "Braces {x} inside a long enough sentence fail.",  # brace
        'He said "the quoted close counts as terminal."',  # quote terminal
    ])
    row = spark.range(1).select(
        TX.c4_clean(F.lit(body)).alias("c"), *TX.c4_line_counts(F.lit(body))
    ).collect()[0]
    assert row["c"] == (
        "This sentence has enough words and ends well.\n"
        'He said "the quoted close counts as terminal."'
    )
    assert row["n_lines"] == 7 and row["n_kept_lines"] == 2
