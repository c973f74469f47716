"""HyperLogLog / weighted-priority-sampling / anchor-text tests.

The HLL tests pin the register math's exactness properties (duplicate
invariance, bounded relative error, linear-counting fallback) rather
than golden values — the golden check is the DuckDB oracle replay in
check_correctness. The anchor tests drive the stdlib HTML collector
through its recovery paths (nesting, whitespace, unclosed tags)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.kernels.html_extract import extract_anchors
from unified_ocr_pipeline_spark.operators import linkgraph as LG
from unified_ocr_pipeline_spark.operators import sampling as SAMP


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _keys(spark, n, prefix="k"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_hll_within_expected_error(spark):
    n = 5000
    row = SAMP.hll_count_distinct(_keys(spark, n), "key", p=10).first()
    # 1.04/sqrt(1024) ~ 3.25% standard error; allow 4 sigma
    assert abs(row.estimate - n) / n < 4 * 1.04 / math.sqrt(1024)
    assert row.m == 1024


def test_hll_duplicate_invariance(spark):
    base = _keys(spark, 800)
    dup3 = base.union(base).union(base)
    a = SAMP.hll_count_distinct(base, "key", p=9).first()
    b = SAMP.hll_count_distinct(dup3, "key", p=9).first()
    # registers keep a max — multiplicity cannot move any register
    assert a.estimate == b.estimate
    assert a.zero_registers == b.zero_registers


def test_hll_linear_counting_fallback(spark):
    # 40 keys into m=4096 registers: raw estimate lands far below
    # 2.5m with plenty of empty registers -> linear-counting branch
    row = SAMP.hll_count_distinct(_keys(spark, 40), "key", p=12).first()
    m, v = 4096, row.zero_registers
    assert v > 0
    assert row.estimate == pytest.approx(m * math.log(m / v))
    assert row.estimate != row.raw_estimate
    assert abs(row.estimate - 40) < 5


def test_hll_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,)], "key string"
    )
    row = SAMP.hll_count_distinct(df, "key", p=7).first()
    assert 0 < row.estimate < 10


def test_hll_p_bounds():
    # p is validated before the frame is touched
    with pytest.raises(ValueError):
        SAMP.hll_count_distinct(None, "key", p=6)
    with pytest.raises(ValueError):
        SAMP.hll_count_distinct(None, "key", p=19)


def test_hll_shuffle_bounded_by_partial_agg(spark):
    # the register agg must run a map-side partial max before the
    # exchange — that is what caps the shuffle at O(tasks * m)
    plan = SAMP.hll_count_distinct(
        _keys(spark, 100), "key", p=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan


# ---------------------------------------------------------------------------
# Weighted priority sampling (A-ES)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def weighted(spark):
    # ids 0..399: weight 1 for even ids, 20 for odd ids
    return spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(1))
        .otherwise(F.lit(20))
        .alias("w"),
    )


def test_priority_sample_deterministic(spark, weighted):
    a = [r.doc_id for r in SAMP.priority_sample(weighted, "doc_id", "w", 25).collect()]
    b = [r.doc_id for r in SAMP.priority_sample(weighted, "doc_id", "w", 25).collect()]
    assert a == b
    assert len(a) == 25 == len(set(a))


def test_priority_sample_weight_bias(spark, weighted):
    rows = SAMP.priority_sample(weighted, "doc_id", "w", 40).collect()
    heavy = sum(1 for r in rows if r.w == 20)
    # heavy rows are 20x likelier per draw; at 50/50 population the
    # sample should be overwhelmingly heavy (binomial tail, p<<1e-6)
    assert heavy >= 30


def test_priority_sample_seed_changes_selection(spark, weighted):
    a = {r.doc_id for r in SAMP.priority_sample(weighted, "doc_id", "w", 25).collect()}
    b = {
        r.doc_id
        for r in SAMP.priority_sample(weighted, "doc_id", "w", 25, seed=7).collect()
    }
    assert a != b


def test_priority_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in SAMP.priority_sample(df, "doc_id", "w", 10).collect()}
    assert got == {1, 5}


def test_priority_sample_no_global_sort(spark, weighted):
    plan = (
        SAMP.priority_sample(weighted, "doc_id", "w", 25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full-sort operator anywhere


def test_priority_sample_priorities_in_unit_interval(spark, weighted):
    rows = SAMP.priority_sample(weighted, "doc_id", "w", 25).collect()
    assert all(0.0 < r.priority <= 1.0 for r in rows)
    pris = [r.priority for r in rows]
    assert pris == sorted(pris, reverse=True)


# ---------------------------------------------------------------------------
# Anchor text
# ---------------------------------------------------------------------------


def test_extract_anchors_basic_and_whitespace():
    h = (
        '<p>pre</p><a href="http://x.com/a">Hello\n  <b>World</b> </a>'
        '<a href="/rel">relative skipped</a>'
        '<a href="mailto:a@b">mail skipped</a>'
        '<a href="https://y.com/b"></a>'
    )
    assert extract_anchors(h) == [
        ("http://x.com/a", "Hello World"),
        ("https://y.com/b", ""),
    ]


def test_extract_anchors_nested_and_unclosed():
    # nested anchor: inner text to the innermost (browser recovery);
    # unclosed anchors flush at EOF
    h = '<a href="https://o.com">out <a href="http://i.com">in</a>side</a>'
    assert extract_anchors(h) == [
        ("http://i.com", "in"),
        ("https://o.com", "out side"),
    ]
    assert extract_anchors('<a href="http://q.com">tail') == [
        ("http://q.com", "tail")
    ]
    assert extract_anchors(None) == []
    assert extract_anchors("<a href=") == []


def test_anchor_edges_and_profile(spark):
    pages = spark.createDataFrame(
        [
            (
                "u1",
                b'<a href="http://h1.com/x">news</a>'
                b'<a href="http://h1.com/y">news</a>'
                b'<a href="http://h2.com/z">blog</a>',
            ),
            ("u2", b'<a href="http://h1.com/w">archive</a>'),
            ("u3", None),
        ],
        "url string, html binary",
    )
    prof = {
        r.dst_host: r
        for r in LG.anchor_text_profile(
            LG.anchor_edges(pages, "url", "html")
        ).collect()
    }
    assert prof["h1.com"].n_anchors == 3
    assert prof["h1.com"].n_texts == 2
    assert prof["h1.com"].top_anchor == "news"
    assert prof["h1.com"].top_anchor_n == 2
    assert prof["h2.com"].top_anchor == "blog"


def test_anchor_profile_tie_breaks_lexicographically(spark):
    edges = spark.createDataFrame(
        [
            ("u1", "http://h.com/1", "zeta", 0),
            ("u2", "http://h.com/2", "alpha", 0),
        ],
        "src_url string, href string, anchor string, link_pos int",
    )
    row = LG.anchor_text_profile(edges).first()
    assert row.top_anchor == "alpha"
    assert row.top_anchor_n == 1


# ---------------------------------------------------------------------------
# crawl-frontier BFS (round 3)
# ---------------------------------------------------------------------------


def test_frontier_bfs_min_depth_and_cycles(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),  # cycle
         ("a", "d"), ("d", "e"), ("e", "f"),  # chain
         ("b", "d"),                           # shortcut (d stays depth 1)
         ("x", "y")],                          # unreachable island
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["depth"]
        for r in LG.frontier_bfs(edges, "src", "dst", seeds, max_depth=3).collect()
    }
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2, "e": 2, "f": 3}


def test_frontier_bfs_depth_zero_and_no_edges(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "node string")
    got = LG.frontier_bfs(edges, "src", "dst", seeds, max_depth=2).collect()
    assert [(r["node"], r["depth"]) for r in got] == [("s", 0)]


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    keys = _keys(spark, 2000)
    bloom = SAMP.bloom_build(keys, "key", m_bits=1 << 15, k=3)
    out = SAMP.bloom_probe(bloom, keys, "key", m_bits=1 << 15, k=3)
    assert out.count() == 2000
    assert out.where(~F.col("maybe_present")).count() == 0


def test_bloom_fpr_within_budget(spark):
    n = 2000
    members = _keys(spark, n, prefix="in")
    others = _keys(spark, n, prefix="out")
    m = 1 << 15
    bloom = SAMP.bloom_build(members, "key", m_bits=m, k=3)
    fp = (
        SAMP.bloom_probe(bloom, others, "key", m_bits=m, k=3)
        .where(F.col("maybe_present"))
        .count()
    )
    # theory: (1 - e^(-k*n/m))^k ~ 0.47% here; allow generous slack —
    # the point is "rare", the bit-exact check is the DuckDB oracle
    theory = (1 - math.exp(-3 * n / m)) ** 3
    assert fp / n < 4 * theory + 0.002


def test_bloom_duplicate_invariance(spark):
    base = _keys(spark, 500)
    a = SAMP.bloom_build(base, "key", m_bits=1 << 12, k=3)
    b = SAMP.bloom_build(base.union(base), "key", m_bits=1 << 12, k=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bloom_words_bounded_and_32bit(spark):
    m = 1 << 12
    bloom = SAMP.bloom_build(_keys(spark, 5000), "key", m_bits=m, k=3)
    rows = bloom.collect()
    assert len(rows) <= m // 32
    for r in rows:
        assert 0 <= r.word < m // 32
        assert 0 < r.bits < (1 << 32)  # 32-bit packing stays non-negative


def test_bloom_null_keys_ignored(spark):
    df = spark.sql("SELECT * FROM VALUES ('a'), (CAST(NULL AS STRING)) t(key)")
    bloom = SAMP.bloom_build(df, "key", m_bits=1 << 12, k=3)
    probed = SAMP.bloom_probe(bloom, df, "key", m_bits=1 << 12, k=3)
    assert probed.count() == 1  # the null probe row is dropped, not guessed


def test_bloom_param_validation(spark):
    with pytest.raises(AssertionError):
        SAMP.bloom_build(_keys(spark, 1), "key", m_bits=1000, k=3)
    with pytest.raises(AssertionError):
        SAMP.bloom_build(_keys(spark, 1), "key", m_bits=1 << 30, k=3)


def test_bloom_probe_broadcasts_filter(spark):
    keys = _keys(spark, 100)
    bloom = SAMP.bloom_build(keys, "key", m_bits=1 << 12, k=3)
    plan = (
        SAMP.bloom_probe(bloom, keys, "key", m_bits=1 << 12, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# UniMax budget-capped mixture allocation
# ---------------------------------------------------------------------------


def _unimax_python(totals: dict, budget: int, epoch_cap: int) -> dict:
    """The paper's iterative water-filling loop, as the differential
    reference for the closed-form prefix implementation."""
    remaining = {s: epoch_cap * t for s, t in totals.items()}
    alloc, b = {}, float(budget)
    while remaining:
        share = b / len(remaining)
        capped = {s: c for s, c in remaining.items() if c <= share}
        if not capped:
            for s in remaining:
                alloc[s] = share
            return alloc
        for s, c in capped.items():
            alloc[s] = float(c)
            b -= c
            del remaining[s]
    return alloc


def _unimax_df(spark, totals):
    rows = [(f"d{s}{i}", s, t // 4 + (i < t % 4)) for s, t in totals.items()
            for i in range(4)]
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_chars long"
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_unimax_matches_iterative_waterfill(spark, seed):
    import random

    rng = random.Random(seed)
    totals = {f"s{i:02d}": rng.randint(50, 5000) for i in range(rng.randint(2, 12))}
    budget = rng.randint(100, 3 * sum(totals.values()))
    cap = rng.choice([1, 2, 4])
    got = {
        r.source: r.allocated
        for r in SAMP.unimax_allocate(
            _unimax_df(spark, totals), "source", "n_chars", budget, cap
        ).collect()
    }
    want = _unimax_python(totals, budget, cap)
    assert got.keys() == want.keys()
    for s in want:
        assert got[s] == pytest.approx(want[s], rel=1e-12), (s, budget, cap)


def test_unimax_all_capped_when_budget_exceeds_capacity(spark):
    totals = {"a": 100, "b": 300}
    out = SAMP.unimax_allocate(
        _unimax_df(spark, totals), "source", "n_chars", budget=10_000, epoch_cap=2
    ).collect()
    by = {r.source: r for r in out}
    assert by["a"].allocated == 200.0 and by["b"].allocated == 600.0
    assert by["a"].epochs == 2.0  # nobody exceeds the epoch cap, ever


def test_unimax_total_allocation_equals_budget_when_constrained(spark):
    totals = {f"s{i}": 100 * (i + 1) for i in range(6)}
    budget = 900  # < sum of capacities at cap 2 (4200)
    out = SAMP.unimax_allocate(
        _unimax_df(spark, totals), "source", "n_chars", budget, epoch_cap=2
    ).collect()
    assert sum(r.allocated for r in out) == pytest.approx(budget)


def test_unimax_sample_copies_track_allocation(spark):
    rows = [(f"d{i}", f"s{i % 3}", 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_chars long")
    budget, cap = 20_000, 3
    alloc = {
        r.source: r.allocated
        for r in SAMP.unimax_allocate(df, "source", "n_chars", budget, cap).collect()
    }
    samp = SAMP.unimax_sample(df, "doc_id", "source", "n_chars", budget, cap)
    kept = {
        r.source: r.tok
        for r in samp.groupBy("source")
        .agg(F.sum(F.col("n_chars") * F.col("n_copies")).alias("tok"))
        .collect()
    }
    for s, a in alloc.items():
        # floor copies are exact; the fractional tail is hash-sampled, so
        # per-source kept tokens land within a few docs of the allocation
        assert abs(kept[s] - a) <= 50 * 12, (s, kept[s], a)
    # deterministic: a re-run keeps the identical doc set
    again = SAMP.unimax_sample(df, "doc_id", "source", "n_chars", budget, cap)
    assert sorted((r.doc_id, r.n_copies) for r in samp.collect()) == sorted(
        (r.doc_id, r.n_copies) for r in again.collect()
    )


def test_unimax_sample_broadcasts_rates(spark):
    rows = [(f"d{i}", f"s{i % 3}", 50) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, source string, n_chars long")
    plan = (
        SAMP.unimax_sample(df, "doc_id", "source", "n_chars", 5_000, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_unimax_param_validation(spark):
    df = _unimax_df(spark, {"a": 10})
    with pytest.raises(ValueError):
        SAMP.unimax_allocate(df, "source", "n_chars", budget=0)
    with pytest.raises(ValueError):
        SAMP.unimax_allocate(df, "source", "n_chars", budget=10, epoch_cap=0)


def test_kmv_merge_equals_direct_sketch(spark):
    """Mergeability: union-retop of disjoint-batch sketches == the
    direct whole-set sketch, hash for hash."""
    from unified_ocr_pipeline_spark.operators.sampling import kmv_merge, kmv_sketch

    df = spark.createDataFrame([(i,) for i in range(500)], "k int")
    a = kmv_sketch(df.where("k < 250"), "k", k=32)
    b = kmv_sketch(df.where("k >= 250"), "k", k=32)
    merged = sorted(r["h"] for r in kmv_merge([a, b], k=32).collect())
    direct = sorted(r["h"] for r in kmv_sketch(df, "k", k=32).collect())
    assert merged == direct and len(merged) == 32


def test_kmv_merge_overlapping_batches_dedup(spark):
    """Overlap between batches must not bias the union (distinct on
    hash before the re-top)."""
    from unified_ocr_pipeline_spark.operators.sampling import kmv_merge, kmv_sketch

    df = spark.createDataFrame([(i,) for i in range(300)], "k int")
    a = kmv_sketch(df.where("k < 200"), "k", k=16)
    b = kmv_sketch(df.where("k >= 100"), "k", k=16)  # 100-199 overlap
    merged = [r["h"] for r in kmv_merge([a, b], k=16).collect()]
    assert len(merged) == len(set(merged)) == 16
