"""Round-3 additions: training-shard writer, rendezvous sharding, and
Stupid Backoff bigram LM scoring."""

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shard_manifest
# ---------------------------------------------------------------------------

def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string")).alias("text"),
        (F.col("id") % 13 + 1).alias("n_chars"),
    )


def test_shard_manifest_covers_disjointly(spark):
    from unified_ocr_pipeline_spark.operators import shards as SH

    d = _docs(spark)
    m = SH.shard_manifest(d, "doc_id", n_shards=8, size_col="n_chars")
    rows = m.collect()
    assert len(rows) == 8
    assert sum(r["n_docs"] for r in rows) == 200
    total_sz = d.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == total_sz


def test_shard_manifest_deterministic_and_order_sensitive(spark):
    from unified_ocr_pipeline_spark.operators import shards as SH

    d = _docs(spark)
    a = {r["shard"]: r["roster_md5"] for r in
         SH.shard_manifest(d, "doc_id", 8, "n_chars").collect()}
    # identical re-run (different physical row order) → identical rosters
    b = {r["shard"]: r["roster_md5"] for r in
         SH.shard_manifest(d.repartition(13), "doc_id", 8, "n_chars").collect()}
    assert a == b
    # dropping one doc changes exactly that doc's shard fingerprint
    c = {r["shard"]: r["roster_md5"] for r in
         SH.shard_manifest(d.where("doc_id <> 57"), "doc_id", 8, "n_chars")
         .collect()}
    changed = [s for s in a if a[s] != c.get(s)]
    assert len(changed) == 1


# ---------------------------------------------------------------------------
# hrw (rendezvous) sharding
# ---------------------------------------------------------------------------

def test_hrw_growth_moves_only_to_new_shards(spark):
    """THE rendezvous property: growing 8 -> 10 relocates ~2/10 of docs
    and every mover lands on a NEW shard (id >= 8)."""
    from unified_ocr_pipeline_spark.operators import shards as SH

    d = _docs(spark, 500)
    rep = SH.hrw_rebalance(d, "doc_id", 8, 10).collect()
    moved = [r for r in rep if r["moved"]]
    assert all(r["shard_b"] >= 8 for r in moved)
    assert all(r["shard_a"] == r["shard_b"] for r in rep if not r["moved"])
    frac = len(moved) / len(rep)
    assert 0.08 < frac < 0.35  # expectation 0.2


def test_hrw_beats_modulo_on_churn(spark):
    """Modulo sharding relocates the vast majority on the same resize."""
    from unified_ocr_pipeline_spark.operators import shards as SH
    from unified_ocr_pipeline_spark.operators.sampling import md5_60

    d = _docs(spark, 500)
    hrw_moved = (
        SH.hrw_rebalance(d, "doc_id", 8, 10).where("moved").count()
    )
    mod = d.select(
        (md5_60(F.col("doc_id")) % 8 != md5_60(F.col("doc_id")) % 10)
        .alias("m")
    )
    mod_moved = mod.where("m").count()
    assert hrw_moved * 2 < mod_moved


# ---------------------------------------------------------------------------
# stupid backoff
# ---------------------------------------------------------------------------

def test_stupid_backoff_hand_example(spark):
    """4 identical docs in the sample make 'a b' a strong bigram;
    scoring a doc that is exactly 'a b' must yield ln(c12/c1) with the
    hand-computed counts, and an unseen pair must take the 0.4-backoff."""
    from unified_ocr_pipeline_spark.operators import lm as LM

    # ids chosen so md5_60(id) % 1 == 0 keeps every doc in-sample
    docs = spark.createDataFrame(
        [(i, "a b a b") for i in range(4)] + [(100, "a zzz")],
        "doc_id long, text string",
    )
    uni, big, n = LM.stupid_backoff_train(
        docs, "text", "doc_id", sample_mod=1, bigram_min_count=2
    )
    # sample = all 5 docs: tokens 4*(a b a b) + (a zzz) = 18 tokens
    assert n == 18
    u = {r["w"]: r["c1"] for r in uni.collect()}
    assert u == {"a": 9, "b": 8, "zzz": 1}
    b = {(r["w1"], r["w2"]): r["c12"] for r in big.collect()}
    assert b[("a", "b")] == 8 and b[("b", "a")] == 4

    scored = {
        r["doc_id"]: r
        for r in LM.stupid_backoff_score(
            docs, uni, big, n, "text", "doc_id"
        ).collect()
    }
    # doc 100 = 'a zzz': single bigram, (a,zzz) unseen (c=1 < cutoff)
    # -> backoff 0.4 * c1(zzz)/N = 0.4 * 1/18
    assert scored[100]["n_bigrams"] == 1
    assert math.isclose(
        scored[100]["sb_logscore"], math.log(0.4 * 1.0 / 18.0), rel_tol=1e-12
    )
    # doc 0 = 'a b a b': bigrams (a,b),(b,a),(a,b)
    want = (2 * math.log(8 / 9) + math.log(4 / 8)) / 3
    assert math.isclose(scored[0]["sb_logscore"], want, rel_tol=1e-12)


def test_stupid_backoff_drops_short_docs(spark):
    from unified_ocr_pipeline_spark.operators import lm as LM

    docs = spark.createDataFrame(
        [(1, "hello world again"), (2, "solo"), (3, "  ")],
        "doc_id long, text string",
    )
    uni, big, n = LM.stupid_backoff_train(docs, sample_mod=1)
    out = LM.stupid_backoff_score(docs, uni, big, n).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_stupid_backoff_fluency_direction(spark):
    """A doc made of the corpus's dominant phrase outscores a doc of the
    same tokens scrambled into unseen pairings."""
    from unified_ocr_pipeline_spark.operators import lm as LM

    corpus = [(i, "the quick brown fox jumps") for i in range(20)]
    probes = [(1000, "the quick brown fox jumps"),
              (1001, "fox the jumps quick brown")]
    docs = spark.createDataFrame(corpus + probes, "doc_id long, text string")
    uni, big, n = LM.stupid_backoff_train(docs, sample_mod=1)
    got = {
        r["doc_id"]: r["sb_logscore"]
        for r in LM.stupid_backoff_score(docs, uni, big, n).collect()
    }
    assert got[1000] > got[1001]


# ---------------------------------------------------------------------------
# winnowing (MOSS)
# ---------------------------------------------------------------------------

def test_winnow_guarantee_shared_run(spark):
    """Schleimer et al. §2: a shared substring of length >= k+window-1
    guarantees at least one shared fingerprint."""
    from unified_ocr_pipeline_spark.operators import dedup as DD

    shared = "XqWvZpLmNoRt19872AbCdEfGhIjKlMnOp"  # 33 chars >> 8+4-1
    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc " + shared + " dddd eeee"),
            (2, "zz yy xx ww vv " + shared + " uu tt ss"),
            (3, "totally unrelated content with no overlap at all 123"),
        ],
        "doc_id long, text string",
    )
    pairs = DD.winnow_pairs(
        docs, "doc_id", "text", k=8, window=4, min_shared=1, max_fp_df=100
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_winnow_short_and_empty_docs_no_fps(spark):
    from unified_ocr_pipeline_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(1, ""), (2, "tiny"), (3, "elevenchars")],  # 11 = k+window-1 exactly
        "doc_id long, text string",
    )
    fps = DD.winnow_fingerprints(docs, "doc_id", "text", k=8, window=4)
    got = {r["id"]: 1 for r in fps.collect()}
    assert 1 not in got and 2 not in got
    assert 3 in got  # exactly one window of 4 grams -> one fingerprint


def test_winnow_flood_prune_kills_boilerplate(spark):
    """A fingerprint present in every doc is boilerplate: with
    max_fp_df below the doc count it must not produce pairs."""
    from unified_ocr_pipeline_spark.operators import dedup as DD

    boiler = "COMMONBOILERPLATEHEADERSTRING"
    docs = spark.createDataFrame(
        [(i, boiler + f" unique tail {i} {i*7} {i*13}") for i in range(10)],
        "doc_id long, text string",
    )
    with_flood = DD.winnow_pairs(
        docs, "doc_id", "text", min_shared=1, max_fp_df=5
    ).count()
    without = DD.winnow_pairs(
        docs, "doc_id", "text", min_shared=1, max_fp_df=1000
    ).count()
    assert without == 45  # all pairs share the boilerplate fingerprints
    assert with_flood < without
