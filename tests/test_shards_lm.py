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
