"""Unit tests for dedup / similarity / multimodal operators using planted
duplicates (the testdata tables contain no true near-dups)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.operators import dedup as DD
from unified_ocr_pipeline_spark.operators import similarity as SIM
from unified_ocr_pipeline_spark.operators import multimodal as MM

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, _doc(rng)))
    base = _doc(rng)
    # plant: 100=101 exact dup; 102 = near dup of 100 (one word changed)
    rows.append((100, base))
    rows.append((101, base))
    toks = base.split()
    toks[5] = "OMEGA"
    rows.append((102, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_groups(spark, docs):
    g = DD.exact_dedup_groups(docs, "doc_id", "text")
    dups = {r["keeper_id"]: r["n_docs"] for r in g.where("n_docs > 1").collect()}
    assert dups == {100: 2}


def test_minhash_finds_planted_neardup(spark, docs):
    sigs = DD.minhash_signatures(docs, "doc_id", "text", num_hashes=32)
    pairs = DD.minhash_lsh_pairs(sigs, num_hashes=32, num_bands=8, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (100, 101) in got          # exact dup → est_jaccard 1.0
    assert (100, 102) in got or (101, 102) in got  # near dup caught by LSH
    # no false positives among the random docs
    assert all(a >= 100 for a, b in got), got


def test_simhash_finds_planted_neardup(spark, docs):
    sig = DD.simhash(docs, "doc_id", "text")
    pairs = DD.simhash_near_dups(sig, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(100, 101)] == 0
    assert (100, 102) in got


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = DD.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, max_shingle_df=10**9
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(100, 101)] == 1.0
    assert (100, 102) in got and 0.3 <= got[(100, 102)] < 1.0


def test_brute_force_topk_math(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    top = SIM.brute_force_topk(df, df.where("vec_id = 0"), k=2)
    rows = sorted((r["nid"], r["sim"]) for r in top.collect())
    assert [n for n, _ in rows] == [1, 2]
    want1 = 1.0 / math.sqrt(1.01)
    assert abs(dict(rows)[1] - round(want1, 4)) < 1e-9
    assert dict(rows)[2] == 0.0


def test_lsh_topk_recall_on_testdata(spark):
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r["qid"], r["nid"]) for r in SIM.brute_force_topk(e, q, k=3).collect()
    }
    # These embeddings are near-random (top-1 cosine ≈ 0.3-0.4), the hardest
    # case for SRP-LSH: p_bucket = (1-θ/π)^bits per table. 12 tables × 4 bits
    # gives ~0.8 expected recall at sim 0.3; real near-dup corpora (sim>0.8)
    # reach the same recall with far fewer/larger-bit tables.
    approx = {
        (r["qid"], r["nid"])
        for r in SIM.lsh_topk(e, q, dim=64, k=3, n_tables=12, n_bits=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_multimodal_stub_plumbing(spark):
    rows = [(1, b"\x89PNG1234"), (2, b"\xff\xd8\xffdata"), (3, b"RIFFwav"), (4, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = {r["media_id"]: r.asDict() for r in MM.extract_media_metadata(df).collect()}
    assert out[1]["format"] == "png" and out[2]["format"] == "jpeg"
    assert out[3]["format"] == "wav" and out[4]["format"] == "bin"
    assert all(64 <= out[i]["width"] < 256 for i in out)
    assert out[1]["n_bytes"] == 8
    # deterministic
    again = {r["media_id"]: r["content_sha256"] for r in MM.extract_media_metadata(df).collect()}
    assert all(again[i] == out[i]["content_sha256"] for i in out)


def test_multimodal_real_decoder_rejects_non_images():
    # the real decoder is live for PNG/BMP/PPM (tests/test_imagecodec.py);
    # non-image bytes still raise so callers route them to the stub
    with pytest.raises(ValueError):
        MM.decode_media_real(b"\x89PNG truncated garbage")
    with pytest.raises(ValueError):
        MM.decode_media_real(b"RIFFwav-audio-has-no-real-decoder")


def test_spread_heuristic_walks_plan_nodes(spark):
    # a string literal 'Join' in a filter must NOT read as a shuffle —
    # detection is structural (node names), not plan-text substring match
    d = spark.range(64).select(F.col("id"), F.lit("Join Sort Window").alias("s"))
    scan = d.where(F.col("s") == "Join")
    assert not DD._plan_has_shuffling_node(scan)
    assert DD._plan_has_shuffling_node(d.groupBy("s").count())
    assert DD._plan_has_shuffling_node(d.join(d.select("id"), "id"))
    p = spark.sparkContext.defaultParallelism
    assert DD._spread_for_python_stage(scan).rdd.getNumPartitions() >= min(p, 2)


# ---------------------------------------------------------------------------
# as-of join (operators/asof.py)
# ---------------------------------------------------------------------------

def test_asof_join_basic_and_strict(spark):
    from unified_ocr_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u1", 100, "a"), ("u1", 205, "b"), ("u2", 50, "c"), ("u3", 10, "d")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 90, 1.0), ("u1", 100, 2.0), ("u1", 200, 3.0), ("u2", 60, 4.0)],
        "k string, ts long, v double",
    )
    out = {
        r["tag"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out["a"] == (100, 2.0)   # equal ts matches (<= semantics)
    assert out["b"] == (200, 3.0)
    assert out["c"] == (None, None)  # right row is in the future
    assert out["d"] == (None, None)  # no right rows for key

    strict = {
        r["tag"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], strict=True,
        ).collect()
    }
    assert strict["a"] == (90, 1.0)  # equal-ts right row excluded


def test_asof_join_tolerance(spark):
    from unified_ocr_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([("u1", 1000, "a")], "k string, ts long, tag string")
    right = spark.createDataFrame([("u1", 100, 9.0)], "k string, ts long, v double")
    hit = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance=900,
    ).first()
    assert (hit["asof_ts"], hit["asof_v"]) == (100, 9.0)
    miss = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance=899,
    ).first()
    assert (miss["asof_ts"], miss["asof_v"]) == (None, None)


def test_multimodal_resize_and_frame_sample(spark):
    media = spark.createDataFrame(
        [(1, b"\x89PNG" + b"x" * 20000), (2, b"\xff\xd8\xffzz" + b"y" * 9000)],
        "media_id long, media binary",
    )
    resized = {r["media_id"]: r for r in MM.resize_media(media, max_dim=100).collect()}
    for mid in (1, 2):
        assert max(resized[mid]["width"], resized[mid]["height"]) <= 100
        assert len(resized[mid]["media"]) <= [20004, 9005][mid - 1]

    frames = MM.sample_frames(media, every_n_bytes=4096, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 3          # 20 KB → capped at 3 frames
    assert len(by_id[2]) == 2          # 9 KB → 2 full strides
    assert all(len(r["frame"]) <= 4096 for r in frames)
    # deterministic: same input → same frames
    again = MM.sample_frames(media, every_n_bytes=4096, max_frames=3).collect()
    assert sorted((r["media_id"], r["frame_no"]) for r in again) == sorted(
        (r["media_id"], r["frame_no"]) for r in frames
    )


# ---------------------------------------------------------------------------
# range join (operators/interval.py)
# ---------------------------------------------------------------------------

def test_range_join_inner_exact_window(spark):
    from unified_ocr_pipeline_spark.operators.interval import range_join

    left = spark.createDataFrame(
        [("u1", 1000, "a"), ("u1", 5000, "b"), ("u2", 1000, "c")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 900, 1.0), ("u1", 1000, 2.0), ("u1", 1100, 3.0),
         ("u1", 4500, 4.0), ("u2", 3000, 5.0)],
        "k string, ts long, v double",
    )
    out = range_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower=-100, upper=100, value_cols=["v"],
    ).collect()
    got = sorted((r["tag"], r["r_ts"], r["v"]) for r in out)
    # window inclusive both ends; bin boundaries must not lose edge matches
    assert got == [("a", 900, 1.0), ("a", 1000, 2.0), ("a", 1100, 3.0)]


def test_range_join_left_keeps_unmatched(spark):
    from unified_ocr_pipeline_spark.operators.interval import range_join

    left = spark.createDataFrame(
        [("u1", 1000, "a"), ("u3", 9999, "z")], "k string, ts long, tag string"
    )
    right = spark.createDataFrame([("u1", 950, 7.0)], "k string, ts long, v double")
    out = {
        r["tag"]: (r["r_ts"], r["v"])
        for r in range_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            lower=-100, upper=0, value_cols=["v"], how="left",
        ).collect()
    }
    assert out["a"] == (950, 7.0)
    assert out["z"] == (None, None)


def test_range_join_bin_width_invariance(spark):
    """Same result for any bin width (bins are an execution detail)."""
    from unified_ocr_pipeline_spark.operators.interval import range_join

    rng = random.Random(5)
    left = spark.createDataFrame(
        [("u%d" % rng.randint(0, 3), rng.randint(0, 10000), i) for i in range(40)],
        "k string, ts long, lid long",
    )
    right = spark.createDataFrame(
        [("u%d" % rng.randint(0, 3), rng.randint(0, 10000), float(i)) for i in range(60)],
        "k string, ts long, v double",
    )
    def run(bw):
        return sorted(
            (r["lid"], r["r_ts"], r["v"])
            for r in range_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                lower=-500, upper=250, value_cols=["v"], bin_width=bw,
            ).collect()
        )
    base = run(None)
    assert base == run(100) == run(10000)
    assert len(base) > 0


# --------------------------------------------------------------------------
# IVF (inverted-file ANN) — operators/ivf.py
# --------------------------------------------------------------------------

def test_ivf_assign_cells_total_and_range(spark):
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = IVF.seeded_centroids(16, 64)
    a = IVF.assign_cells(e, "vec_id", "embedding", cents)
    stats = a.agg(
        F.count("*").alias("n"),
        F.min("cell").alias("lo"),
        F.max("cell").alias("hi"),
        F.countDistinct("cell").alias("cells"),
    ).collect()[0]
    assert stats["n"] == e.count()          # every vector lands in one cell
    assert 0 <= stats["lo"] and stats["hi"] < 16
    assert stats["cells"] > 1               # quantizer actually partitions


def test_ivf_finds_planted_copies_with_one_probe(spark):
    """An identical vector always quantizes to the same cell, so a planted
    copy is found even at nprobe=1 — the IVF invariant that matters for
    near-dup workloads."""
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = e.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(copies)
    top = IVF.ivf_topk(
        corpus, corpus.where(F.col("vec_id") >= 1000000),
        k=1, n_cells=16, nprobe=1, dim=64,
    )
    got = {(r["qid"], r["nid"], r["sim"]) for r in top.collect()}
    assert got == {(1000000 + i, i, 1.0) for i in range(5)}


def test_ivf_recall_vs_brute_force(spark):
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r["qid"], r["nid"]) for r in SIM.brute_force_topk(e, q, k=3).collect()
    }
    # near-random embeddings are the adversarial case for IVF exactly as
    # for LSH: an unrelated neighbor lands in a probed cell w.p. ~nprobe/K.
    # nprobe=8 of 16 cells → expected recall ~0.5 floor; planted-dup
    # corpora (the real workload) hit 1.0 at nprobe=1 (test above).
    approx = {
        (r["qid"], r["nid"])
        for r in IVF.ivf_topk(e, q, k=3, n_cells=16, nprobe=8, dim=64).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"


def test_ivf_kmeans_train_beats_seeded_quantization(spark):
    """Trained centroids must (a) be deterministic, (b) have exactly
    n_cells rows, (c) cut quantization error vs data-independent seeded
    centroids — the property that makes trained IVF cells balanced."""
    import numpy as np
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    c1 = IVF.kmeans_train(e, "embedding", n_cells=8, sample_rows=500, iters=5)
    c2 = IVF.kmeans_train(e, "embedding", n_cells=8, sample_rows=500, iters=5)
    assert np.allclose(c1, c2)              # deterministic sample + seed
    assert len(c1) == 8 and len(c1[0]) == 64

    X = np.array(
        [r["embedding"] for r in e.select("embedding").collect()], dtype=np.float64
    )

    def qerr(cents):
        C = np.asarray(cents)
        d2 = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)
        )
        return d2.min(axis=1).sum()

    assert qerr(c1) < qerr(IVF.seeded_centroids(8, 64))


# --------------------------------------------------------------------------
# sampling / curation — operators/sampling.py
# --------------------------------------------------------------------------

def test_sample_per_group_quota_and_determinism(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    s1 = SAMP.sample_per_group(d, ["source"], "doc_id", 10)
    per = {r["source"]: r["n"] for r in s1.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert set(per.values()) == {10}            # exact quota per group
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    s2 = SAMP.sample_per_group(
        d.repartition(7), ["source"], "doc_id", 10  # partition-order independent
    )
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2


def test_quantile_gate_keeps_top_half(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    kept = SAMP.quantile_gate_per_group(
        d, ["lang"], "n_chars", 0.5, tie_cols=["doc_id"]
    )
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    k = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in tot.items():
        # percent_rank >= 0.5 keeps ceil(n/2)±1 rows of each group
        assert abs(k[lang] - n / 2) <= 1, (lang, k[lang], n)
    # gate keeps the LARGE half: min kept n_chars >= median-ish per lang
    lo = kept.groupBy("lang").agg(F.min("n_chars").alias("lo")).collect()
    med = {
        r["lang"]: r["m"]
        for r in d.groupBy("lang").agg(
            F.expr("percentile(n_chars, 0.5)").alias("m")).collect()
    }
    for r in lo:
        assert r["lo"] >= med[r["lang"]] - 1


def test_quantile_gate_keeps_single_row_groups(spark):
    """A group's only row is trivially its own top half — the cume_dist
    gate keeps it (a percent_rank>=q gate would silently drop it)."""
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    df = spark.createDataFrame(
        [(1, "solo", 10), (2, "pair", 1), (3, "pair", 2)],
        "doc_id long, lang string, n_chars long",
    )
    kept = SAMP.quantile_gate_per_group(
        df, ["lang"], "n_chars", 0.5, tie_cols=["doc_id"]
    ).collect()
    got = {(r["lang"], r["doc_id"]) for r in kept}
    assert got == {("solo", 1), ("pair", 3)}


def test_vocab_topk_counts(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    rows = [
        (1, "a", "b b c"), (2, "a", "b c c c"),
        (3, "x", "z z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = SAMP.vocab_topk(df, "text", "lang", k=2).collect()
    got = {(r["lang"], r["rank"]): (r["token"], r["n"]) for r in out}
    assert got[("a", 1)] == ("c", 4) and got[("a", 2)] == ("b", 3)
    assert got[("x", 1)] == ("z", 2) and ("x", 2) not in got


def test_pack_sequences_layout(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    rows = [(1, "a", 100), (2, "a", 50), (3, "a", 80), (4, "b", 300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    out = {r["doc_id"]: r.asDict() for r in SAMP.pack_sequences(
        df, ["lang"], "doc_id", "toks", budget=128).collect()}
    # group a: doc1 [0..100) window 0; doc2 starts at 100, crosses into
    # window 1 (100+50=150 > 128 → spans 2); doc3 starts at 150 → window 1
    assert (out[1]["pack_window"], out[1]["pack_offset"], out[1]["pack_spans"]) == (0, 0, 1)
    assert (out[2]["pack_window"], out[2]["pack_offset"], out[2]["pack_spans"]) == (0, 100, 2)
    assert (out[3]["pack_window"], out[3]["pack_offset"], out[3]["pack_spans"]) == (1, 22, 1)
    # group b independent; 300 tokens spans ceil(300/128)=3 windows
    assert (out[4]["pack_window"], out[4]["pack_offset"], out[4]["pack_spans"]) == (0, 0, 3)


def test_pack_sequences_differential_vs_sequential(spark):
    """Differential: the window-function packing must equal a sequential
    concat-and-chunk reference over any weights (Hypothesis-style sweep
    with fixed seeds — one Spark job total, many generated cases would
    pay per-example job latency)."""
    import random as _random
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    rng = _random.Random(11)
    rows = []
    for g in ("a", "b", "c"):
        for i in range(40):
            rows.append((len(rows), g, rng.choice([0, 1, 7, 100, 128, 129, 4096])))
    df = spark.createDataFrame(rows, "doc_id long, lang string, toks long")
    budget = 128
    got = {
        r["doc_id"]: (r["pack_window"], r["pack_offset"], r["pack_spans"])
        for r in SAMP.pack_sequences(df, ["lang"], "doc_id", "toks", budget).collect()
    }
    # sequential reference: running offset per group in doc_id order
    by_group: dict = {}
    for doc_id, g, toks in rows:
        before = by_group.get(g, 0)
        start_w, off = divmod(before, budget)
        end_w = (before + max(toks, 1) - 1) // budget
        assert got[doc_id] == (start_w, off, end_w - start_w + 1), (doc_id, toks)
        by_group[g] = before + toks


def test_band_bucket_cap_prunes_flood(spark):
    """A cluster of identical docs collides in every band/chunk — without a
    bucket cap the self-join is quadratic in the flood size. With the cap,
    the flood bucket is pruned while ordinary near-dups still pair up."""
    rng = random.Random(3)
    rows = [(i, _doc(rng)) for i in range(20)]
    flood_text = _doc(rng)
    rows += [(1000 + i, flood_text) for i in range(50)]       # 50 exact copies
    base = _doc(rng)
    toks = base.split(); toks[3] = "OMEGA"
    rows += [(2000, base), (2001, " ".join(toks))]            # one true near-dup
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = DD.minhash_signatures(df, "doc_id", "text", num_hashes=32)
    uncapped = DD.minhash_lsh_pairs(sigs, num_hashes=32, num_bands=8, threshold=0.5)
    capped = DD.minhash_lsh_pairs(
        sigs, num_hashes=32, num_bands=8, threshold=0.5, max_band_bucket=10
    )
    flood_pairs = lambda pdf: [  # noqa: E731
        r for r in pdf if r["id_a"] >= 1000 and r["id_b"] < 2000
    ]
    un = uncapped.collect()
    cp = capped.collect()
    assert len(flood_pairs(un)) == 50 * 49 // 2               # quadratic blowup
    assert not flood_pairs(cp)                                # pruned
    assert any(r["id_a"] == 2000 and r["id_b"] == 2001 for r in cp)  # kept

    sh = DD.simhash(df, "doc_id", "text")
    capped_sh = DD.simhash_near_dups(sh, max_hamming=3, max_chunk_bucket=10)
    cps = capped_sh.collect()
    assert not [r for r in cps if r["id_a"] >= 1000 and r["id_b"] < 2000]


def test_mixture_sample_exact_budget_semantics(spark):
    import hashlib

    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    rows = [(i, "a" if i < 10 else "b", 100) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = SAMP.mixture_sample(
        df, "doc_id", "source", "n_chars", {"a": 350}
    ).collect()
    # source b unbudgeted -> dropped entirely
    assert all(r["source"] == "a" for r in got)
    # 100-char docs vs 350 budget: docs starting at 0/100/200/300 kept -> 4
    assert len(got) == 4
    # the kept set is the 4 smallest md5-60 hashes, replay in Python
    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    expected = sorted(range(10), key=lambda i: (h(i), i))[:4]
    assert sorted(r["doc_id"] for r in got) == sorted(expected)
    # prefix sums include the row itself
    assert sorted(r["cum_tokens"] for r in got) == [100, 200, 300, 400]


def test_mixture_rate_full_budget_keeps_all(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    rows = [(i, "a", 50) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    kept = SAMP.mixture_sample_rate(
        df, "doc_id", "source", "n_chars", {"a": 10_000}
    )
    assert kept.count() == 30  # budget >= total -> rate clamps to 1.0
    none = SAMP.mixture_sample_rate(
        df, "doc_id", "source", "n_chars", {"other": 10_000}
    )
    assert none.count() == 0  # unbudgeted source -> rate 0


def test_chunk_documents_sliding_windows(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    toks10 = " ".join(f"t{i}" for i in range(1, 11))
    df = spark.createDataFrame(
        [(1, toks10), (2, "a b"), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    got = SAMP.chunk_documents(df, "doc_id", "text",
                               chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["id"], []).append(
            (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        )
    # 10 tokens, window 4, stride 3 -> starts 1,4,7; full coverage, overlap 1
    assert sorted(by_doc[1]) == [
        (0, 4, "t1 t2 t3 t4"),
        (1, 4, "t4 t5 t6 t7"),
        (2, 4, "t7 t8 t9 t10"),
    ]
    # short doc -> one (shorter) chunk; empty/whitespace -> one empty chunk
    assert by_doc[2] == [(0, 2, "a b")]
    assert by_doc[3] == [(0, 0, "")]
    assert by_doc[4] == [(0, 0, "")]


def test_semantic_dedup_planted_copies(spark):
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    import random
    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    # planted: 100 is an exact copy of 0; 101 a near-copy (tiny nudge)
    rows.append((100, list(rows[0][1])))
    rows.append((101, [x + 0.001 for x in rows[0][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = IVF.seeded_centroids(8, 16, 42)

    pairs = IVF.semantic_dedup_pairs(
        df, "vec_id", "embedding", cents, threshold=0.99
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in pairs}
    assert got[(0, 100)] == 1.0
    assert (0, 101) in got and got[(0, 101)] >= 0.99
    assert (100, 101) in got
    # unrelated gaussians never hit 0.99
    assert all(a in (0, 100, 101) and b in (0, 100, 101) for a, b in got)

    keep = IVF.semantic_dedup(
        df, "vec_id", "embedding", cents, threshold=0.99
    ).collect()
    by_id = {r["id"]: (r["component"], r["is_canonical"]) for r in keep}
    # the {0,100,101} group: one component, min id canonical
    assert set(by_id) == {0, 100, 101}
    assert by_id[0] == (0, True)
    assert by_id[100] == (0, False) and by_id[101] == (0, False)


def test_substring_dup_stats_planted(spark):
    docs = [
        (1, "a b c d e f g h"),          # shares "a b c d e" with doc 2
        (2, "x y a b c d e z"),
        (3, "a b"),                       # shorter than k
        (4, "p q r s t p q r s t"),       # within-doc repeat only → NOT dup
        (5, "totally different words here nine ten eleven twelve"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["id"]: (r["n_tokens"], r["n_dup_grams"], r["covered_tokens"], r["dup_bp"])
        for r in DD.substring_dup_stats(df, "doc_id", "text", k=5).collect()
    }
    assert len(out) == 5                          # every doc present
    assert out[1] == (8, 1, 5, 6250)              # tokens 0-4 covered
    assert out[2] == (8, 1, 5, 6250)              # tokens 2-6 covered
    assert out[3] == (2, 0, 0, 0)
    assert out[4] == (10, 0, 0, 0)                # cross-doc only
    assert out[5] == (8, 0, 0, 0)


def test_substring_dup_overlapping_grams_merge_coverage(spark):
    # two docs share a 6-token run at k=5: 2 overlapping grams, coverage
    # is the union (6 tokens), not 2×5
    docs = [
        (1, "s1 s2 s3 s4 s5 s6 tail1 tail2"),
        (2, "pre s1 s2 s3 s4 s5 s6"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["id"]: (r["n_dup_grams"], r["covered_tokens"])
        for r in DD.substring_dup_stats(df, "doc_id", "text", k=5).collect()
    }
    assert out[1] == (2, 6) and out[2] == (2, 6)


def test_substring_dup_flood_guard(spark):
    # a gram in >max_gram_df docs is boilerplate — skipped entirely
    docs = [(i, "same old cookie banner line") for i in range(1, 5)]
    docs.append((9, "uniq1 uniq2 uniq3 uniq4 uniq5"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = DD.substring_dup_stats(df, "doc_id", "text", k=5, max_gram_df=3)
    assert all(r["n_dup_grams"] == 0 for r in capped.collect())
    uncapped = DD.substring_dup_stats(df, "doc_id", "text", k=5)
    got = {r["id"]: r["n_dup_grams"] for r in uncapped.collect()}
    assert all(got[i] == 1 for i in range(1, 5)) and got[9] == 0


def test_split_assign_deterministic_and_stable(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    weights = [("train", 8), ("val", 1), ("test", 1)]
    full = spark.range(2000).withColumnRenamed("id", "doc_id")
    assign = {
        r["doc_id"]: r["split"]
        for r in SAMP.split_assign(full, "doc_id", weights).collect()
    }
    # proportions near 80/10/10 (hash-uniform; 3σ ≈ 2.7% at n=2000)
    from collections import Counter

    c = Counter(assign.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.04
    assert abs(c["val"] / 2000 - 0.1) < 0.03
    assert abs(c["test"] / 2000 - 0.1) < 0.03
    # growth-stable: the first 500 ids keep their split when the corpus
    # is only those 500 (randomSplit cannot promise this)
    sub = spark.range(500).withColumnRenamed("id", "doc_id")
    sub_assign = {
        r["doc_id"]: r["split"]
        for r in SAMP.split_assign(sub, "doc_id", weights).collect()
    }
    assert all(assign[i] == sub_assign[i] for i in range(500))
    # a different seed rotates assignments
    rot = {
        r["doc_id"]: r["split"]
        for r in SAMP.split_assign(full, "doc_id", weights, seed="v2").collect()
    }
    assert rot != assign
    # pure JVM projection: no exchange, no Python
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        SAMP.split_assign(full, "doc_id", weights).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_semantic_dedup_trained_quantizer_end_to_end(spark):
    """SemDeDup over kmeans_train centroids on the embeddings fixture
    (not just seeded ones): (a) trained cells are balanced where the
    data-independent seeded quantizer collapses (measured 0.12 vs 0.62
    max-cell share on this fixture) — balance is what caps the per-cell
    m² at scale; (b) planted near-copies are recovered with recall 1.0
    at the dedup threshold — true near-dups sit so close they share a
    cell (the SemDeDup paper runs ~10^4-10^5 clusters at corpus scale on
    the same argument); (c) every emitted pair re-verifies against exact
    NumPy cosine (precision 1.0); (d) the keep-set marks min-id
    canonicals per component."""
    import numpy as np
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    rng = np.random.default_rng(11)
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = e.collect()
    planted = [
        (
            10_000 + r["vec_id"],
            [x + float(d) for x, d in zip(r["embedding"], rng.normal(0, 1e-3, 64))],
        )
        for r in base[:25]
    ]
    df = e.union(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>")
    )

    trained = IVF.kmeans_train(df, "embedding", n_cells=10, sample_rows=600, iters=10)
    seeded = IVF.seeded_centroids(10, 64)

    def cell_stats(cents):
        sizes = [
            r["n"]
            for r in IVF.assign_cells(df, "vec_id", "embedding", cents)
            .groupBy("cell")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        share = max(sizes) / sum(sizes)
        cost = sum(m * (m - 1) // 2 for m in sizes)
        return share, cost

    t_share, t_cost = cell_stats(trained)
    s_share, s_cost = cell_stats(seeded)
    assert t_share <= 0.25, t_share          # balanced cells
    assert t_share < s_share                  # beats the seeded quantizer
    assert t_cost * 2 <= s_cost, (t_cost, s_cost)  # ≥2× cheaper per round

    pairs = IVF.semantic_dedup_pairs(
        df, "vec_id", "embedding", trained, threshold=0.99
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in pairs}
    for r in base[:25]:  # recall 1.0 on planted near-copies
        assert (r["vec_id"], 10_000 + r["vec_id"]) in got, r["vec_id"]

    # precision 1.0: re-verify every emitted pair with exact NumPy cosine
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    for (a, b), sim in got.items():
        va, vb = vecs[a], vecs[b]
        true = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert true >= 0.99 and abs(round(true, 4) - sim) < 1e-9, (a, b)

    keep = {
        r["id"]: (r["component"], r["is_canonical"])
        for r in IVF.semantic_dedup(
            df, "vec_id", "embedding", trained, threshold=0.99
        ).collect()
    }
    for r in base[:25]:
        i = r["vec_id"]
        assert keep[i] == (i, True)           # original is canonical
        assert keep[10_000 + i] == (i, False)  # copy joins its component


def test_semantic_dedup_max_cell_prunes_floods(spark):
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    # 50 identical vectors -> one flood cell; cap skips it entirely
    rows = [(i, [1.0] * 8) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = IVF.seeded_centroids(4, 8, 42)
    capped = IVF.semantic_dedup_pairs(
        df, "vec_id", "embedding", cents, threshold=0.5, max_cell=10
    )
    assert capped.count() == 0


def test_tfidf_topk_planted(spark):
    from unified_ocr_pipeline_spark.operators import curation as CUR
    import math

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry date"),
        (3, "apple date elderberry elderberry elderberry"),
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = CUR.tfidf_topk(df, "doc_id", "text", k=2, max_df_frac=0.9).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append((r["rnk"], r["token"], r["tf"], r["df"]))
    # empty/whitespace docs emit nothing
    assert set(by_doc) == {1, 2, 3}
    # doc 3: elderberry tf=3 df=1 dominates; apple/date tie at tf=1 df=2
    # -> token asc picks apple
    assert sorted(by_doc[3]) == [(1, "elderberry", 3, 1), (2, "apple", 1, 2)]
    # doc 1: apple tf=2 df=2 beats banana/cherry tf=1 df=2 (banana by tiebreak)
    assert sorted(by_doc[1]) == [(1, "apple", 2, 2), (2, "banana", 1, 2)]
    # score check: N=3 docs with tokens
    r = [x for x in out if x["id"] == 3 and x["token"] == "elderberry"][0]
    assert abs(r["tfidf"] - 3 * math.log(4.0 / 2.0)) < 1e-12


def test_tfidf_topk_max_df_prune(spark):
    from unified_ocr_pipeline_spark.operators import curation as CUR

    # 'common' appears in all 4 docs -> pruned at max_df_frac=0.5
    docs = [(i, f"common unique{i}") for i in range(1, 5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = CUR.tfidf_topk(df, "doc_id", "text", k=5, max_df_frac=0.5).collect()
    assert {r["token"] for r in out} == {f"unique{i}" for i in range(1, 5)}
    assert all(r["rnk"] == 1 for r in out)


def test_bloom_anti_join_equals_exact_anti_join(spark):
    # overlapping key sets incl. a null key on both sides
    corpus = spark.createDataFrame(
        [(i, f"key{i}") for i in range(0, 60)] + [(99, None)],
        "cid long, k string",
    )
    new = spark.createDataFrame(
        [(i, f"key{i}") for i in range(50, 80)] + [(199, None)],
        "nid long, k string",
    )
    got = {
        r["nid"] for r in DD.bloom_anti_join(new, corpus, "k", num_bits=1 << 12).collect()
    }
    want = {r["nid"] for r in new.join(corpus.select("k"), "k", "left_anti").collect()}
    assert got == want
    assert got == set(range(60, 80)) | {199}  # null-key row survives


def test_bloom_bitmap_no_false_negatives_and_prefilters(spark):
    import numpy as np

    corpus = spark.createDataFrame(
        [(f"stored-{i}",) for i in range(500)], "k string"
    )
    bm = DD.build_bloom_bitmap(corpus, "k", num_bits=1 << 16, num_hashes=5)

    def probe(keys):
        import pandas as pd
        h = spark.createDataFrame([(k,) for k in keys], "k string").select(
            F.xxhash64("k").alias("h1"),
            F.xxhash64("k", F.lit(DD._BLOOM_SEED)).alias("h2"),
        ).toPandas()
        m = np.uint64(1 << 16)
        h1 = h["h1"].to_numpy(np.int64).view(np.uint64)
        h2 = h["h2"].to_numpy(np.int64).view(np.uint64)
        res = np.ones(len(h1), bool)
        for i in range(5):
            pos = (h1 + np.uint64(i) * h2) & (m - np.uint64(1))
            res &= ((bm[(pos >> np.uint64(3)).astype(np.int64)]
                     >> (pos & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
        return res

    # no false negatives: every stored key must test positive
    assert probe([f"stored-{i}" for i in range(500)]).all()
    # prefiltering works: disjoint keys overwhelmingly test negative
    # (500 keys * 5 hashes in 65536 bits -> fpp ~ (1-e^-0.038)^5 ~ 1e-7)
    fp = probe([f"fresh-{i}" for i in range(1000)]).sum()
    assert fp == 0


def test_bloom_anti_join_empty_corpus(spark):
    corpus = spark.createDataFrame([], "k string")
    new = spark.createDataFrame([("a",), ("b",)], "k string")
    got = {r["k"] for r in DD.bloom_anti_join(new, corpus, "k").collect()}
    assert got == {"a", "b"}


def test_cms_never_undercounts_and_width1_sums_all(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1 + [(None,)]
    df = spark.createDataFrame(rows, "k string")
    # width=1: every key shares the one cell -> est = total non-null occurrences
    sk1 = SAMP.count_min_sketch(df, "k", width=1, depth=3)
    est1 = {r["key"]: r["est"] for r in SAMP.cms_estimate(sk1, df, "k", 1, 3).collect()}
    assert est1 == {"a": 111, "b": 111, "c": 111}
    # wide sketch: exact; never undercounts regardless
    sk = SAMP.count_min_sketch(df, "k", width=256, depth=5)
    est = {r["key"]: r["est"] for r in SAMP.cms_estimate(sk, df, "k", 256, 5).collect()}
    assert est == {"a": 100, "b": 10, "c": 1}
    # sketch size is bounded by depth*width, not rows
    assert sk.count() <= 256 * 5


def test_cms_estimate_unknown_key_zero_floor(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    corpus = spark.createDataFrame([("x",)] * 7, "k string")
    sk = SAMP.count_min_sketch(corpus, "k", width=64, depth=4)
    probe = spark.createDataFrame([("x",), ("never-seen",)], "k string")
    est = {r["key"]: r["est"] for r in SAMP.cms_estimate(sk, probe, "k", 64, 4).collect()}
    assert est["x"] == 7
    # an absent key hits empty cells -> 0 (cannot be negative/undercount)
    assert est["never-seen"] == 0


def test_quantize_embeddings_bounds_and_roundtrip(spark):
    from unified_ocr_pipeline_spark.operators import similarity as SIM

    rows = [
        (1, [1.0, -2.0, 0.5, 127.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),          # zero vector
        (3, [-0.003, 0.001, 0.002, -0.001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in SIM.quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert out[1]["qvec"][3] == 127 and out[1]["qvec"][1] == -2
    assert out[2]["qvec"] == [0, 0, 0, 0] and out[2]["scale"] == 0.0
    assert all(-127 <= q <= 127 for r in out.values() for q in r["qvec"])
    # dequantization error bounded by scale/2 (+ float widening slack)
    stats = {
        r["id"]: r
        for r in SIM.quantization_stats(df, "vec_id", "embedding").collect()
    }
    for i in (1, 3):
        assert stats[i]["max_err"] <= stats[i]["scale"] / 2 + 1e-12
    assert stats[2]["max_err"] == 0.0
    assert stats[1]["dim"] == 4


def test_bm25_topk_ranking_and_limit(spark):
    from unified_ocr_pipeline_spark.operators import curation as CUR

    docs = [
        (1, "rare common common filler filler filler"),
        (2, "common filler"),                       # shorter doc, 1 hit
        (3, "rare rare common"),                    # most rare-term mass
        (4, "filler filler filler filler"),         # no hits -> absent
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = CUR.bm25_topk(df, "doc_id", "text", ["rare", "common"], k=3).collect()
    ids = [r["id"] for r in out]
    assert len(ids) == 3 and 4 not in ids and 5 not in ids
    # doc 3 must rank first: two 'rare' occurrences in the shortest
    # hit-bearing doc, and 'rare' (df=2) out-idfs 'common' (df=3)
    assert ids[0] == 3
    by_id = {r["id"]: r for r in out}
    assert by_id[3]["n_terms_hit"] == 2 and by_id[2]["n_terms_hit"] == 1
    assert all(r["score"] > 0 for r in out)


def test_bm25_topk_take_ordered_plan(spark):
    """Global top-k must compile to TakeOrderedAndProject (per-partition
    heaps), not a full Sort + CollectLimit."""
    import io
    from contextlib import redirect_stdout

    from unified_ocr_pipeline_spark.operators import curation as CUR

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    q = CUR.bm25_topk(d, "doc_id", "text", ["dup", "sort"], k=10)
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_outlink_edges_and_domain_stats(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    pages = spark.createDataFrame(
        [
            ("u1", '<p>x</p><a href="http://a.com/1">1</a>'
                   '<a href="https://b.org/2">2</a>'
                   '<a href="/rel">r</a><a href="#frag">f</a>'
                   '<a href="mailto:x@y">m</a>'),
            ("u2", '<a href="http://a.com/3">3</a><a href="http://a.com/4">4</a>'),
            ("u3", None),
            ("u4", "<p>no links at all</p>"),
        ],
        "url string, html string",
    )
    edges = LG.outlink_edges(pages, "url", "html").collect()
    got = {(r["src_url"], r["href"], r["link_pos"]) for r in edges}
    assert got == {
        ("u1", "http://a.com/1", 0),
        ("u1", "https://b.org/2", 1),
        ("u2", "http://a.com/3", 0),
        ("u2", "http://a.com/4", 1),
    }
    stats = {
        r["dst_host"]: (r["n_links"], r["n_src_urls"])
        for r in LG.domain_link_stats(
            LG.outlink_edges(pages, "url", "html")
        ).collect()
    }
    assert stats == {"a.com": (3, 2), "b.org": (1, 1)}


def test_outlink_edges_binary_html_and_unclosed_anchor(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    pages = spark.createDataFrame(
        [("u1", '<a href="http://c.net/p">unclosed<p>next block'.encode())],
        "url string, html binary",
    )
    edges = LG.outlink_edges(pages, "url", "html").collect()
    assert [(r["src_url"], r["href"]) for r in edges] == [("u1", "http://c.net/p")]


def test_pagerank_hand_computed(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    # a -> b, a -> c, b -> a; c dangling (its mass drops)
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "s string, d string"
    )
    got = {r["node"]: r["rank"] for r in LG.pagerank(e, "s", "d", iterations=2).collect()}
    n, d = 3, 0.85
    t = (1.0 - d) / n
    r = {x: 1.0 / n for x in "abc"}
    for _ in range(2):
        r = {
            "a": t + d * (r["b"] / 1),
            "b": t + d * (r["a"] / 2),
            "c": t + d * (r["a"] / 2),
        }
    for x in "abc":
        assert abs(got[x] - r[x]) < 1e-12, (x, got[x], r[x])


def test_pagerank_empty_edges(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    e = spark.createDataFrame([], "s string, d string")
    assert LG.pagerank(e, "s", "d").count() == 0


def test_justext_context_propagation_rules(spark):
    from unified_ocr_pipeline_spark.operators.justext import justext_classify

    mk = lambda i, n, dens, boil=False: (  # noqa: E731
        1, i, "t", n, dens, boil
    )
    # doc layout: good, short, good, near_good, bad, short, bad
    rows = [
        mk(0, 100, 0.0),   # good
        mk(1, 5, 0.0),     # short between goods -> good
        mk(2, 100, 0.0),   # good
        mk(3, 30, 0.0),    # near_good with good prev -> good
        mk(4, 100, 0.9),   # bad
        mk(5, 5, 0.0),     # short between bad and bad -> bad
        mk(6, 100, 0.9),   # bad
    ]
    df = spark.createDataFrame(
        rows,
        "id long, block_idx int, text string, n_chars int,"
        " link_density double, in_boiler boolean",
    )
    got = {
        r["block_idx"]: (r["class_cf"], r["class_final"])
        for r in justext_classify(df).collect()
    }
    assert got[0] == ("good", "good")
    assert got[1] == ("short", "good")
    assert got[2] == ("good", "good")
    assert got[3] == ("near_good", "good")
    assert got[4] == ("bad", "bad")
    assert got[5] == ("short", "bad")
    assert got[6] == ("bad", "bad")


def test_justext_edges_and_boiler(spark):
    from unified_ocr_pipeline_spark.operators.justext import justext_classify

    rows = [
        (1, 0, "t", 5, 0.0, False),    # short at page start (no prev) -> bad
        (1, 1, "t", 100, 0.0, False),  # good
        (1, 2, "t", 30, 0.0, False),   # near_good with good prev -> good
        (2, 0, "t", 100, 0.0, True),   # boiler container -> bad even if long
        (2, 1, "t", 30, 0.0, False),   # near_good, only bad context -> bad
    ]
    df = spark.createDataFrame(
        rows,
        "id long, block_idx int, text string, n_chars int,"
        " link_density double, in_boiler boolean",
    )
    got = {
        (r["id"], r["block_idx"]): r["class_final"]
        for r in justext_classify(df).collect()
    }
    assert got[(1, 0)] == "bad"
    assert got[(1, 2)] == "good"
    assert got[(2, 0)] == "bad"
    assert got[(2, 1)] == "bad"


def test_page_blocks_real_parse(spark):
    from unified_ocr_pipeline_spark.operators.justext import page_blocks

    html = (
        "<html><body><nav><p>menu menu</p></nav>"
        '<p>real content paragraph</p><p><a href="http://x/">link</a></p>'
        "</body></html>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    rows = sorted(
        page_blocks(df, "doc_id", "html").collect(), key=lambda r: r["block_idx"]
    )
    assert [r["text"] for r in rows] == ["menu menu", "real content paragraph", "link"]
    assert rows[0]["in_boiler"] is True
    assert rows[1]["link_density"] == 0.0
    assert rows[2]["link_density"] == 1.0
    assert rows[1]["n_chars"] == len("real content paragraph")


def test_kmv_exact_below_k_and_estimate_above(spark):
    from unified_ocr_pipeline_spark.operators.sampling import (
        kmv_distinct_estimate,
        kmv_sketch,
    )
    import pyspark.sql.functions as F

    small = spark.range(10).select(F.col("id").cast("string").alias("k"))
    r = kmv_distinct_estimate(kmv_sketch(small, "k", k=64), k=64).collect()[0]
    assert r["n_kept"] == 10 and r["est_distinct"] == 10.0  # saw everything
    big = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    r2 = kmv_distinct_estimate(kmv_sketch(big, "k", k=64), k=64).collect()[0]
    assert r2["n_kept"] == 64
    assert 600 < r2["est_distinct"] < 1700  # ~1/sqrt(63) rel. error regime


def test_kmv_jaccard_estimates_overlap(spark):
    from unified_ocr_pipeline_spark.operators.sampling import kmv_jaccard
    import pyspark.sql.functions as F

    a = spark.range(300).select(F.col("id").cast("string").alias("k"))
    b = spark.range(150, 450).select(F.col("id").cast("string").alias("k"))
    r = kmv_jaccard(a, b, "k", k=128).collect()[0]
    # true J = 150/450 = 0.333; duplicates must not shift the sketch
    assert 0.15 < r["est_jaccard"] < 0.55
    r_dup = kmv_jaccard(a.union(a), b, "k", k=128).collect()[0]
    assert r_dup["est_jaccard"] == r["est_jaccard"]


def test_mirror_hosts_hand_case(spark):
    from unified_ocr_pipeline_spark.operators.dedup import mirror_hosts

    df = spark.createDataFrame(
        [
            ("http://a.com/1", "same body"),
            ("http://b.com/2", "same body"),
            ("http://a.com/3", "same body"),   # extra url, same host
            ("http://c.com/4", "unique text"),
        ],
        "url string, text string",
    )
    rows = mirror_hosts(df, "url", "text").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_hosts"] == 2 and r["n_urls"] == 3
    assert r["hosts"] == ["a.com", "b.com"]


def test_url_template_placeholders(spark):
    import pyspark.sql.functions as F

    from unified_ocr_pipeline_spark.functions.url import url_template

    df = spark.createDataFrame(
        [
            ("http://x.com/item/8731/page",),
            ("http://x.com/rev/deadbeef1234",),
            ("http://x.com/id/12345678",),  # 8+ digits are hex too -> {h}
            ("http://x.com/v2/short/ab12",),  # short runs survive
        ],
        "u string",
    )
    got = [r["t"] for r in df.select(url_template(F.col("u")).alias("t")).collect()]
    assert got == [
        "http://x.com/item/{d}/page",
        "http://x.com/rev/{h}",
        "http://x.com/id/{h}",
        "http://x.com/v{d}/short/ab{d}",
    ]


def test_cluster_subsample_policy(spark):
    from unified_ocr_pipeline_spark.operators.cc import cluster_subsample

    clustered = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False), (4, 4, True)],
        "doc_id long, component long, is_canonical boolean",
    )
    none_kept = cluster_subsample(clustered, "doc_id", rate=0.0).collect()
    assert {r["doc_id"] for r in none_kept} == {1, 4}  # canonicals only
    assert all(r["kept_as"] == "canonical" for r in none_kept)
    all_kept = cluster_subsample(clustered, "doc_id", rate=1.0).collect()
    assert {r["doc_id"] for r in all_kept} == {1, 2, 3, 4}
    labels = {r["doc_id"]: r["kept_as"] for r in all_kept}
    assert labels[2] == "sampled" and labels[1] == "canonical"
    # determinism: same seed -> same survivors
    a = {r["doc_id"] for r in cluster_subsample(clustered, "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in cluster_subsample(clustered, "doc_id", 0.5).collect()}
    assert a == b


def test_zorder_key_hand_bits(spark):
    import pyspark.sql.functions as F

    from unified_ocr_pipeline_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(3, 1), (0, 0), (7, 7), (5, 2)], "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            zorder_key(F.col("a"), F.col("b"), bits=3).alias("z")
        ).collect()
    ]
    # interleave: a bits at even positions, b bits at odd
    def morton(a, b):
        z = 0
        for i in range(3):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(3, 1), 0, morton(7, 7), morton(5, 2)]
    assert morton(3, 1) == 0b000111  # sanity of the hand model itself


def test_zorder_layout_clusters_both_dimensions(spark):
    import pyspark.sql.functions as F

    from unified_ocr_pipeline_spark.operators.layout import zorder_layout

    # 64x64 grid; z-layout partitions must be narrow in BOTH dims,
    # while an x-sorted layout leaves y spanning the whole domain.
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    z = zorder_layout(pts, "x", "y", bits=6, num_partitions=16)
    spans = (
        z.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    mean_ys = sum(r["ys"] for r in spans) / len(spans)
    xsort_spans = (
        pts.repartitionByRange(16, "x")
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg((F.max("y") - F.min("y")).alias("ys"))
        .collect()
    )
    mean_ys_xsort = sum(r["ys"] for r in xsort_spans) / len(xsort_spans)
    # x-sorted partitions span ~the full y domain (63); z-order keeps a
    # fraction of it on BOTH axes
    assert mean_ys_xsort > 60
    assert mean_ys < mean_ys_xsort / 2
    mean_xs = sum(r["xs"] for r in spans) / len(spans)
    assert mean_xs < 40


def test_column_stats_values_and_single_scan(spark):
    from unified_ocr_pipeline_spark.operators.stats import column_stats

    df = spark.createDataFrame(
        [(9, "b", 2.5), (10, None, 0.125), (9, "a", None)],
        "k long, s string, v double",
    )
    out = column_stats(df, ["k", "s", "v"])
    got = {r["column"]: r for r in out.collect()}
    assert got["k"]["n_rows"] == 3 and got["k"]["n_nulls"] == 0
    assert got["k"]["n_distinct"] == 2
    # native-type min/max: 9 < 10 numerically even though "9" > "10"
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("9", "10")
    assert got["s"]["n_nulls"] == 1
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
    assert got["v"]["min_value"] == "0.125000"
    assert got["v"]["max_value"] == "2.500000"
    # exact multi-distinct plans as TWO branches (distinct rewrite +
    # plain aggs) — constant in column count, never one scan per column
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 2
    # the approx path (HLL sketch = regular aggregate) is a SINGLE scan
    approx_plan = (
        column_stats(df, ["k", "s", "v"], approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert (
        approx_plan.count("Scan ExistingRDD")
        + approx_plan.count("LocalTableScan")
        == 1
    )


def test_lsh_pr_perfect_on_exact_dup(spark):
    from unified_ocr_pipeline_spark.operators.evaluate import lsh_pr

    dup = "the same long sentence repeated verbatim across two documents"
    df = spark.createDataFrame(
        [(1, dup), (2, dup), (3, "completely unrelated other text body")],
        "doc_id long, text string",
    )
    r = lsh_pr(df, "doc_id", "text").collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
    assert r["prec"] == 1.0 and r["rec"] == 1.0 and r["f1"] == 1.0


def test_lsh_pr_single_band_misses_partial_overlap(spark):
    from unified_ocr_pipeline_spark.operators.evaluate import lsh_pr

    # exact J ~ 0.7 but one 32-row band demands full signature equality
    # -> LSH miss -> false negative, zero-denominator guards exercised
    words = [f"w{i}" for i in range(12)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(words[:-1] + ["CHANGED"]))],
        "doc_id long, text string",
    )
    r = lsh_pr(df, "doc_id", "text", num_bands=1).collect()[0]
    assert r["n_truth"] == 1 and r["fn"] == 1 and r["tp"] == 0
    assert r["rec"] == 0.0 and r["prec"] == 0.0 and r["f1"] == 0.0


def test_minhash_estimate_error_exact_side(spark):
    from unified_ocr_pipeline_spark.operators.evaluate import minhash_estimate_error

    words = [f"w{i}" for i in range(12)]
    a = " ".join(words)
    b = " ".join(words[:-1] + ["CHANGED"])  # last shingles differ
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, "totally different text entirely here now")],
        "doc_id long, text string",
    )
    rows = minhash_estimate_error(df, "doc_id", "text", threshold=0.3).collect()
    got = {(r["id_a"], r["id_b"]): r for r in rows}
    assert (1, 2) in got and len(got) == 1
    sh = lambda t: {  # noqa: E731
        " ".join(t.split()[i : i + 3]) for i in range(len(t.split()) - 2)
    }
    inter, union = len(sh(a) & sh(b)), len(sh(a) | sh(b))
    r = got[(1, 2)]
    assert r["exact_jaccard"] == inter / union
    assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1e-15
    # the estimator should land in the right neighborhood of truth
    assert abs(r["est_jaccard"] - r["exact_jaccard"]) < 0.35


def test_pmi_bigrams_hand_computed(spark):
    import math

    from unified_ocr_pipeline_spark.operators.curation import pmi_bigrams

    # corpus: "a b" x3, "a c" x1  -> bigrams: (a,b):3 (a,c):1
    # unigrams: a:4 b:3 c:1, N=8 tokens, M=4 bigrams
    df = spark.createDataFrame(
        [("a b",), ("a b",), ("a b",), ("a c",)], "text string"
    )
    rows = pmi_bigrams(df, "text", min_count=1, k=10).collect()
    got = {(r["w1"], r["w2"]): r["pmi"] for r in rows}
    n, m = 8.0, 4.0
    exp_ab = math.log((3 * n * n) / (m * 4 * 3))
    exp_ac = math.log((1 * n * n) / (m * 4 * 1))
    assert abs(got[("a", "b")] - exp_ab) < 1e-12
    assert abs(got[("a", "c")] - exp_ac) < 1e-12
    # both ratios are exactly 4.0 here (3*64/48 = 64/16) -> the
    # (w1, w2)-ascending tie-break decides the order
    assert exp_ab == exp_ac
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b"), ("a", "c")]


def test_pmi_bigrams_min_count_drops_rare(spark):
    from unified_ocr_pipeline_spark.operators.curation import pmi_bigrams

    df = spark.createDataFrame(
        [("a b",), ("a b",), ("x y",)], "text string"
    )
    rows = pmi_bigrams(df, "text", min_count=2, k=10).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]


def test_script_profile_counts_dominance_ties(spark):
    from unified_ocr_pipeline_spark.functions.text import script_profile
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (0, "hello мир"),          # 5 latin, 3 cyrillic -> latin
            (1, "ab жд"),              # 2 vs 2 tie -> cyrillic (name asc)
            (2, "漢漢漢 x"),            # cjk dominates
            (3, "123 !?"),             # no script chars -> unknown
            (4, "αβγ"),                # greek only
        ],
        "i long, t string",
    )
    rows = {r["i"]: r for r in df.select("i", *script_profile(F.col("t"))).collect()}
    assert rows[0]["latin_n"] == 5 and rows[0]["cyrillic_n"] == 3
    assert rows[0]["dominant_script"] == "latin"
    assert rows[1]["dominant_script"] == "cyrillic"  # tie, name asc wins
    assert rows[2]["dominant_script"] == "cjk" and rows[2]["cjk_n"] == 3
    assert rows[3]["dominant_script"] == "unknown"
    assert rows[4]["dominant_script"] == "greek" and rows[4]["greek_n"] == 3


def test_build_postings_sharding_and_order(spark):
    from unified_ocr_pipeline_spark.operators.index import build_postings

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "a c"), (2, "b b"), (5, "a"), (7, "   ")],
        "doc_id long, text string",
    )
    rows = {
        (r["token"], r["shard"]): (r["df"], r["cf"], r["postings"])
        for r in build_postings(docs, "doc_id", "text", n_shards=2).collect()
    }
    # shard = id % 2; postings ascending by id; tf counted per doc
    assert rows[("a", 0)] == (1, 2, "0:2")
    assert rows[("a", 1)] == (2, 2, "1:1,5:1")
    assert rows[("b", 0)] == (2, 3, "0:1,2:2")
    assert rows[("c", 1)] == (1, 1, "1:1")
    assert ("b", 1) not in rows  # no doc in shard 1 contains b
    assert not any(t == "" for (t, _) in rows)  # blank doc emits nothing


def test_build_postings_max_df_prune(spark):
    from unified_ocr_pipeline_spark.operators.index import build_postings

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "a b"), (3, "a c")],
        "doc_id long, text string",
    )
    toks = {
        r["token"]
        for r in build_postings(
            docs, "doc_id", "text", max_df_frac=0.5
        ).collect()
    }
    # 'a' appears in 4/4 docs > floor(0.5*4)=2 -> pruned; b,c (df 2) kept
    assert toks == {"b", "c"}


def test_conjunctive_match_requires_all_terms(spark):
    from unified_ocr_pipeline_spark.operators.index import conjunctive_match

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "a c"), (2, "b b")], "doc_id long, text string"
    )
    got = {r["id"] for r in conjunctive_match(docs, "doc_id", "text", ["a", "b"]).collect()}
    assert got == {0}
    # duplicate query terms collapse to the distinct set
    got2 = {
        r["id"]
        for r in conjunctive_match(docs, "doc_id", "text", ["a", "a", "b"]).collect()
    }
    assert got2 == {0}


def test_trustrank_hand_computed_and_spam_island(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    # trusted seed a links into b; b links c; spam island x<->y is
    # unreachable from the seed and must end at exactly 0 trust.
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")],
        "s string, d string",
    )
    seeds = spark.createDataFrame([("a",), ("zzz-not-in-graph",)], "node string")
    got = {
        r["node"]: r["trust"]
        for r in LG.trustrank(e, seeds, "s", "d", iterations=2).collect()
    }
    d = 0.85
    # |S| = 1 (the unknown seed is ignored); t0 = {a:1}
    t = {"a": 1.0, "b": 0.0, "c": 0.0, "x": 0.0, "y": 0.0}
    for _ in range(2):
        t = {
            "a": d * 0.0 + (1 - d) * 1.0,
            "b": d * t["a"] + (1 - d) * 0.0,
            "c": d * t["b"] + (1 - d) * 0.0,
            "x": d * t["y"] + 0.0,
            "y": d * t["x"] + 0.0,
        }
    for k in t:
        assert abs(got[k] - t[k]) < 1e-12, (k, got[k], t[k])
    assert got["x"] == 0.0 and got["y"] == 0.0  # spam island: exact zero
    # every node reachable from the seed carries positive trust
    assert all(got[k] > 0 for k in "abc")


def test_trustrank_no_seeds_in_graph_returns_zero(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    e = spark.createDataFrame([("a", "b")], "s string, d string")
    seeds = spark.createDataFrame([("nope",)], "node string")
    got = LG.trustrank(e, seeds, "s", "d").collect()
    assert {r["node"] for r in got} == {"a", "b"}
    assert all(r["trust"] == 0.0 for r in got)


def test_hits_zero_iterations_returns_initial_state(spark):
    # iterations=0 must return (h=1, a=0) per node like
    # pagerank(iterations=0) returns its initial vector — not crash
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    e = spark.createDataFrame([("a", "b"), ("b", "c")], "s string, d string")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in LG.hits(e, "s", "d", iterations=0).collect()}
    assert got == {"a": (1.0, 0.0), "b": (1.0, 0.0), "c": (1.0, 0.0)}


def test_linear_count_distinct_accuracy_and_shape(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    # 1000 distinct keys, each duplicated 3x, plus nulls
    rows = [(f"k{i}",) for i in range(1000)] * 3 + [(None,)] * 5
    df = spark.createDataFrame(rows, "k string")
    r = SAMP.linear_count_distinct(df, "k", m=4096).collect()[0]
    assert r["m"] == 4096
    assert r["occupied"] <= 1000          # collisions only reduce slots
    # linear counting at load factor 0.24 is accurate to a few percent
    assert abs(r["estimate"] - 1000) / 1000 < 0.05
    # duplicates must not move the estimate at all (slot set identical)
    r1 = SAMP.linear_count_distinct(
        spark.createDataFrame([(f"k{i}",) for i in range(1000)], "k string"),
        "k", m=4096,
    ).collect()[0]
    assert r1["occupied"] == r["occupied"] and r1["estimate"] == r["estimate"]


def test_funnel_steps_greedy_earliest(spark):
    from unified_ocr_pipeline_spark.operators import events as EV

    rows = [
        # u1 completes the funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2 clicks BEFORE viewing -> stuck at view
        (2, 20, "click"), (2, 30, "view"),
        # u3 views only
        (3, 10, "view"),
        # u4 simultaneous view+click (strict >) -> stuck at view
        (4, 10, "view"), (4, 10, "click"),
        # u5 never views (click+purchase don't count)
        (5, 10, "click"), (5, 20, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {
        r["step_name"]: (r["step"], r["n_users"], r["conversion"])
        for r in EV.funnel_steps(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"] == (1, 4, 1.0)
    assert out["click"] == (2, 1, 0.25)
    assert out["purchase"] == (3, 1, 1.0)


def test_funnel_steps_zero_reach_step(spark):
    from unified_ocr_pipeline_spark.operators import events as EV

    df = spark.createDataFrame([(1, 10, "view")], "user_id long, ts long, event_type string")
    out = {r["step_name"]: (r["n_users"], r["conversion"]) for r in EV.funnel_steps(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    assert out == {"view": (1, 1.0), "click": (0, 0.0), "purchase": (0, 0.0)}


def test_funnel_steps_reuses_step_exchanges(spark):
    # step i's plan contains steps 1..i-1 as subtrees; AQE's runtime
    # exchange reuse is what keeps the k-step funnel from recomputing
    # earlier steps once per later step (the scale contract claimed in
    # the funnel_steps docstring). Pin it on the executed plan.
    from unified_ocr_pipeline_spark.operators import events as EV

    df = spark.createDataFrame(
        [(1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
         (2, 10, "view"), (2, 25, "click")],
        "user_id long, ts long, event_type string",
    )
    out = EV.funnel_steps(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan or (
        "reused" in plan
    ), plan


def test_salted_skew_join_equals_plain_join(spark):
    from unified_ocr_pipeline_spark.operators.skew import salted_skew_join

    # extreme skew: 1000 facts over 3 keys, one key holds 90%
    facts = [(i, "hot" if i < 900 else ("warm" if i < 990 else "cold"), float(i))
             for i in range(1000)]
    fact = spark.createDataFrame(facts, "id long, k string, v double")
    dim = spark.createDataFrame(
        [("hot", 1), ("warm", 2), ("missing", 9)], "k string, attr int"
    )
    for how in ("inner", "left"):
        got = salted_skew_join(fact, dim, ["k"], salt=8, how=how)
        want = fact.join(dim, ["k"], how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), how
    # the physical join key must include the salt (the skew-spread itself)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        salted_skew_join(fact, dim, ["k"], salt=8).explain("formatted")
    assert "_salt" in buf.getvalue()


def test_salted_skew_join_spreads_hot_key(spark):
    from unified_ocr_pipeline_spark.operators.skew import salted_skew_join
    from pyspark.sql import functions as F

    fact = spark.createDataFrame([(i, "hot") for i in range(800)], "id long, k string")
    dim = spark.createDataFrame([("hot", 1)], "k string, attr int")
    joined = salted_skew_join(fact, dim, ["k"], salt=8)
    # reconstruct the salt distribution: every salt value should carry
    # a nontrivial share (deterministic hash over 800 distinct rows)
    fsalt = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8))
    )
    shares = [r["n"] for r in fsalt.groupBy("_salt").agg(F.count("*").alias("n")).collect()]
    assert len(shares) == 8 and max(shares) < 800 * 0.3
    assert joined.count() == 800


def test_host_reciprocity_hand_graph(spark):
    from unified_ocr_pipeline_spark.operators.linkgraph import host_reciprocity
    # a<->b mutual; a->c one-way; c->c self-loop (dropped); duplicate edge
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("a", "b")],
        "src_host string, dst_host string",
    )
    rows = {r["src_host"]: r for r in host_reciprocity(edges).collect()}
    assert rows["a"]["n_out_hosts"] == 2          # b, c (dup collapsed)
    assert rows["a"]["n_reciprocal"] == 1         # only b links back
    assert rows["a"]["reciprocity"] == 0.5
    assert rows["b"]["n_reciprocal"] == 1 and rows["b"]["reciprocity"] == 1.0
    assert "c" not in rows                        # self-loop only → no outlinks


def test_host_reciprocity_empty_and_no_backlinks(spark):
    from unified_ocr_pipeline_spark.operators.linkgraph import host_reciprocity

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src_host string, dst_host string"
    )
    rows = {r["src_host"]: r for r in host_reciprocity(edges).collect()}
    assert all(r["n_reciprocal"] == 0 for r in rows.values())
    assert all(r["reciprocity"] == 0.0 for r in rows.values())


def test_lsh_plan_knee_tracks_threshold():
    # pure driver-side math: higher thresholds demand more rows per
    # band (sharper, right-shifted S-curve), and the chosen plan puts
    # the curve's 50% point near the threshold.
    from unified_ocr_pipeline_spark.operators.dedup import (
        lsh_collision_prob,
        lsh_plan,
    )

    b_lo, r_lo = lsh_plan(0.3, num_hashes=64)
    b_hi, r_hi = lsh_plan(0.9, num_hashes=64)
    assert b_lo * r_lo == 64 and b_hi * r_hi == 64
    assert r_hi > r_lo  # high threshold → longer bands
    for thr in (0.3, 0.5, 0.7, 0.9):
        b, r = lsh_plan(thr, num_hashes=64)
        # the knee (p = 0.5) sits within 0.2 of the target
        knee = (1 - 0.5 ** (1 / b)) ** (1 / r)
        assert abs(knee - thr) < 0.2, (thr, b, r, knee)
        # and the curve is usefully steep around it
        assert lsh_collision_prob(min(thr + 0.15, 0.999), b, r) > 0.5
    # recall bias: weighting false negatives shifts the knee DOWN
    b_w, r_w = lsh_plan(0.7, num_hashes=64, fn_weight=4.0)
    knee_w = (1 - 0.5 ** (1 / b_w)) ** (1 / r_w)
    b_u, r_u = lsh_plan(0.7, num_hashes=64, fn_weight=1.0)
    knee_u = (1 - 0.5 ** (1 / b_u)) ** (1 / r_u)
    assert knee_w <= knee_u


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Merge/Purge)
# ---------------------------------------------------------------------------


def _snm_df(spark):
    rows = [(f"d{i:02d}", f"b{i % 2}", f"k{(i * 7) % 100:03d}") for i in range(40)]
    return spark.createDataFrame(rows, "id string, blk string, key string")


def test_snm_pair_count_is_exact(spark):
    # per block of n rows: (w-1)*n - (1+..+(w-1)) pairs
    df = _snm_df(spark)
    w = 4
    out = DD.sorted_neighborhood_pairs(df, "id", "key", window=w, block_col="blk")
    n_per_block = 20
    expect = 2 * ((w - 1) * n_per_block - (w - 1) * w // 2)
    assert out.count() == expect


def test_snm_pairs_respect_blocks_and_order(spark):
    df = _snm_df(spark)
    out = DD.sorted_neighborhood_pairs(df, "id", "key", window=3, block_col="blk")
    rows = out.collect()
    blk = {r.id: r.blk for r in df.collect()}
    key = {r.id: r.key for r in df.collect()}
    for r in rows:
        assert blk[r.id_a] == blk[r.id_b]  # never spans blocks
        assert (key[r.id_a], r.id_a) < (key[r.id_b], r.id_b)  # a precedes b
    # every sort-adjacent pair within a block is a candidate
    import itertools
    for b in ("b0", "b1"):
        ordered = sorted(
            (r.key, r.id) for r in df.collect() if r.blk == b
        )
        got = {(r.id_a, r.id_b) for r in rows}
        for (k1, i1), (k2, i2) in itertools.pairwise(ordered):
            assert (i1, i2) in got


def test_snm_single_window_pass_no_join(spark):
    df = _snm_df(spark)
    plan = (
        DD.sorted_neighborhood_pairs(df, "id", "key", window=5, block_col="blk")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") >= 1
    assert "Join" not in plan  # lead()-based, not a self-join
    assert "CartesianProduct" not in plan


def test_snm_global_window_and_validation(spark):
    df = _snm_df(spark)
    out = DD.sorted_neighborhood_pairs(df, "id", "key", window=2)
    assert out.count() == 39  # adjacent pairs over the global order
    with pytest.raises(ValueError):
        DD.sorted_neighborhood_pairs(df, "id", "key", window=1)


# ---------------------------------------------------------------------------
# Edit-distance linkage verification (post-blocking match scoring)
# ---------------------------------------------------------------------------


def test_edit_similarity_values(spark):
    rows = [
        ("kitten", "sitting"),   # lev 3, max len 7 -> 1 - 3/7
        ("abc", "abc"),          # identical -> 1.0
        ("", ""),                # both empty -> 1.0 by convention
        ("abc", ""),             # 1 - 3/3 -> 0.0
        (None, "ab"),            # null treated as '' -> 0.0
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    got = [
        r.s for r in df.select(DD.edit_similarity(F.col("a"), F.col("b")).alias("s")).collect()
    ]
    assert got[0] == pytest.approx(1 - 3 / 7)
    assert got[1] == 1.0
    assert got[2] == 1.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_edit_verified_pairs_decisions_and_validation(spark):
    pairs = spark.createDataFrame(
        [
            (1, "alpha corp", 2, "alpha corp"),     # sim 1.0 -> match
            (3, "alpha corp", 4, "alpha corp ltd"), # sim 10/14 ~ 0.714 -> possible
            (5, "alpha corp", 6, "zzzzzzzzzz"),     # -> nonmatch
        ],
        "id_a long, key_a string, id_b long, key_b string",
    )
    out = {r.id_a: r.decision for r in DD.edit_verified_pairs(pairs).collect()}
    assert out == {1: "match", 3: "possible", 5: "nonmatch"}
    with pytest.raises(ValueError):
        DD.edit_verified_pairs(pairs, match_threshold=0.5, possible_threshold=0.9)


def test_edit_verified_pairs_plan_adds_no_shuffle_or_python(spark):
    df = _snm_df(spark)
    pairs = DD.sorted_neighborhood_pairs(df, "id", "key", window=3, block_col="blk")
    plan = (
        DD.edit_verified_pairs(pairs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly the SNM window's exchange; scoring is a codegen'd projection
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Leakage-safe split + temperature sampling
# ---------------------------------------------------------------------------


def test_leakage_safe_split_keeps_clusters_together(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "id long, text string"
    )
    # three planted components: {0,1,2}, {3,4}, {10,11}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = SAMP.leakage_safe_split(
        docs, "id", pairs, [("train", 8), ("val", 1), ("test", 1)]
    ).collect()
    by_id = {r.id: r for r in out}
    assert len(out) == 40
    for group in ([0, 1, 2], [3, 4], [10, 11]):
        splits = {by_id[i].split for i in group}
        comps = {by_id[i].component for i in group}
        assert len(splits) == 1, f"cluster {group} straddles splits {splits}"
        assert comps == {min(group)}
    # singletons: identical to split_assign on their own id
    single = SAMP.split_assign(
        docs.where(F.col("id") >= 12), "id", [("train", 8), ("val", 1), ("test", 1)]
    ).collect()
    for r in single:
        assert by_id[r.id].split == r.split


def test_temperature_sample_rates_and_determinism(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    rows = [(i, "big" if i < 90 else "small", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, src string, toks long")
    out = SAMP.temperature_sample(df, "id", "src", "toks", temperature=2.0)
    got = out.collect()
    rates = {r.src: r.keep_rate for r in got}
    # shares: big 0.9, small 0.1; boost_i = sqrt(f)/f = 1/sqrt(f);
    # rate_i = boost_i / boost_small -> small 1.0, big sqrt(0.1/0.9)
    assert rates["small"] == 1.0
    assert rates["big"] == pytest.approx(math.sqrt(0.1 / 0.9), abs=1e-9)
    # the rate-1.0 source keeps every row
    assert sum(1 for r in got if r.src == "small") == 10
    # deterministic across re-runs
    again = {r.id for r in SAMP.temperature_sample(
        df, "id", "src", "toks", temperature=2.0).collect()}
    assert again == {r.id for r in got}
    # T=1 keeps the natural distribution: every rate 1.0, nothing dropped
    t1 = SAMP.temperature_sample(df, "id", "src", "toks", temperature=1.0)
    assert t1.count() == 100
    with pytest.raises(ValueError):
        SAMP.temperature_sample(df, "id", "src", "toks", temperature=0.0)


def test_temperature_sample_plan_broadcasts_rates(spark):
    from unified_ocr_pipeline_spark.operators import sampling as SAMP

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, src string, toks long"
    )
    plan = (
        SAMP.temperature_sample(df, "id", "src", "toks")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
