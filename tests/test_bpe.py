"""BPE merge-learning tests: exact differential vs a pure-Python
implementation of the Sennrich et al. 2016 algorithm, tie-break
determinism, early stop, rank-order application, and plan shape.
The corpus-scale apply path's golden check is the DuckDB oracle
(`bpe_tokenize` replays the replace chain); learning itself is
iterative-argmax and stays pytest-pinned."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.operators import bpe as BPE

TEXTS = [
    "low low low lower lowest",
    "new newer newest wide wider widest",
    "low new slow slower slowest wide",
    "newest newest lowest widest low low",
]


def _py_merge(seq, a, b):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _py_learn(texts, num_merges):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [BPE.EOW])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt = Counter()
        for seq, f in vocab.items():
            nxt[tuple(_py_merge(list(seq), *best))] += f
        vocab = nxt
    return merges


def _py_apply(text, merges):
    out = []
    for w in (text or "").split():
        seq = list(w) + [BPE.EOW]
        for a, b in merges:
            if len(seq) < 2:
                break
            seq = _py_merge(seq, a, b)
        out.extend(seq)
    return out


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )


def test_bpe_learn_differential(spark):
    got = BPE.bpe_learn(_df(spark), "text", num_merges=12)
    assert got == _py_learn(TEXTS, 12)
    assert len(got) == 12


def test_bpe_learn_tie_break_lexicographic(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    merges = BPE.bpe_learn(df, "text", num_merges=1)
    # all four pairs tie at count 1 -> smallest (left, right) wins
    assert merges == [("a", "b")]


def test_bpe_learn_early_stop(spark):
    df = spark.createDataFrame([("a a a",)], "text string")
    merges = BPE.bpe_learn(df, "text", num_merges=5)
    # one merge fully collapses the vocab: no pairs remain
    assert merges == [("a", BPE.EOW)]


def test_bpe_apply_differential(spark):
    merges = _py_learn(TEXTS, 10)
    rows = {
        r.doc_id: r
        for r in BPE.bpe_apply(_df(spark), "doc_id", "text", merges).collect()
    }
    for i, t in enumerate(TEXTS):
        expect = _py_apply(t, merges)
        assert rows[i].tokens == expect
        assert rows[i].n_tokens == len(expect)


def test_bpe_apply_rank_order(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id int, text string")
    out = BPE.bpe_apply(df, "doc_id", "text", [("a", "b"), ("ab", "c")])
    assert out.first().tokens == ["abc", BPE.EOW]


def test_bpe_apply_empty_and_null(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "  ")], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in
            BPE.bpe_apply(df, "doc_id", "text", [("a", "b")]).collect()}
    for i in range(3):
        assert rows[i].n_tokens == 0 and rows[i].tokens == []


def test_bpe_compression_monotone(spark):
    df = _df(spark)
    merges = _py_learn(TEXTS, 12)
    n0 = BPE.bpe_apply(df, "doc_id", "text", []).agg(
        F.sum("n_tokens")
    ).first()[0]
    n6 = BPE.bpe_apply(df, "doc_id", "text", merges[:6]).agg(
        F.sum("n_tokens")
    ).first()[0]
    n12 = BPE.bpe_apply(df, "doc_id", "text", merges).agg(
        F.sum("n_tokens")
    ).first()[0]
    assert n0 > n6 > n12


def test_bpe_learn_topk_is_heap_not_global_sort(spark):
    # the per-round argmax must compile to TakeOrderedAndProject
    vocab = BPE.word_frequencies(_df(spark), "text").select(
        F.concat(F.split("word", ""), F.array(F.lit(BPE.EOW))).alias("syms"),
        "freq",
    )
    pairs = (
        vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), "l", "r")
        .limit(1)
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# Fertility report
# ---------------------------------------------------------------------------


def _py_encode(word: str, merges) -> list[str]:
    seq = list(word) + [BPE.EOW]
    for a, b in merges:
        if len(seq) < 2:
            break
        seq = BPE._merge_pair_in_seq(seq, a, b)
    return seq


def test_bpe_fertility_matches_python(spark):
    merges = [("a", "b"), ("ab", "c"), ("l", "o"), ("lo", "w"), ("low", "</w>")]
    rows = [
        ("en", "low lower abc ab"),
        ("en", "abc abc low"),
        ("de", "lowest ab"),
        ("de", ""),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        r.lang: r
        for r in BPE.bpe_fertility(df, "text", "lang", merges).collect()
    }
    for lang in ("en", "de"):
        texts = [t for lg, t in rows if lg == lang]
        n_words = sum(len(t.split()) for t in texts)
        n_toks = sum(
            len(_py_encode(w, merges)) for t in texts for w in t.split()
        )
        n_chars = sum(len(t) for t in texts)
        r = got[lang]
        assert r.n_docs == len(texts)
        assert r.n_words == n_words
        assert r.n_tokens == n_toks
        assert r.fertility == n_toks / n_words
        assert r.chars_per_token == n_chars / n_toks


def test_bpe_fertility_plan_is_one_pass_no_join(spark):
    df = spark.createDataFrame(
        [("en", "a b c")], "lang string, text string"
    )
    plan = (
        BPE.bpe_fertility(df, "text", "lang", [("a", "b")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Join" not in plan
    assert "partial" in plan.lower()  # map-side combine before the exchange
