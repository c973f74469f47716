"""Readability, Yule's K lexical diversity, degree histogram, and the
single-scan curation funnel."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# readability_cols
# ---------------------------------------------------------------------------

def test_readability_hand_computed(spark):
    from unified_ocr_pipeline_spark.functions import text as TX

    # 6 words, 2 sentences, syllables by vowel-run: "the"(1) "cat"(1)
    # "sat"(1) "it"(1) "ran"(1) "away"(2: a, a...) -> lower "away" has
    # runs 'a','a' -> wait: a-w-a-y -> runs 'a','ay' = 2. total 7.
    df = spark.createDataFrame([(1, "The cat sat. It ran away!")], "id int, t string")
    r = df.select(*TX.readability_cols(F.col("t"))).first()
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 7)
    w, s, syl = 6.0, 2.0, 7.0
    assert r["flesch"] == round(206.835 - 1.015 * (w / s) - 84.6 * (syl / w), 4)
    assert r["fk_grade"] == round(0.39 * (w / s) + 11.8 * (syl / w) - 15.59, 4)
    assert r["band"] == "very_easy"


def test_readability_empty_and_no_sentence(spark):
    from unified_ocr_pipeline_spark.functions import text as TX

    df = spark.createDataFrame(
        [(1, ""), (2, "no terminator here")], "id int, t string"
    )
    rows = {r["id"]: r for r in df.select("id", *TX.readability_cols(F.col("t"))).collect()}
    assert rows[1]["flesch"] is None and rows[1]["band"] is None
    # words but zero sentences -> NULL scores, not a division error
    assert rows[2]["n_sentences"] == 0 and rows[2]["flesch"] is None


def test_readability_bands_ordered(spark):
    from unified_ocr_pipeline_spark.functions import text as TX

    # dense polysyllabic text scores difficult; terse monosyllables easy
    hard = "Incomprehensibility characterizes institutionalization universally. " * 3
    easy = "The dog ran. The cat sat. It is fun. " * 3
    df = spark.createDataFrame([(1, hard), (2, easy)], "id int, t string")
    got = {r["id"]: r for r in df.select("id", *TX.readability_cols(F.col("t"))).collect()}
    assert got[1]["flesch"] < got[2]["flesch"]
    assert got[2]["band"] in ("very_easy", "plain")
    assert got[1]["band"] in ("difficult", "very_difficult")


# ---------------------------------------------------------------------------
# lexical_diversity (Yule's K)
# ---------------------------------------------------------------------------

def test_yule_k_hand_computed(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    df = spark.createDataFrame([(1, "a a b")], "doc_id int, text string")
    r = ST.lexical_diversity(df).first()
    # freq spectrum {a:2, b:1}: N=3, S2=5, K = 1e4*(5-3)/9
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (3, 2, 1)
    assert r["yule_k"] == round(10000.0 * 2 / 9, 4)


def test_yule_k_repetitive_beats_diverse(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    df = spark.createDataFrame(
        [(1, "spam " * 50), (2, " ".join(f"w{i}" for i in range(50)))],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["yule_k"] for r in ST.lexical_diversity(df).collect()}
    assert got[1] > got[2]  # template text scores high
    assert got[2] == 0.0  # all hapax -> S2 == N


def test_yule_k_case_folded_and_empty_dropped(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    df = spark.createDataFrame([(1, "  The THE the  "), (2, "   ")], "doc_id int, text string")
    rows = {r["doc_id"]: r for r in ST.lexical_diversity(df).collect()}
    assert rows[1]["n_types"] == 1 and rows[1]["n_tokens"] == 3
    assert 2 not in rows  # whitespace-only doc yields no token rows


# ---------------------------------------------------------------------------
# degree_histogram
# ---------------------------------------------------------------------------

def test_degree_histogram_counts(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    e = spark.createDataFrame(
        [("u1", "a"), ("u2", "a"), ("u3", "a"), ("u1", "b"), ("u2", "b"), ("u1", "c")],
        "src_url string, dst_host string",
    )
    got = {r["degree"]: r["n_nodes"] for r in LG.degree_histogram(e, "dst_host").collect()}
    assert got == {3: 1, 2: 1, 1: 1}


def test_degree_histogram_log_pairs(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG
    import math

    e = spark.createDataFrame(
        [(f"u{i}", "hub") for i in range(10)] + [("u0", "leaf")],
        "src_url string, dst_host string",
    )
    rows = {r["degree"]: r for r in LG.degree_histogram(e, "dst_host").collect()}
    assert rows[10]["log_degree"] == round(math.log10(10.0), 4) == 1.0
    assert rows[1]["log_degree"] == 0.0


# ---------------------------------------------------------------------------
# curation_funnel
# ---------------------------------------------------------------------------

def _funnel_rows(spark, docs):
    from unified_ocr_pipeline_spark.operators import curation as CU

    df = spark.createDataFrame(docs, "doc_id int, text string")
    return {r["stage"]: r["n_docs"] for r in CU.curation_funnel(df).collect()}


GOOD = (
    "The weather report is a fine example of the plain style many readers "
    "enjoy in the morning paper every day.\n"
    "It is written to be read aloud and to be understood by the audience."
)


def test_funnel_stages_cumulative(spark):
    docs = [
        (1, GOOD),                       # survives everything
        (2, GOOD),                       # exact duplicate of 1 -> dropped at dedup
        (3, "der die das und ist ein zu mit der die das und ist."),  # German
        (4, "the " * 60),                # English but fails Gopher top-cov
        (5, "the cat is here and a dog sat out there in that warm end zone"),  # en+gopher, no terminal line -> fails C4
    ]
    got = _funnel_rows(spark, docs)
    assert got["input"] == 5
    assert got["lang_en"] == 4          # doc 3 out
    assert got["gopher"] == 3           # doc 4 out
    assert got["c4_nonempty"] == 2      # doc 5 out
    assert got["exact_dedup"] == 1      # doc 2 collapses into doc 1


def test_funnel_monotone_and_complete(spark):
    docs = [(i, GOOD if i % 2 else "der und ist das.") for i in range(1, 11)]
    got = _funnel_rows(spark, docs)
    order = ["input", "lang_en", "gopher", "c4_nonempty", "exact_dedup"]
    vals = [got[s] for s in order]
    assert vals == sorted(vals, reverse=True)
    assert set(got) == set(order)


def test_funnel_single_scan_no_python(spark):
    """The whole funnel is one scan + one global aggregate: no join, no
    window, no Python eval anywhere in the plan."""
    from unified_ocr_pipeline_spark.operators import curation as CU

    df = spark.createDataFrame([(1, GOOD)], "doc_id int, text string")
    plan = CU.curation_funnel(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Scan") <= 1
