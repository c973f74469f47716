"""Token-multiset P/R/F1 evaluator tests (multiset-min credit, one-sided
docs, empty sides). Golden check: the extraction_f1 formula oracle."""

from __future__ import annotations

from unified_ocr_pipeline_spark.operators import evaluate as EV


def _run(spark, pred_rows, gold_rows):
    p = spark.createDataFrame(pred_rows, "doc_id long, ptext string")
    g = spark.createDataFrame(gold_rows, "doc_id long, gtext string")
    return {
        r["doc_id"]: r
        for r in EV.extraction_f1(p, g, "doc_id", "ptext", "gtext").collect()
    }


def test_multiset_min_credit(spark):
    # pred repeats 'a' 3x but gold has it twice → credit 2, not 3
    got = _run(spark, [(1, "a a a b")], [(1, "a a c")])
    r = got[1]
    assert (r["n_pred"], r["n_gold"], r["n_common"]) == (4, 3, 2)
    assert r["precision"] == 0.5
    assert r["recall"] == round(2 / 3, 4)
    p, q = 0.5, 2 / 3
    assert r["f1"] == round(2 * p * q / (p + q), 4)


def test_perfect_and_disjoint(spark):
    got = _run(
        spark,
        [(1, "x y z"), (2, "a b")],
        [(1, "z y x"), (2, "c d")],
    )
    assert got[1]["f1"] == 1.0 and got[1]["precision"] == 1.0
    assert got[2]["f1"] == 0.0 and got[2]["n_common"] == 0


def test_one_sided_documents(spark):
    got = _run(spark, [(1, "only pred")], [(2, "only gold")])
    assert got[1]["n_gold"] == 0 and got[1]["recall"] == 0.0 and got[1]["f1"] == 0.0
    assert got[2]["n_pred"] == 0 and got[2]["precision"] == 0.0
    # both-empty docs are dropped entirely
    got2 = _run(spark, [(3, "   ")], [(3, "")])
    assert 3 not in got2


def test_case_folding(spark):
    got = _run(spark, [(1, "The CAT")], [(1, "the cat")])
    assert got[1]["f1"] == 1.0
