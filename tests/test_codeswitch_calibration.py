"""Per-line code-switch detection and quality-classifier calibration."""

from pyspark.sql import functions as F


def _switch(spark, texts):
    from unified_ocr_pipeline_spark.functions import text as TX

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    return {
        r["id"]: r for r in df.select("id", *TX.code_switch_cols(F.col("t"))).collect()
    }


def test_code_switch_counts(spark):
    got = _switch(
        spark,
        [
            "the cat is here and the dog\nder hund ist da und die katze",
            "the cat is here and the dog\nthe end of a fine day is now",
            "le chat est dans la maison\n12345\nthe dog and the cat is here",
        ],
    )
    assert (got[0]["n_switches"], got[0]["mixed"]) == (1, True)
    assert (got[1]["n_switches"], got[1]["mixed"]) == (0, False)
    # und line between fr and en doesn't vote but doesn't block the switch
    assert got[2]["n_lang_lines"] == 2 and got[2]["n_switches"] == 1


def test_code_switch_single_and_empty(spark):
    got = _switch(spark, ["the cat is here and fine", ""])
    assert got[0]["n_switches"] == 0 and got[0]["mixed"] is False
    assert got[1]["n_lang_lines"] == 0 and got[1]["n_switches"] == 0


def test_calibration_monotone_on_separable_corpus(spark):
    from unified_ocr_pipeline_spark.operators import evaluate as EV

    good = (
        "The weather report is a fine example of the plain style many "
        "readers enjoy in the morning paper every day of the week."
    )
    bad = "zzz " * 50 + "!!!! ####"
    df = spark.createDataFrame(
        [(i, good) for i in range(20)] + [(100 + i, bad) for i in range(20)],
        "doc_id int, text string",
    )
    rows = EV.quality_calibration(df).collect()
    by_bucket = {r["bucket"]: r for r in rows}
    top = max(by_bucket)
    bot = min(by_bucket)
    assert top != bot
    # high-score bucket agrees with the rule gate; low-score bucket doesn't
    assert by_bucket[top]["keep_rate"] == 1.0
    assert by_bucket[bot]["keep_rate"] == 0.0
    assert by_bucket[top]["avg_score"] > by_bucket[bot]["avg_score"]


def test_calibration_bucket_edges(spark):
    from unified_ocr_pipeline_spark.operators import evaluate as EV

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    r = EV.quality_calibration(df).first()
    assert 0 <= r["bucket"] <= 9 and r["n"] == 1
