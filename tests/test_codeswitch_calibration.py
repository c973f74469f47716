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


def test_linkage_clusters_end_to_end(spark):
    """SNM -> edit-verify -> components: near-identical titles cluster,
    distinct ones stay singleton entities."""
    import __spark_entry__ as E
    from unified_ocr_pipeline_spark.operators import cc as CC
    from unified_ocr_pipeline_spark.operators import dedup as DD
    from pyspark.sql import functions as F

    rows = [
        (1, "en", "acme corporation annual report"),
        (2, "en", "acme corporation annual reporT"),  # 1 edit -> match
        (3, "en", "completely different title here"),
        (4, "de", "acme corporation annual report"),  # other block: no pair
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    keyed = d.select(
        "doc_id", "lang",
        F.lower(F.substring(F.col("text"), 1, 32)).alias("title"),
    )
    pairs = DD.sorted_neighborhood_pairs(
        keyed, "doc_id", "title", window=3, block_col="lang"
    )
    verified = DD.edit_verified_pairs(
        pairs, "key_a", "key_b", match_threshold=0.85, possible_threshold=0.6
    )
    matches = verified.where(F.col("decision") == "match").select("id_a", "id_b")
    got = {
        r["doc_id"]: r
        for r in CC.dedup_clusters(d.select("doc_id"), matches, "doc_id").collect()
    }
    assert got[1]["component"] == got[2]["component"] == 1
    assert got[2]["is_canonical"] is False and got[1]["is_canonical"] is True
    assert got[3]["component"] == 3 and got[4]["component"] == 4
