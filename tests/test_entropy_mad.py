"""Shannon char entropy (gibberish bands) and median/MAD outlier flags."""

import math

from pyspark.sql import functions as F


def _entropy(spark, texts):
    from unified_ocr_pipeline_spark.operators import stats as ST

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    return {r["doc_id"]: r for r in ST.char_entropy(df).collect()}


def test_entropy_hand_computed(spark):
    got = _entropy(spark, ["aab"])
    r = got[0]
    # {a:2, b:1}: H = ln(3) - (2 ln 2 + 0)/3
    expect = round(math.log(3) - (2 * math.log(2)) / 3, 6)
    assert (r["n_chars_counted"], r["n_unique_chars"]) == (3, 2)
    assert r["entropy"] == expect


def test_entropy_bands(spark):
    import random

    rng = random.Random(7)
    mash = "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/") for _ in range(800))
    got = _entropy(
        spark,
        [
            "aaaaaaaaaaaaaaaaaaaaaaaa",   # padding spam -> low
            "The quick brown fox jumps over the lazy dog repeatedly.",  # natural -> ok
            mash,                          # base64-ish mash -> high
        ],
    )
    assert got[0]["band"] == "low" and got[0]["entropy"] == 0.0
    assert got[1]["band"] == "ok"
    assert got[2]["band"] == "high"


def test_entropy_case_not_folded(spark):
    # case mixing is signal (base64 vs prose): NOT folded
    got = _entropy(spark, ["AaAa"])
    assert got[0]["n_unique_chars"] == 2


def _mad(spark, rows, k=3.0):
    from unified_ocr_pipeline_spark.operators import stats as ST

    df = spark.createDataFrame(rows, "id int, g string, x int")
    return {r["id"]: r for r in ST.mad_outliers(df, "g", "x", k=k).collect()}


def test_mad_flags_planted_outlier(spark):
    rows = [(i, "h", v) for i, v in enumerate([10, 11, 12, 13, 14, 500])]
    got = _mad(spark, rows)
    assert got[5]["is_outlier"] is True
    assert all(got[i]["is_outlier"] is False for i in range(5))
    # median of [10..14, 500] = 12.5; MAD = median(|x-12.5|) = 1.5+... sanity:
    assert got[0]["group_median"] == 12.5


def test_mad_robust_where_stddev_breaks(spark):
    # two huge outliers inflate the stddev so 3-sigma misses them;
    # median/MAD still flags both
    vals = [100] * 20 + [10000, 12000]
    rows = [(i, "h", v) for i, v in enumerate(vals)]
    got = _mad(spark, rows)
    assert got[20]["is_outlier"] is True and got[21]["is_outlier"] is True
    assert not any(got[i]["is_outlier"] for i in range(20))


def test_mad_zero_mad_group(spark):
    # >= half identical -> MAD 0: only strictly-different values flag
    rows = [(i, "h", 5) for i in range(6)] + [(6, "h", 7)]
    got = _mad(spark, rows)
    assert got[6]["is_outlier"] is True
    assert not any(got[i]["is_outlier"] for i in range(6))


def test_mad_groups_independent(spark):
    # a value normal for host A is an outlier for host B
    rows = [(i, "A", 1000 + i) for i in range(5)] + [
        (10 + i, "B", 10 + i) for i in range(5)
    ] + [(20, "B", 1000)]
    got = _mad(spark, rows)
    assert got[20]["is_outlier"] is True
    assert not any(got[i]["is_outlier"] for i in range(5))


def test_invisible_counts_and_strip(spark):
    from unified_ocr_pipeline_spark.functions import normalize as NZ

    df = spark.createDataFrame(
        [
            (1, "pay​load­ x﻿"),   # 3 zero-width class
            (2, "user ‮evil‬ done"),    # RTL override pair
            (3, "plain text"),
        ],
        "id int, t string",
    )
    zw, bidi = NZ.invisible_counts(F.col("t"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id", zw.alias("zw"), bidi.alias("bidi"),
            NZ.strip_invisible(F.col("t")).alias("s"),
        ).collect()
    }
    assert (rows[1]["zw"], rows[1]["bidi"], rows[1]["s"]) == (3, 0, "payload x")
    assert (rows[2]["zw"], rows[2]["bidi"], rows[2]["s"]) == (0, 2, "user evil done")
    assert (rows[3]["zw"], rows[3]["bidi"], rows[3]["s"]) == (0, 0, "plain text")


def test_invisible_strip_restores_exact_dedup(spark):
    """The attack this exists for: zero-width padding defeats md5
    dedup until stripped."""
    from unified_ocr_pipeline_spark.functions import normalize as NZ

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same​ text")], "id int, t string"
    )
    raw = df.select(F.md5(F.col("t")).alias("h")).distinct().count()
    clean = df.select(
        F.md5(NZ.strip_invisible(F.col("t"))).alias("h")
    ).distinct().count()
    assert raw == 2 and clean == 1


def test_bidi_marks_lrm_rlm_alm_counted_and_stripped(spark):
    # implicit directional marks (U+200E LRM, U+200F RLM, U+061C ALM)
    # also reorder rendered text — they count as bidi controls and do
    # not survive strip_invisible
    from unified_ocr_pipeline_spark.functions import normalize as NZ

    t = "a‎b‏c؜d"
    df = spark.createDataFrame([(t,)], "t string")
    zw, bidi = NZ.invisible_counts(F.col("t"))
    r = df.select(
        zw.alias("zw"), bidi.alias("bidi"),
        NZ.strip_invisible(F.col("t")).alias("s"),
    ).first()
    assert r["zw"] == 0
    assert r["bidi"] == 3
    assert r["s"] == "abcd"
