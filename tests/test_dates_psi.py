"""Date-mention normalization (functions/dates.py) and PSI batch-drift
(operators/stats.psi_drift)."""

import datetime
import math

from pyspark.sql import functions as F


def _mentions(spark, texts):
    from unified_ocr_pipeline_spark.functions import dates as DT

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    return {
        r["id"]: r
        for r in df.select("id", *DT.date_mention_cols(F.col("t"))).collect()
    }


def test_date_formats_normalize(spark):
    got = _mentions(
        spark,
        [
            "released 2024-03-05 worldwide",
            "on 03/05/2024 the site launched",
            "Updated March 5, 2024 by the editors",
            "no date here at all",
        ],
    )
    d = datetime.date(2024, 3, 5)
    assert (got[0]["mention_fmt"], got[0]["date_norm"]) == ("iso", d)
    assert (got[1]["mention_fmt"], got[1]["date_norm"]) == ("us", d)
    assert (got[2]["mention_fmt"], got[2]["date_norm"]) == ("long", d)
    assert got[3]["mention"] is None and got[3]["date_norm"] is None


def test_date_calendar_validation_and_precedence(spark):
    got = _mentions(
        spark,
        [
            "bogus 2024-99-99 stays visible",       # regex hit, invalid calendar
            "both 2024-03-05 and 03/09/2024 here",  # ISO wins precedence
        ],
    )
    assert got[0]["mention"] == "2024-99-99" and got[0]["date_norm"] is None
    assert got[1]["mention"] == "2024-03-05"
    assert got[1]["date_norm"] == datetime.date(2024, 3, 5)


def test_psi_zero_for_identical_batches(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    df = spark.createDataFrame([(i, i % 100) for i in range(400)], "id int, x int")
    r = ST.psi_drift(df, df, ["x"], {"x": (0, 100)}, n_buckets=10).first()
    assert r["col"] == "x" and r["psi"] == 0.0
    assert r["n_ref"] == r["n_cur"] == 400


def test_psi_detects_planted_shift(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    ref = spark.createDataFrame([(i, i % 100) for i in range(400)], "id int, x int")
    # current batch squeezed into the lower half -> strong drift
    cur = spark.createDataFrame([(i, i % 50) for i in range(400)], "id int, x int")
    r = ST.psi_drift(ref, cur, ["x"], {"x": (0, 100)}, n_buckets=10).first()
    assert r["psi"] > 0.25  # "shifted" band of the standard rule of thumb


def test_psi_hand_computed_two_buckets(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    ref = spark.createDataFrame([(i, 10 if i < 8 else 90) for i in range(10)], "id int, x int")
    cur = spark.createDataFrame([(i, 10 if i < 5 else 90) for i in range(10)], "id int, x int")
    r = ST.psi_drift(ref, cur, ["x"], {"x": (0, 100)}, n_buckets=2).first()
    expect = (0.8 - 0.5) * math.log(0.8 / 0.5) + (0.2 - 0.5) * math.log(0.2 / 0.5)
    assert r["psi"] == round(expect, 6)


def test_psi_outliers_clamp_to_edge_buckets(spark):
    from unified_ocr_pipeline_spark.operators import stats as ST

    ref = spark.createDataFrame([(1, -500), (2, 500)], "id int, x int")
    r = ST.psi_drift(ref, ref, ["x"], {"x": (0, 100)}, n_buckets=10).first()
    # out-of-range values landed in buckets (not dropped): counts intact
    assert r["n_ref"] == 2 and r["psi"] == 0.0
