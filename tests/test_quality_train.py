"""Trained quality classifier: distributed LR vs NumPy reference fit."""

import math

import numpy as np
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.operators import featurize as FZ


def _corpus(spark):
    rows = []
    for i in range(40):
        if i % 4 == 0:  # clean prose
            rows.append((i, "the quick brown fox jumps over the lazy dog "
                            "and runs to the old barn in the field"))
        elif i % 4 == 1:  # repetition junk
            rows.append((i, "buy now " * 30))
        elif i % 4 == 2:  # symbol junk
            rows.append((i, "$$$ ### !!! %%% ^^^ &&& *** ((( ))) @@@ " * 5))
        else:  # short-but-ok
            rows.append((i, f"a short note about item {i} in the catalog"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_lr_train_matches_numpy_reference(spark):
    df = _corpus(spark)
    wts = FZ.quality_lr_train(df, "text", iters=4, lr=0.5)

    # independent NumPy fit over the engine's own feature frame
    pdf = FZ.quality_feature_frame(df, "text").toPandas()
    names = list(FZ.QUALITY_FEATURES[1:])
    X = np.column_stack([np.ones(len(pdf))] + [pdf[f].to_numpy() for f in names])
    y = pdf["y"].to_numpy()
    w = np.zeros(X.shape[1])
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) / len(y)
        w = np.round(w - 0.5 * g, 9)
    for j, f in enumerate(FZ.QUALITY_FEATURES):
        assert abs(wts[f] - w[j]) < 1e-8, (f, wts[f], w[j])


def test_quality_lr_train_learns_signal_direction(spark):
    # distilling the Gopher gate: repetition and symbol noise must come
    # out negative, the trained score must separate clean from junk
    df = _corpus(spark)
    wts = FZ.quality_lr_train(df, "text", iters=4, lr=0.5)
    assert wts["dup_frac"] < 0
    assert wts["sym_ratio"] < 0
    scored = df.select(
        "doc_id",
        FZ.quality_lr_score_trained("text", wts).alias("s"),
    ).collect()
    s = {r["doc_id"]: r["s"] for r in scored}
    clean = [v for k, v in s.items() if k % 4 == 0]
    junk = [v for k, v in s.items() if k % 4 in (1, 2)]
    assert min(clean) > max(junk)


def test_quality_calibration_over_trained_weights(spark):
    # the reliability check the fixed-weight classifier gets, re-run
    # over the TRAINED weights: keep_rate must climb with the bucket
    from unified_ocr_pipeline_spark.functions import text as TX

    df = _corpus(spark)
    wts = FZ.quality_lr_train(df, "text", iters=25, lr=1.0)
    t = F.col("text")
    score = FZ.quality_lr_score_trained(t, wts)
    label = TX.gopher_keep(t)
    bucket = F.least(F.lit(9), F.floor(score * 10).cast("int"))
    table = (
        df.select(bucket.alias("bucket"), label.cast("long").alias("l"))
        .groupBy("bucket")
        .agg(F.avg("l").alias("keep_rate"))
        .orderBy("bucket")
        .collect()
    )
    rates = [r["keep_rate"] for r in table]
    assert rates == sorted(rates)  # monotone reliability
    assert rates[0] < 0.5 and rates[-1] > 0.5


def test_quality_lr_train_bounded_driver_actions(spark):
    # iters aggregation passes, each collecting ONE row — verify the
    # artifact is a plain dict of finite floats (driver-side, kmeans
    # pattern) and the score column round-trips
    df = _corpus(spark)
    wts = FZ.quality_lr_train(df, "text", iters=2, lr=0.5)
    assert set(wts) == set(FZ.QUALITY_FEATURES)
    assert all(math.isfinite(v) for v in wts.values())
    assert all(abs(round(v, 9) - v) < 1e-15 for v in wts.values())


def test_quality_lr_train_hash_sample_path(spark):
    # the 100 TB path: md5-60 hash sample of id_col — deterministic
    # across runs, and weights stay finite/sane on the reduced batch
    df = _corpus(spark)
    a = FZ.quality_lr_train(df, "text", iters=3, lr=0.5, sample_mod=2)
    b = FZ.quality_lr_train(df, "text", iters=3, lr=0.5, sample_mod=2)
    assert a == b  # identical sample -> identical trajectory
    full = FZ.quality_lr_train(df, "text", iters=3, lr=0.5)
    assert a != full  # genuinely trained on a subset
    assert all(math.isfinite(v) for v in a.values())


def test_quality_lr_train_auto_switch_samples_past_threshold(spark):
    # the lm_perplexity_gate convention: sample_mod=None counts the
    # input and auto-samples past auto_threshold. Below it (fixtures)
    # the trajectory is the explicit train-on-everything one; above it,
    # it is EXACTLY the md5-sample trajectory with the auto-chosen mod.
    df = _corpus(spark)  # 40 docs
    below = FZ.quality_lr_train(df, "text", iters=2, auto_threshold=100)
    full = FZ.quality_lr_train(df, "text", iters=2, sample_mod=1)
    assert below == full
    above = FZ.quality_lr_train(df, "text", iters=2, auto_threshold=10)
    # auto mod = ceil(40/10) = 4 -> identical to the explicit sample
    explicit = FZ.quality_lr_train(df, "text", iters=2, sample_mod=4)
    assert above == explicit
    assert above != full  # genuinely trained on the subset
