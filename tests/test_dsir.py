"""DSIR importance-resampling tests: python differential, selection
direction, deterministic gumbel resampling, and plan shape (bounded
broadcast, no corpus-side broadcast, no per-row Python)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.operators import dsir as DS

DOCS = [
    # (id, text, is_target) — targets share 'alpha beta' mass, raw-only
    # docs share 'gamma delta'; held-out docs 10/11 lean each way.
    (0, "alpha beta alpha beta gamma", True),
    (1, "alpha beta alpha", True),
    (2, "beta alpha beta", True),
    (3, "gamma delta gamma delta", False),
    (4, "delta gamma delta", False),
    (5, "gamma delta epsilon", False),
    (10, "alpha beta", False),
    (11, "gamma delta", False),
    (12, "", False),
    (13, "   ", False),
]


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_dsir(docs, n_buckets):
    """Scalar reimplementation for differential testing."""
    feats, targets = {}, {}
    for did, text, t in docs:
        toks = [x for x in text.lower().split() if x]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            continue
        targets[did] = t
        bc = {}
        for g in grams:
            b = _md5_60(g) % n_buckets
            bc[b] = bc.get(b, 0) + 1
        feats[did] = bc
    ct, cr = {}, {}
    for did, bc in feats.items():
        for b, c in bc.items():
            cr[b] = cr.get(b, 0) + c
            if targets[did]:
                ct[b] = ct.get(b, 0) + c
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for did, bc in feats.items():
        w = sum(
            c * (math.log((ct.get(b, 0) + 1.0) / (nt + n_buckets))
                 - math.log((cr.get(b, 0) + 1.0) / (nr + n_buckets)))
            for b, c in bc.items()
        )
        out[did] = (sum(bc.values()), w)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, is_t boolean")


def test_dsir_matches_python_differential(docs_df):
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_logw"])
        for r in DS.dsir_weights(
            docs_df, is_target=F.col("is_t"), n_buckets=64
        ).collect()
    }
    want = _py_dsir(DOCS, 64)
    assert set(got) == set(want)  # zero-gram docs 12/13 dropped both sides
    assert 12 not in got and 13 not in got
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], rel=1e-12)


def test_dsir_ranks_target_like_docs_higher(docs_df):
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in DS.dsir_weights(
            docs_df, is_target=F.col("is_t"), n_buckets=64
        ).collect()
    }
    # the held-out doc made of target grams beats the one made of raw-only
    assert w[10] > w[11]
    # and raw-only vocabulary scores below zero (less likely under target)
    assert w[11] < 0


def test_dsir_resample_is_deterministic_and_weight_biased(docs_df):
    weights = DS.dsir_weights(docs_df, is_target=F.col("is_t"), n_buckets=64)
    a = [r["doc_id"] for r in DS.dsir_resample(weights, 4).collect()]
    b = [r["doc_id"] for r in DS.dsir_resample(weights, 4).collect()]
    assert a == b  # hash-gumbel: re-runs identical
    c = [r["doc_id"] for r in DS.dsir_resample(weights, 4, seed="other").collect()]
    assert set(a) != set(c) or a != c  # a different seed may reshuffle
    # strong-target doc 10 outranks strong-raw doc 11 whenever both drawn
    full = [r["doc_id"] for r in DS.dsir_resample(weights, 8).collect()]
    assert full.index(10) < full.index(11)


def test_dsir_plan_shape(docs_df):
    w = DS.dsir_weights(docs_df, is_target=F.col("is_t"), n_buckets=64)
    plan = w._sc._jvm.PythonSQLUtils.explainString(
        w._jdf.queryExecution(), "formatted"
    )
    # the bucket-weight side broadcasts (bounded by n_buckets)...
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # ...and nothing drops to per-row Python
    assert "BatchEvalPython" not in plan
