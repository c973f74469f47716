"""Product-quantization tests: encode vs a pure-NumPy reference,
ADC top-k vs a full-scan reference, and the duplicate-query optimality
property.  The golden cross-engine check is the pq_topk SQL oracle."""

from __future__ import annotations

import random

import numpy as np
import pytest

from unified_ocr_pipeline_spark.operators import ivf as IVF


def _vectors(n, dim, seed=3):
    rng = random.Random(seed)
    return [
        (i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(n)
    ]


def _ref_encode(vecs, cb):
    m, ksub, dsub = cb.shape
    c2 = np.einsum("mkd,mkd->mk", cb, cb)
    out = {}
    for i, v in vecs:
        v = np.asarray(v)
        codes = []
        for j in range(m):
            sub = v[j * dsub : (j + 1) * dsub]
            scores = -2.0 * sub @ cb[j].T + c2[j]
            codes.append(int(np.argmin(scores)))
        out[i] = codes
    return out


def test_pq_codebooks_shape_and_determinism():
    a = IVF.pq_codebooks(4, 16, 64, seed=7)
    b = IVF.pq_codebooks(4, 16, 64, seed=7)
    assert a.shape == (4, 16, 16)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        IVF.pq_codebooks(5, 16, 64)


def test_pq_encode_matches_reference(spark):
    vecs = _vectors(40, 32)
    cb = IVF.pq_codebooks(4, 8, 32, seed=11)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: list(r["codes"])
        for r in IVF.pq_encode(df, "embedding", "vec_id", cb).collect()
    }
    want = _ref_encode(vecs, cb)
    assert got == want


def test_pq_topk_matches_full_scan_reference(spark):
    vecs = _vectors(60, 32)
    cb = IVF.pq_codebooks(4, 8, 32, seed=11)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    enc = IVF.pq_encode(df, "embedding", "vec_id", cb)
    queries = vecs[:3]
    got = [
        (r["qid"], r["rank"], r["nid"], r["adist"])
        for r in IVF.pq_topk(enc, queries, cb, "vec_id", k=4)
        .orderBy("qid", "rank")
        .collect()
    ]

    codes = _ref_encode(vecs, cb)
    m, ksub, dsub = cb.shape
    c2 = np.einsum("mkd,mkd->mk", cb, cb)
    want = []
    for qid, qv in queries:
        qv = np.asarray(qv)
        lut = np.stack(
            [-2.0 * (qv[j * dsub : (j + 1) * dsub] @ cb[j].T) + c2[j] for j in range(m)]
        )
        cands = []
        for nid, _ in vecs:
            if nid == qid:
                continue
            d = round(float(sum(lut[j, codes[nid][j]] for j in range(m))), 4)
            cands.append((d, nid))
        cands.sort()
        for rank, (d, nid) in enumerate(cands[:4], start=1):
            want.append((qid, rank, nid, d))
    assert got == want


def test_pq_duplicate_of_query_ranks_first(spark):
    vecs = _vectors(30, 32, seed=5)
    dup = (999, list(vecs[0][1]))  # exact copy of query vector, new id
    cb = IVF.pq_codebooks(4, 8, 32, seed=11)
    df = spark.createDataFrame(
        vecs + [dup], "vec_id long, embedding array<double>"
    )
    enc = IVF.pq_encode(df, "embedding", "vec_id", cb)
    top = (
        IVF.pq_topk(enc, [vecs[0]], cb, "vec_id", k=3)
        .orderBy("rank")
        .collect()
    )
    # the duplicate shares the query's argmin codes, which also minimize
    # the query's lookup table per subspace → minimal ADC distance
    assert top[0]["adist"] == min(r["adist"] for r in top)
    assert any(r["nid"] == 999 and r["adist"] == top[0]["adist"] for r in top)
