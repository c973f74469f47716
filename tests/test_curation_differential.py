"""Differential tests: each new curation operator vs an independent
pure-Python reference over seeded random corpora (same style as the
union-find differential in test_cc.py — the Spark implementation and the
reference share no code, only the spec)."""

from __future__ import annotations

import hashlib
import random

import pytest

from unified_ocr_pipeline_spark.operators.curation import line_dedup
from unified_ocr_pipeline_spark.operators.sampling import (
    chunk_documents,
    mixture_sample,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _rand_doc(rng, max_lines=6):
    lines = []
    for _ in range(rng.randint(0, max_lines)):
        kind = rng.random()
        if kind < 0.4:
            lines.append("SHARED BOILERPLATE " + str(rng.randint(0, 2)))
        elif kind < 0.5:
            lines.append("   ")  # blank-ish
        else:
            lines.append(" ".join(rng.choices(WORDS, k=rng.randint(1, 6))))
    return "\n".join(lines)


def _py_line_dedup(docs, max_df):
    from collections import defaultdict

    df_count = defaultdict(set)
    for i, text in docs:
        for line in text.split("\n"):
            if line.strip():
                df_count[line].add(i)
    bad = {l for l, s in df_count.items() if len(s) > max_df}
    out = {}
    for i, text in docs:
        kept = [l for l in text.split("\n") if l.strip() and l not in bad]
        n_in = sum(1 for l in text.split("\n") if l.strip())
        out[i] = ("\n".join(kept), n_in, len(kept))
    return out


def test_line_dedup_differential(spark):
    rng = random.Random(11)
    for trial in range(5):
        docs = [(i, _rand_doc(rng)) for i in range(rng.randint(3, 25))]
        max_df = rng.randint(1, 4)
        expected = _py_line_dedup(docs, max_df)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["id"]: (r["clean_text"], r["n_lines_in"], r["n_lines_kept"])
            for r in line_dedup(df, "doc_id", "text", max_df=max_df).collect()
        }
        assert got == expected, (trial, max_df, docs)


def _py_chunks(text, chunk, stride):
    t = text.strip()
    toks = t.split() if t else []
    n = len(toks)
    k = 1 + max(0, -(-(max(n - chunk, 0)) // stride))
    out = []
    for i in range(k):
        c = toks[i * stride: i * stride + chunk]
        out.append((i, len(c), " ".join(c)))
    return out


def test_chunk_documents_differential(spark):
    rng = random.Random(13)
    for trial in range(5):
        chunk = rng.randint(2, 8)
        stride = rng.randint(1, chunk)
        docs = [
            (i, " ".join(rng.choices(WORDS, k=rng.randint(0, 30))))
            for i in range(rng.randint(2, 15))
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {}
        for r in chunk_documents(df, "doc_id", "text", chunk, stride).collect():
            got.setdefault(r["id"], []).append(
                (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
            )
        for i, text in docs:
            assert sorted(got[i]) == _py_chunks(text, chunk, stride), (
                trial, chunk, stride, text,
            )


def _h60(x):
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_mixture_sample_differential(spark):
    rng = random.Random(17)
    for trial in range(5):
        sources = ["a", "b", "c"]
        docs = [
            (i, rng.choice(sources), rng.randint(1, 50))
            for i in range(rng.randint(5, 40))
        ]
        budgets = {s: rng.randint(10, 120) for s in rng.sample(sources, 2)}
        expected = set()
        for s in budgets:
            rows = sorted(
                (r for r in docs if r[1] == s), key=lambda r: (_h60(r[0]), r[0])
            )
            cum = 0
            for i, _, w in rows:
                if cum < budgets[s]:
                    expected.add(i)
                cum += w
        df = spark.createDataFrame(docs, "doc_id long, source string, n long")
        got = {
            r["doc_id"]
            for r in mixture_sample(df, "doc_id", "source", "n", budgets).collect()
        }
        assert got == expected, (trial, budgets, docs)


def test_mixture_sample_salted_prefix_sum_is_exact(spark):
    # the salted two-phase cumsum must be bit-identical to the classic
    # one-window plan at every salt, cum_tokens included
    rng = random.Random(23)
    docs = [
        (i, rng.choice(["hot", "cold"]) if rng.random() < 0.9 else "cold",
         rng.randint(1, 30))
        for i in range(300)
    ]
    budgets = {"hot": 900, "cold": 250}
    df = spark.createDataFrame(docs, "doc_id long, source string, n long")

    def snap(salt):
        return {
            r["doc_id"]: r["cum_tokens"]
            for r in mixture_sample(
                df, "doc_id", "source", "n", budgets, salt=salt
            ).collect()
        }

    base = snap(1)
    assert base  # non-trivial
    for salt in (2, 8, 32):
        assert snap(salt) == base, salt


def test_mixture_sample_salt_spreads_hot_source(spark):
    # phase 2's window must partition on (source, bucket) — the plan's
    # window hashpartitioning carries the bucket column, so a single hot
    # source spreads over `salt` reducers instead of one
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(
        [(i, "only", 5) for i in range(64)], "doc_id long, source string, n long"
    )
    out = mixture_sample(df, "doc_id", "source", "n", {"only": 10_000}, salt=16)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re

    assert re.search(r"hashpartitioning\([^)]*_mx_bucket", plan), plan
    with pytest.raises(ValueError):
        mixture_sample(df, "doc_id", "source", "n", {}, salt=3)
