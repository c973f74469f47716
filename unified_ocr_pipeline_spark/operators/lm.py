"""CCNet-style statistical language-model quality filtering.

The reference pipeline gates documents on hand-written quality
heuristics only (``scripts/unified_ocr_pipeline.py:727-788`` — char/word
counts, confidence thresholds); a web-scale curation stack additionally
scores every document under a language model trained on a trusted or
self-sampled corpus and gates/buckets on perplexity (CCNet, Wenzek et
al. 2020; Gopher, Rae et al. 2021).  This module is that operator,
Spark-first and fully deterministic:

- ``lm_train``: unigram LM over a *deterministic hash sample* of the
  corpus (md5-60(id) % mod == 0, so re-runs and incremental batches pick
  the identical sample), vocabulary capped at top-V by (count desc,
  token) — a TakeOrderedAndProject, never a single-reducer global sort.
  Add-one smoothing: p(tok) = (c+1)/(N+V+1), OOV mass 1/(N+V+1).
- ``lm_score``: mean negative log-likelihood per document.  The LM is
  bounded by construction (≤ vocab_size rows), so it rides to executors
  as a broadcast dict and scoring is ONE narrow Arrow pass — token
  lookups vectorized via pandas ``.map`` + ``np.add.reduceat`` per-doc
  sums, no explode, no shuffle, no per-row Python.

At 100 TB: training touches only the hash sample (tunable mod), its
shuffle carries vocabulary-sized partial counts (map-side combine), and
scoring is embarrassingly parallel.  The whole computation replays in
ANSI SQL for the DuckDB oracle (same md5-60 sample, same smoothing).
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import md5_60

# ASCII-pinned: Spark's Java \s+ and the DuckDB oracle's RE2 \s+ are
# ASCII-only, so the Python side must not additionally split on Unicode
# whitespace (U+00A0 etc.) or train/score tokenize the same doc
# differently (same pin as operators/dedup.py _WS)
_WS = re.compile(r"\s+", re.ASCII)


def lm_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = 4,
    vocab_size: int = 4096,
) -> tuple[DataFrame, dict]:
    """Train a unigram LM on a deterministic hash sample of ``df``.

    Returns ``(lm, meta)`` where ``lm`` is a DataFrame
    ``(tok string, c bigint, logp double)`` with at most ``vocab_size``
    rows, and ``meta`` carries the smoothing scalars:
    ``n_tokens`` (sample token total, including out-of-vocab),
    ``vocab`` (actual vocabulary size ≤ vocab_size) and ``oov_logp``.

    Tokenization is lower + split on ``\\s+`` dropping empties — chosen
    because it means the same thing in Java regex (Spark), RE2 (DuckDB)
    and Python ``re``, so the oracle replays it exactly.
    """
    sample = df.where(md5_60(F.col(id_col)) % sample_mod == 0)
    toks = sample.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    # Two driver actions over the vocabulary-sized relation (not the
    # corpus): the token total and the capped vocabulary.  Same bounded
    # pattern as ivf.kmeans_train's sample collect.
    n_tokens = counts.agg(F.sum("c")).collect()[0][0] or 0
    vocab = counts.orderBy(F.col("c").desc(), "tok").limit(vocab_size)
    v = vocab.count()
    denom = float(n_tokens + v + 1)
    lm = vocab.withColumn(
        "logp", F.log((F.col("c") + F.lit(1.0)) / F.lit(denom))
    )
    meta = {
        "n_tokens": int(n_tokens),
        "vocab": int(v),
        "oov_logp": math.log(1.0 / denom),
        "sample_mod": sample_mod,
        "vocab_size": vocab_size,
    }
    return lm, meta


def lm_score(
    df: DataFrame,
    lm: DataFrame,
    meta: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: ``(id_col, n_tok bigint, nll double)``.

    ``nll`` is the mean negative log-probability of the document's
    tokens under ``lm`` (lower = more fluent under the corpus LM; CCNet
    buckets on exactly this).  Documents with zero tokens are dropped —
    they have no likelihood and the downstream gate already quarantines
    empties.

    The LM collect is bounded by ``vocab_size``; scoring is a single
    mapInPandas pass whose inner loop is pandas/NumPy (``Series.map`` on
    the token stream + ``add.reduceat`` per-doc segment sums), the same
    Arrow-batch kernel shape as operators/dedup's MinHash stage.
    """
    lut = {r["tok"]: r["logp"] for r in lm.select("tok", "logp").collect()}
    oov = float(meta["oov_logp"])
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tok_lists = [
                [t for t in _WS.split(s.lower()) if t]
                for s in pdf[text_col].fillna("").astype(str)
            ]
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            keep = lens > 0
            if not keep.any():
                continue
            ids = pdf[id_col].to_numpy()[keep]
            lens = lens[keep]
            flat = [t for toks, k in zip(tok_lists, keep) if k for t in toks]
            logps = (
                pd.Series(flat, dtype="object").map(lut).fillna(oov).to_numpy()
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(logps, starts)
            yield pd.DataFrame(
                {id_col: ids, "n_tok": lens, "nll": -sums / lens}
            )

    return df.mapInPandas(gen, schema=f"{id_col} {id_type}, n_tok bigint, nll double")


def lm_perplexity_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = 4,
    vocab_size: int = 4096,
    n_buckets: int = 4,
    exact: bool | None = None,
    exact_threshold: int = 1_000_000,
) -> DataFrame:
    """Train-and-score convenience: bucket documents by nll.

    Returns ``(id_col, n_tok, nll, ppl_bucket int)`` where bucket 1 is
    the most-fluent quartile (CCNet keeps head/middle buckets for
    training mixes).

    ``exact=True`` (the oracle/fixture-replayable form) ranks with ONE
    global ntile window — a single-reducer sort, fine at fixture scale,
    wrong at 100 TB.  ``exact=False`` is the scale path (same
    exact-vs-rate split as mixture_sample/mixture_rate): one
    ``percentile_approx`` aggregate computes the n_buckets-1 nll
    cutpoints in-plan, broadcast-cross-joined back, and each row buckets
    by comparison — all map-side after one partial-aggregated pass, no
    global sort, at the cost of approximate (not exactly equal-count)
    bucket boundaries.

    ``exact=None`` (the default) auto-switches on input size: one cheap
    count of the input relation (parquet count-star never materializes
    the payload columns), exact iff rows <= ``exact_threshold``.  Small
    fixtures therefore keep the ntile semantics the DuckDB oracle
    replays, while any corpus past the threshold — in particular
    anything 100 TB-shaped — takes the approx path and the plan never
    contains an unpartitioned Window.
    """
    from pyspark.sql import Window

    if exact is None:
        # Bounded driver action: one count job over id_col only.
        exact = df.select(id_col).count() <= exact_threshold
    lm, meta = lm_train(df, text_col, id_col, sample_mod, vocab_size)
    scored = lm_score(df, lm, meta, text_col, id_col)
    if exact:
        w = Window.orderBy(F.col("nll").asc(), F.col(id_col).asc())
        return scored.withColumn("ppl_bucket", F.ntile(n_buckets).over(w))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.agg(
        F.percentile_approx("nll", F.array(*[F.lit(q) for q in qs]), 10_000)
        .alias("_cuts")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (
            F.col("nll") > F.element_at(F.col("_cuts"), i + 1)
        ).cast("int")
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn("ppl_bucket", bucket)
        .drop("_cuts")
    )


def _clean_tokens(text_col: str) -> F.Column:
    """lower + ASCII-\\s+ split with empties dropped, as an ARRAY column
    (same token stream as lm_train/lm_score, but kept in-row so bigrams
    can be formed without a second pass)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def _bigram_structs(toks: F.Column) -> F.Column:
    """Array of (w1, w2) structs for consecutive token pairs — built by
    zipping the array against itself shifted by one, so the whole thing
    is a narrow JVM expression (no Python, no shuffle)."""
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def stupid_backoff_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = 4,
    bigram_min_count: int = 2,
) -> tuple[DataFrame, DataFrame, int]:
    """Count tables for a Stupid Backoff bigram LM (Brants et al. 2007,
    "Large Language Models in Machine Translation" — THE web-scale
    distributed LM: no normalization pass, just counts, served sharded).

    Trains on the same deterministic md5-60 hash sample as ``lm_train``
    (re-runs and incremental batches pick identical docs).  Returns
    ``(unigrams(w, c1), bigrams(w1, w2, c12), n_tokens)``.  Bigrams below
    ``bigram_min_count`` are dropped — Brants' count cutoff; it bounds
    the bigram relation and loses nothing the backoff path can't cover.

    Scale: both counts are ONE hash aggregation each with map-side
    partial combine; the bigram table stays a distributed relation
    end-to-end (never collected, never broadcast) — exactly how Brants
    serves 2-trillion-token models, and the deliberate contrast with the
    broadcast-dict unigram ``lm_score``.
    """
    sample = df.where(md5_60(F.col(id_col)) % sample_mod == 0).select(
        _clean_tokens(text_col).alias("toks")
    )
    uni = (
        sample.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    # Bounded driver action over the vocabulary-sized relation, same
    # pattern as lm_train's n_tokens.
    n_tokens = uni.agg(F.sum("c1")).collect()[0][0] or 0
    big = (
        sample.select(F.explode(_bigram_structs(F.col("toks"))).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .where(F.col("c12") >= bigram_min_count)
    )
    return uni, big, int(n_tokens)


def stupid_backoff_score(
    df: DataFrame,
    uni: DataFrame,
    big: DataFrame,
    n_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Score every document under the Stupid Backoff bigram model:
    ``(id_col, n_bigrams bigint, sb_logscore double)`` where
    ``sb_logscore`` is the mean log S over the doc's consecutive pairs,

        S(w2 | w1) = c12 / c1(w1)          if the bigram survived training
                   = alpha * c1(w2) / N    else, w2 in the sample vocab
                   = alpha * 1 / N         else (OOV floor)

    (Brants et al. 2007 §4; alpha = 0.4 is their constant.  Scores are
    NOT probabilities — Stupid Backoff never normalizes; rank order is
    what the curation gate consumes.)  Documents with < 2 tokens have no
    bigram evidence and are dropped, like ``lm_score`` drops empties.

    Plan shape: explode doc bigrams → shuffle-join the count tables on
    their natural keys → one doc-keyed hash agg.  All three relations
    stay distributed; at 100 TB the model side partitions by (w1, w2) /
    w like any fact-fact join — no driver collect, no broadcast of
    corpus-scaled state, no Python anywhere.
    """
    n = float(n_tokens)
    doc_bg = df.select(
        F.col(id_col), F.explode(_bigram_structs(_clean_tokens(text_col))).alias("bg")
    ).select(id_col, "bg.w1", "bg.w2")
    scored = (
        doc_bg.join(big, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("c_w1")), "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c_w2")), "w2", "left")
        .withColumn(
            "logs",
            F.when(
                F.col("c12").isNotNull(),
                F.log(F.col("c12").cast("double") / F.col("c_w1").cast("double")),
            ).otherwise(
                F.log(
                    F.lit(alpha) * F.coalesce(F.col("c_w2").cast("double"), F.lit(1.0)) / F.lit(n)
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.avg("logs").alias("sb_logscore")
    )
