"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Given a large raw web corpus and a (much smaller) trusted target corpus,
DSIR scores every raw document by the log importance weight
``log p_target(x) - log p_raw(x)`` under bag-of-hashed-n-grams unigram
models, then resamples the raw pool by those weights. It is the standard
pretraining-data selection recipe when you want "more documents like this
trusted set" without training a classifier. The reference has no
selection surface at all (it processes every PDF it sees); this family is
mandated by the round brief's training-data-pipeline posture.

Model: features are hashed unigrams + bigrams (lower, split on ``\\s+``,
bigrams space-joined) bucketed into ``n_buckets`` by the md5-60 hash —
the same Java∩RE2∩Python tokenization and the same hash trick every
other operator here uses, so the DuckDB oracle replays the whole
computation. Each side's bucket distribution is Laplace-smoothed:
``p[b] = (cnt[b] + 1) / (N + n_buckets)``.

Scale shape (100 TB posture):
- the explode shuffles (doc, bucket)-keyed PARTIAL counts (map-side
  combine collapses repeated grams before the exchange);
- the per-bucket distribution is bounded by ``n_buckets`` rows — it
  BROADCASTS; no corpus-sized relation ever sits driver-side;
- per-doc weights are one hash-agg keyed by doc id.
Nothing in the plan grows faster than (corpus tokens → bucketed counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import md5_60


def _tokens(text_col: Column) -> Column:
    """lower(text) split on \\s+, empties dropped."""
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != "")


def _gram_array(t: Column) -> Column:
    """Unigrams + space-joined bigrams from a MATERIALIZED token-array
    column. Pass a bound attribute (a projected column), NOT the raw
    ``_tokens(text)`` expression: Catalyst inlines the subtree into every
    ``element_at`` lambda with no CSE inside higher-order functions, so
    the document would be re-tokenized once per bigram index — O(tokens ×
    text-length) per row (the trap ``curation._ngrams_of`` documents; it
    made this operator ~20× slower than the tokenize itself). Guarded so
    single-token and empty docs produce no bigrams (Spark's
    sequence(1, 0) would otherwise count DOWN)."""
    bi = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(
                F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bi)


def dsir_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    is_target: Column | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document hashed-n-gram bucket counts:
    ``(id_col, _t boolean, bucket int, cnt bigint)``. ``is_target`` marks
    the trusted rows (default: none)."""
    flag = is_target if is_target is not None else F.lit(False)
    # two-step projection: _toks is referenced many times by _gram_array,
    # which blocks CollapseProject from re-inlining the tokenize
    ex = df.select(
        F.col(id_col), flag.alias("_t"), _tokens(F.col(text_col)).alias("_toks")
    ).select(
        id_col, "_t", F.explode(_gram_array(F.col("_toks"))).alias("gram")
    )
    return (
        ex.select(
            id_col, "_t",
            F.pmod(md5_60(F.col("gram")), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "_t", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    is_target: Column | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR log importance weight:
    ``(id_col, n_grams bigint, dsir_logw double)``.

    ``dsir_logw = Σ_b cnt[doc,b] * (ln p_target[b] - ln p_raw[b])`` where
    p_target counts only ``is_target`` rows and p_raw counts the whole
    pool (target included — the raw distribution is the pool being
    selected from). Zero-gram documents are dropped (no likelihood),
    matching lm_score's contract.
    """
    feats = dsir_features(df, id_col, text_col, is_target, n_buckets)
    stats = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), F.col("cnt")).otherwise(F.lit(0))).alias("ct"),
        F.sum("cnt").alias("cr"),
    )
    totals = stats.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    b = F.lit(float(n_buckets))
    lam = (
        stats.crossJoin(F.broadcast(totals))  # one-row totals: scalar join
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1.0) / (F.col("nt") + b))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + b))
            ).alias("lam"),
        )
    )
    return (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("lam")).alias("dsir_logw"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "dsir_logw",
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k resampling, deterministic: sampling k docs without
    replacement with probability ∝ exp(logw) is exactly taking the top k
    by ``logw + Gumbel(0,1)`` (the Gumbel-max trick), and the Gumbel draw
    comes from the md5-60 hash of (seed, id) so re-runs pick identical
    rows. Global top-k via TakeOrderedAndProject — no full sort."""
    u = (
        md5_60(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
        .cast("double")
        / F.lit(float(1 << 60))
    )
    # u in [0,1); shift by 2^-61 so ln(u) is finite even at u = 0.
    gumbel = -F.log(-F.log(u + F.lit(2.0 ** -61)))
    keyed = weights.withColumn("_gumbel_key", F.col(logw_col) + gumbel)
    return (
        keyed.orderBy(F.col("_gumbel_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_gumbel_key")
    )
