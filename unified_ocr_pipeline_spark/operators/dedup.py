"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

All pure DataFrame/Column compositions (JVM-side, no Python UDFs): shingling
via ``transform``/``slice`` over split arrays, hashing via ``xxhash64``,
signatures via grouped ``min`` aggregates. Reference analog: the duplicate
-detection step (unified_ocr_pipeline.py:249-271) is exact-identity only;
the near-dup family is the web-scale generalization the round brief requires.

Scale notes (100 TB posture):
- exact: one hash-aggregate shuffle on the fingerprint; partial (map-side)
  aggregation applies.
- minhash: explode-by-shingle is the big intermediate; K permutations are
  computed as one array expression per row (no K-fold explode). LSH banding
  turns all-pairs into per-bucket pairs; the candidate verify step joins
  signatures only (small), never the full text.
- simhash: 32 per-bit sums in ONE grouped aggregation pass.
- ngram jaccard: classic shingle-inverted-index self-join; prune high-DF
  shingles (stopword shingles) before the join to bound the blowup.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_P = 2147483647  # Mersenne prime 2^31-1: (a*h+b) mod P stays < 2^62, ANSI-safe


def _seeded_coeffs(k: int, seed: int = 42) -> Tuple[List[int], List[int]]:
    import random

    rng = random.Random(seed)
    a = [rng.randrange(1, _P) for _ in range(k)]
    b = [rng.randrange(0, _P) for _ in range(k)]
    return a, b


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` as an array column.

    Guarded for short docs: Spark's ``sequence(1, 0)`` generates a
    DESCENDING [1, 0] rather than an empty array, so size < n must be
    special-cased to an empty result."""
    toks = F.split(F.trim(text), r"\s+")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        )
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group documents by content fingerprint; one row per group with the
    keeper (min id) and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>[num_hashes]) via K universal-hash permutations.

    One explode by shingle, then a single grouped aggregation computing all
    K mins element-wise (array of F.min exprs) — not K passes.
    """
    a, b = _seeded_coeffs(num_hashes, seed)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    h = F.pmod(F.xxhash64("shingle"), F.lit(_P))
    hashed = sh.select(
        "id",
        *[
            F.pmod(h * F.lit(a[i]) + F.lit(b[i]), F.lit(_P)).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    sigs: DataFrame,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified on signature agreement.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b and
    est_jaccard ≥ threshold. est_jaccard = fraction of equal signature
    positions (the standard MinHash estimator).
    """
    rows_per_band = num_hashes // num_bands

    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice("sig", i * rows_per_band + 1, rows_per_band)
                        ).alias("bh"),
                    )
                    for i in range(num_bands)
                ]
            )
        ).alias("b"),
    ).select("id", "sig", "b.band", "b.bh")

    left = bands.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bh"
    )
    right = bands.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bh"
    )
    cand = (
        left.join(right, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash bigint): per-bit majority vote over xxhash64(token).

    One explode + one grouped aggregation with ``bits`` sum expressions.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = F.xxhash64("tok")
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return bit_sums.select("id", sig.alias("simhash"))


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit simhash values (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    sig_df: DataFrame, max_hamming: int = 3, chunks: int = 4, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole on ``chunks`` bit-chunks (pairs
    within ``max_hamming ≤ chunks-1`` share ≥1 exact chunk), then verify
    the true hamming distance."""
    width = bits // chunks
    mask = (1 << width) - 1
    chunked = sig_df.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.chunk", "c.cv")
    l = chunked.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "cv"
    )
    r = chunked.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "cv"
    )
    return (
        l.join(r, ["chunk", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming32(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index self-join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets, computed with an
    inverted-index self-join. High-document-frequency shingles (> max_shingle_df)
    are pruned before the join — they explode the pair count while carrying
    no discriminative signal."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("set_size"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    sh = sh.join(F.broadcast(rare), "shingle")
    inter = (
        sh.alias("l")
        .join(sh.alias("r"), "shingle")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
