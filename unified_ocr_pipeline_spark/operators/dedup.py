"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Reference analog: the duplicate-detection step
(unified_ocr_pipeline.py:249-271) is exact-identity only; the near-dup
family is the web-scale generalization the round brief requires.

Scale notes (100 TB posture):
- exact: one hash-aggregate shuffle on the fingerprint; partial (map-side)
  aggregation applies.
- minhash / simhash signatures: ONE NumPy pass per Arrow batch — tokens are
  hashed at C speed and all K permutation mins (resp. all bit-majorities)
  for a whole batch are computed with ``np.minimum.reduceat`` /
  ``np.add.reduceat`` over per-doc segment boundaries. This replaced K=32
  interpreted Catalyst expressions per exploded shingle row (measured 6.0 s
  → sub-second at sf0.1; same remedy as similarity.lsh_bucket_keys_np).
  The signature hash is md5-based (first 60 bits of the digest): C-speed in
  Python via hashlib AND bit-for-bit reproducible in ANSI SQL
  (``('0x' || substr(md5(s),1,15))::BIGINT``), which is what lets the
  driver's DuckDB oracle replay the exact same math.
- LSH banding turns all-pairs into per-bucket pairs; the candidate verify
  step joins signatures only (small), never the full text.
- ngram jaccard: classic shingle-inverted-index self-join; prune high-DF
  shingles (stopword shingles) before the join to bound the blowup.
"""

from __future__ import annotations

import hashlib
import re as _re
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_P = 2147483647  # Mersenne prime 2^31-1: (a*h+b) mod P stays < 2^62, ANSI-safe

# ASCII-pinned whitespace split, identical to the RE2/Java '\s+' class the
# SQL mirrors use (Python's default str.split also strips unicode spaces,
# which SQL engines' '\s' does not match)
_WS = _re.compile(r"\s+", _re.ASCII)


def _seeded_coeffs(k: int, seed: int = 42) -> Tuple[List[int], List[int]]:
    import random

    rng = random.Random(seed)
    a = [rng.randrange(1, _P) for _ in range(k)]
    b = [rng.randrange(0, _P) for _ in range(k)]
    return a, b


def _md5_60(data: bytes) -> int:
    """First 15 hex chars of md5 as an int — equals
    ``int(md5_hexdigest[:15], 16)`` == SQL ``('0x'||substr(md5(s),1,15))::BIGINT``
    (15 hex chars = the first 8 digest bytes big-endian, dropping the low
    nibble: 60 bits, always < 2^63)."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big") >> 4


def _spread_for_python_stage(df: DataFrame) -> DataFrame:
    """Ensure a CPU-bound Python kernel stage sees at least one partition
    per core. A sub-128MB bench file scans as ONE partition, serializing
    the signature kernel on a single Python worker; the shuffle this adds
    is trivial next to the kernel. At 100 TB the scan already yields
    thousands of partitions and this is a no-op.

    The partition-count probe (``df.rdd``) is only taken when the plan is
    shuffle-free: under AQE, materializing the RDD of a plan that contains
    exchanges EXECUTES every upstream shuffle stage just to learn a count
    (and that work is re-done by the real action — no stage reuse across
    separate query executions). A plan that already shuffled runs at
    ``spark.sql.shuffle.partitions`` width anyway, so the probe is both
    expensive and pointless there.

    Shuffle detection walks the optimized logical plan's NODE NAMES (a
    TreeNode method, stable across Spark 3/4), not the rendered plan text —
    a string literal like ``col == 'Join'`` in a filter can no longer
    disable the spread. If the JVM walk fails (e.g. Spark Connect, where
    ``_jdf`` is absent), we skip the spread — the fail-safe direction:
    worst case the kernel runs on fewer partitions, never a wrong result."""
    p = df.sparkSession.sparkContext.defaultParallelism
    try:
        if _plan_has_shuffling_node(df):
            return df
    except Exception:
        return df
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


_SHUFFLING_NODES = frozenset(
    {
        "Join",
        "Aggregate",
        "Window",
        "Sort",
        "Repartition",
        "RepartitionByExpression",
        "RebalancePartitions",
        "Distinct",
        "Deduplicate",
        "Intersect",
        "Except",
        "GlobalLimit",
    }
)


def _plan_has_shuffling_node(df: DataFrame) -> bool:
    """Walk the optimized logical plan tree and test node names against the
    shuffle-introducing operator set."""
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() in _SHUFFLING_NODES:
            return True
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return False


def _tokens(text) -> List[str]:
    if not isinstance(text, str):
        return []
    t = text.strip(" \t\n\r\f\v")
    return _WS.split(t) if t else []


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` as an array column.

    Built by zip_with-folding the token array against its k-shifted tails
    (all zip_with ARGUMENTS, evaluated once per row) instead of a
    ``transform(idx, i -> slice(toks, i, n))`` lambda: a lambda capturing
    the raw split expression re-evaluates the split once per shingle
    (Catalyst inlines the subtree; no CSE inside higher-order functions).
    zip_with pads the shorter tail with null and concat_ws skips nulls, so
    trailing entries hold partial shingles — the final slice drops them.

    Guarded for short docs: Spark's ``sequence(1, 0)`` generates a
    DESCENDING [1, 0] rather than an empty array, so size < n must be
    special-cased to an empty result."""
    toks = F.split(F.trim(text), r"\s+")
    acc = toks
    for k in range(1, n):
        tail = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(1)))
        acc = F.zip_with(acc, tail, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(acc, 1, F.size(toks) - (n - 1))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(full)
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
    """(id, sig array<bigint>[num_hashes]) via K universal-hash permutations
    over distinct word n-gram shingles: ``min((a_i·h + b_i) mod P)``.

    Vectorized: one NumPy pass per Arrow batch. Shingle hashes for the
    whole batch form one (n_shingles,) vector; all K permutations are one
    broadcasted (n_shingles × K) multiply-add; per-doc mins fall out of a
    single ``np.minimum.reduceat`` over doc segment boundaries. No
    per-shingle explode, no shuffle until the caller's banding join.
    Docs with fewer than ``shingle_n`` tokens produce no signature row
    (same as the explode formulation — nothing to hash).
    """
    import numpy as np
    import pandas as pd

    a, b = _seeded_coeffs(num_hashes, seed)
    a_v = np.asarray(a, dtype=np.int64)
    b_v = np.asarray(b, dtype=np.int64)
    in_df = _spread_for_python_stage(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: List = []
            starts: List[int] = []
            all_sh: List[str] = []
            for doc_id, text in zip(pdf["id"], pdf["text"]):
                toks = _tokens(text)
                if len(toks) < shingle_n:
                    continue
                shingles = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
                ids.append(doc_id)
                starts.append(len(all_sh))
                all_sh.extend(shingles)
            if not ids:
                continue
            # Per-doc sets preserve the distinct-shingle semantics; the md5
            # itself runs once per batch-wide unique shingle (near-dup docs
            # share most of their shingles) and is gathered back per slot.
            uniq, inv = np.unique(
                np.asarray(all_sh, dtype=object), return_inverse=True
            )
            uh = np.fromiter(
                (_md5_60(s.encode("utf-8")) % _P for s in uniq),
                dtype=np.int64,
                count=len(uniq),
            )
            h = uh[inv]
            # (n_shingles × K); h,a < P < 2^31 so h*a < 2^62 — no overflow
            perms = (h[:, None] * a_v[None, :] + b_v[None, :]) % _P
            mins = np.minimum.reduceat(perms, np.asarray(starts), axis=0)
            yield pd.DataFrame({"id": ids, "sig": list(mins)})

    id_type = in_df.schema["id"].dataType.simpleString()
    return in_df.mapInPandas(gen, schema=f"id {id_type}, sig array<bigint>")


def lsh_collision_prob(similarity: float, num_bands: int, rows_per_band: int) -> float:
    """P(candidate) for a pair at Jaccard ``similarity`` under (b, r)
    banding: ``1 - (1 - s^r)^b`` — the standard S-curve (Mining of
    Massive Datasets §3.4)."""
    return 1.0 - (1.0 - similarity ** rows_per_band) ** num_bands


def lsh_plan(
    threshold: float,
    num_hashes: int = 64,
    fn_weight: float = 1.0,
) -> tuple[int, int]:
    """Pick (num_bands, rows_per_band) for :func:`minhash_lsh_pairs` so
    the banding S-curve's knee sits at ``threshold``.

    Enumerates every exact factorization b*r = num_hashes (there are
    ~d(num_hashes) of them — driver-side arithmetic, not a data op) and
    minimizes estimated error mass: the integral of the miss rate above
    the threshold (false negatives, weighted ``fn_weight``) plus the
    collision rate below it (false positives — wasted verify work, not
    wrong answers, hence weight 1).  Trapezoid on a fixed 101-point
    grid keeps the choice deterministic across platforms.

    At 100 TB the tradeoff is asymmetric: a false positive costs one
    verification join row, a false negative silently keeps a duplicate
    — raise ``fn_weight`` to bias toward recall.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    grid = [i / 100.0 for i in range(101)]
    best: tuple[float, int, int] | None = None
    for r in range(1, num_hashes + 1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        err = 0.0
        for lo, hi in zip(grid, grid[1:]):
            mid = (lo + hi) / 2.0
            p = lsh_collision_prob(mid, b, r)
            err += 0.01 * (fn_weight * (1.0 - p) if mid >= threshold else p)
        key = (err, b, r)
        if best is None or key < best:
            best = key
    assert best is not None
    return best[1], best[2]


def _band_explode(sigs: DataFrame, num_hashes: int, num_bands: int) -> DataFrame:
    """(id, sig, band, bh): one row per signature band, bh = 64-bit hash of
    the band's signature slice. Shared by the self-join and the
    incremental (new-vs-corpus) banding joins."""
    rows_per_band = num_hashes // num_bands
    return sigs.select(
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


def _cap_flood_buckets(bands: DataFrame, max_band_bucket: int) -> DataFrame:
    """Drop band buckets larger than the cap (quadratic-join guard). The
    count window partitions on the join key — no extra exchange."""
    bsz = F.count("*").over(Window.partitionBy("band", "bh"))
    return bands.withColumn("_bsz", bsz).where(
        F.col("_bsz") <= max_band_bucket
    ).drop("_bsz")


def _est_jaccard(num_hashes: int) -> Column:
    """Fraction of equal positions between sig_a and sig_b columns — the
    standard MinHash Jaccard estimator."""
    return F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))


def minhash_lsh_pairs(
    sigs: DataFrame,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
    max_band_bucket: Optional[int] = None,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified on signature agreement.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b and
    est_jaccard ≥ threshold. est_jaccard = fraction of equal signature
    positions (the standard MinHash estimator).

    The signature DataFrame feeds BOTH sides of the banding self-join;
    without materialization Spark evaluates the (Python-stage) signature
    subtree twice. Persisted here — at petabyte scale you'd write the
    signature table out once and join against the stored copy, which is
    the same decision.

    ``max_band_bucket`` guards the 100 TB flood hazard: a cluster of
    near-identical documents collides in every band, making that band
    bucket's self-join quadratic (10⁶ copies → 10¹² candidate pairs).
    Buckets larger than the cap are dropped from the candidate join —
    same posting-list pruning as ``ngram_jaccard_pairs``'s
    ``max_shingle_df``; exact-duplicate floods belong to exact_dedup
    upstream, not to the near-dup join. The count window partitions on
    the join key, so no extra exchange.
    """
    from pyspark.storagelevel import StorageLevel

    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    bands = _band_explode(sigs, num_hashes, num_bands)
    if max_band_bucket is not None:
        bands = _cap_flood_buckets(bands, max_band_bucket)

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
    return (
        cand.withColumn("est_jaccard", _est_jaccard(num_hashes))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


def minhash_lsh_pairs_between(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
    max_band_bucket: Optional[int] = None,
) -> DataFrame:
    """Incremental dedup: band-join a NEW batch's signatures against a
    stored CORPUS signature table instead of self-joining everything.

    The continuous-crawl pattern at 100 TB: the historical corpus's
    signatures (and their band hashes) are computed once and stored; each
    nightly batch computes only its own signatures and probes the stored
    bands. Cost is O(|new| + matching band buckets), not O(|corpus|²) —
    re-running the full self-join nightly would redo petabytes of work
    for a terabyte of novelty.

    Returns (new_id, corpus_id, est_jaccard ≥ threshold). A new doc that
    matches ANY corpus doc is a duplicate; the caller typically anti-joins
    ``select(new_id)`` against the batch. ``max_band_bucket`` caps
    corpus-side band buckets (boilerplate floods collide every batch
    forever — they belong to an exact-dup/blocklist path upstream).
    """
    corpus_bands = _band_explode(corpus_sigs, num_hashes, num_bands)
    if max_band_bucket is not None:
        corpus_bands = _cap_flood_buckets(corpus_bands, max_band_bucket)
    # No persist: unlike the self-join, each signature table feeds exactly
    # one side of one join, so nothing is evaluated twice.
    new_bands = _band_explode(new_sigs, num_hashes, num_bands)

    left = new_bands.select(
        F.col("id").alias("new_id"), F.col("sig").alias("sig_a"), "band", "bh"
    )
    right = corpus_bands.select(
        F.col("id").alias("corpus_id"), F.col("sig").alias("sig_b"), "band", "bh"
    )
    cand = (
        left.join(right, ["band", "bh"])
        .select("new_id", "corpus_id", "sig_a", "sig_b")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    return (
        cand.withColumn("est_jaccard", _est_jaccard(num_hashes))
        .where(F.col("est_jaccard") >= threshold)
        .select("new_id", "corpus_id", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 48) -> DataFrame:
    """(id, simhash bigint): per-bit majority vote over the low ``bits`` of
    the 60-bit md5 token hash.

    ``bits`` defaults to 48 (not the toy 32): with B-bit signatures and
    W = B/chunks-bit pigeonhole chunks, UNRELATED docs collide a chunk by
    chance with probability ~chunks/2^W per pair, so 8-bit chunks (B=32)
    put ~n/256 docs in every chunk bucket and the candidate self-join goes
    quadratic; 12-bit chunks (B=48) cut chance bucket occupancy 16× while
    the md5 hash still has 60 usable bits. Measured at sf0.1: the
    pigeonhole join's candidate count drops ~200×.

    Vectorized like :func:`minhash_signatures`: one (n_tokens × bits) bit
    matrix per Arrow batch, per-doc ±1 votes summed with a single
    ``np.add.reduceat`` over doc boundaries — replaces 32 interpreted sum
    aggregates per exploded token row. Docs with no tokens produce no row
    (the explode formulation dropped them the same way).
    """
    import numpy as np
    import pandas as pd

    shifts = np.arange(bits, dtype=np.int64)
    weights = (np.int64(1) << shifts).astype(np.int64)
    in_df = _spread_for_python_stage(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: List = []
            starts: List[int] = []
            all_toks: List[str] = []
            for doc_id, text in zip(pdf["id"], pdf["text"]):
                toks = [t for t in _tokens(text) if t]
                if not toks:
                    continue
                ids.append(doc_id)
                starts.append(len(all_toks))
                all_toks.extend(toks)
            if not ids:
                continue
            # Zipfian token streams repeat heavily: md5 only the batch
            # vocabulary (C-speed np.unique), then gather per position —
            # ~50x fewer hashlib calls than hashing the raw stream, with
            # bit-identical hash values (the oracle replays the same md5).
            uniq, inv = np.unique(
                np.asarray(all_toks, dtype=object), return_inverse=True
            )
            uh = np.fromiter(
                (_md5_60(t.encode("utf-8")) for t in uniq),
                dtype=np.int64,
                count=len(uniq),
            )
            # Bit-extract on the (tiny) unique-hash matrix, then one gather
            # for the token stream; the ±1 vote sum folds into 2·Σbits − n,
            # so the only stream-sized temporaries are the gather and the
            # reduceat output — not the five shift/and/mul/sub intermediates
            # of the naive formulation (measured 6x on this step).
            bits_u = ((uh[:, None] >> shifts[None, :]) & 1).astype(np.int64)
            starts_v = np.asarray(starts)
            bit_sums = np.add.reduceat(bits_u[inv], starts_v, axis=0)
            n_tok = np.diff(np.append(starts_v, len(inv)))
            votes = 2 * bit_sums - n_tok[:, None]
            sig = ((votes > 0).astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame({"id": ids, "simhash": sig})

    id_type = in_df.schema["id"].dataType.simpleString()
    return in_df.mapInPandas(gen, schema=f"id {id_type}, simhash bigint")


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash values (bit_count of xor; width
    agnostic — the name is historical)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    sig_df: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    bits: int = 48,
    max_chunk_bucket: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole on ``chunks`` bit-chunks (pairs
    within ``max_hamming ≤ chunks-1`` share ≥1 exact chunk), then verify
    the true hamming distance. ``sig_df`` is persisted — it feeds both
    sides of the chunk-collision self-join (same reasoning as
    :func:`minhash_lsh_pairs`). ``max_chunk_bucket`` prunes flood buckets
    (identical-hash clusters) before the quadratic self-join — see
    :func:`minhash_lsh_pairs`."""
    from pyspark.storagelevel import StorageLevel

    sig_df = sig_df.persist(StorageLevel.MEMORY_AND_DISK)
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
    if max_chunk_bucket is not None:
        bsz = F.count("*").over(Window.partitionBy("chunk", "cv"))
        chunked = chunked.withColumn("_bsz", bsz).where(
            F.col("_bsz") <= max_chunk_bucket
        ).drop("_bsz")
    l = chunked.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "cv"
    )
    r = chunked.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "cv"
    )
    # hamming is a pure function of the pair, so the cheap bit_count filter
    # runs BEFORE dropDuplicates: the dedup exchange then carries the
    # passing pairs instead of every chunk-collision candidate — 234k vs
    # 2.7M rows measured at sf0.1 (clustered vocabularies collide chunks
    # far more often than they pass the full-hash bound)
    return (
        l.join(r, ["chunk", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming32(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
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
    from pyspark.storagelevel import StorageLevel

    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds sizes, DF-prune, and both join sides
    sizes = sh.groupBy("id").agg(F.count("*").alias("set_size"))
    # Broadcast the OVER-threshold flood set, never its complement: pigeonhole
    # bounds it at total_shingles / max_shingle_df distinct strings, while the
    # rare set is ~every distinct shingle in the corpus (billions at 100 TB).
    # Same direction as line_dedup's over-threshold anti (curation.py). The
    # plain count(*) partial-aggregates map-side, so no DF-count salt needed.
    flood = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_shingle_df)
        .select("shingle")
    )
    sh = sh.join(F.broadcast(flood), "shingle", "left_anti")
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


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Directed near-containment over word n-gram shingle sets:
    ``containment(src → dst) = |S(src) ∩ S(dst)| / |S(src)|``.

    Symmetric Jaccard misses the mirror/quote case — a 200-word article
    pasted inside a 5,000-word page has Jaccard ≈ 0.04 but containment
    ≈ 1.0 from the article side.  Crawl dedup wants exactly this
    asymmetry (Broder's containment coefficient; suffix-array dedup
    papers gate on it), so the operator emits BOTH directions of each
    intersecting pair and filters on the directed score.

    Same scale posture as :func:`ngram_jaccard_pairs`: inverted-index
    self-join on shingles, flood shingles (> max_shingle_df) broadcast
    as an over-threshold set and anti-joined (pigeonhole-bounded, never
    the complement), one hash-agg for intersections.  The two directions
    come from the same undirected intersection relation — no second
    join."""
    from pyspark.storagelevel import StorageLevel

    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy("id").agg(F.count("*").alias("set_size"))
    flood = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_shingle_df)
        .select("shingle")
    )
    pruned = sh.join(F.broadcast(flood), "shingle", "left_anti")
    inter = (
        pruned.alias("l")
        .join(pruned.alias("r"), "shingle")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sized = inter.join(
        sizes.withColumnRenamed("id", "id_a").withColumnRenamed(
            "set_size", "size_a"
        ),
        "id_a",
    ).join(
        sizes.withColumnRenamed("id", "id_b").withColumnRenamed(
            "set_size", "size_b"
        ),
        "id_b",
    )
    # both directions via ONE explode, not a union: a union would
    # duplicate the entire inverted-index join subtree per branch (the
    # plan doubles; only runtime exchange reuse saves it), while the
    # 2-element array explode keeps a single subtree
    directed = sized.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"),
                    F.col("id_b").alias("dst"),
                    F.round(F.col("inter") / F.col("size_a"), 4).alias(
                        "containment"
                    ),
                ),
                F.struct(
                    F.col("id_b").alias("src"),
                    F.col("id_a").alias("dst"),
                    F.round(F.col("inter") / F.col("size_b"), 4).alias(
                        "containment"
                    ),
                ),
            )
        ).alias("d")
    ).select("d.src", "d.dst", "d.containment")
    return directed.where(F.col("containment") >= threshold)


# ---------------------------------------------------------------------------
# Exact substring duplication (k-gram coverage)
# ---------------------------------------------------------------------------

def positioned_shingles(text: Column, k: int) -> Column:
    """ALL word k-gram shingles of ``text`` in document order (duplicates
    kept, unlike :func:`word_shingles` — position matters here). Same
    zip_with fold; the i-th array element is the k-gram starting at token
    i (0-based after explode via posexplode). Regex ws-trim (not F.trim,
    which strips spaces only) so the token recipe matches functions/text
    and the SQL oracles."""
    toks = F.split(F.regexp_replace(text, r"^\s+|\s+$", ""), r"\s+")
    acc = toks
    for j in range(1, k):
        tail = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1)))
        acc = F.zip_with(acc, tail, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(acc, 1, F.size(toks) - (k - 1))
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(full)


def substring_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    max_gram_df: Optional[int] = None,
) -> DataFrame:
    """Exact substring-duplication coverage per document — the scalable
    k-gram form of exact-substring dedup (Lee et al. 2021,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better"): a token position is *duplicated* iff it lies inside some
    word k-gram that also occurs in ANOTHER document. The paper's
    suffix-array construction is single-node-RAM-bound; the k-gram
    relaxation (any shared run >= k tokens is caught, shorter ones are
    not) is the standard distributed substitute and needs only
    hash-agg + join machinery.

    Returns one row per input document:
    (id, n_tokens int, n_dup_grams long, covered_tokens long, dup_bp long)
    where ``dup_bp`` = floor(covered/n_tokens * 10000) — integer basis
    points, so the DuckDB oracle matches bit-for-bit with no
    rounding-mode question.

    Scale shape: the gram explode is map-side (k-gram build is a JVM
    zip_with fold, no Python). Cross-doc grams are found with ONE
    shuffle of the gram table keyed by the 60-bit gram hash: a gram is
    cross-document iff min(id) != max(id) over its hash partition —
    computed as an unbounded window, so the expensive gram-build fold
    runs ONCE and there is no join-back against a corpus-sized dup set
    (the original agg+join form recomputed the fold per branch and paid
    two extra gram-scale exchanges; this form measured 1.5x faster at
    sf0.1, 8.3 -> 5.6 s fully materialized). Coverage and gram counts
    then come from ONE doc-keyed window+agg over the dup starts: since
    (id, start) is unique, covered tokens is the interval-union length
    sum(min(k, gap-to-next-start)) — no k-way position explode, no
    count_distinct Expand. ``max_gram_df`` (distinct-doc cap, skips
    boilerplate floods — same guard family as line_dedup /
    ngram_jaccard) needs a per-hash distinct count, which the window
    form can't express, so that path keeps the agg+join plan.
    """
    from .sampling import md5_60

    trimmed = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.split(trimmed, r"\s+")
    n_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(toks)
    ).cast("int")
    base = df.select(
        F.col(id_col).alias("id"),
        n_tokens.alias("n_tokens"),
        positioned_shingles(F.col(text_col), k).alias("_grams"),
    )
    g = base.select(
        "id", F.posexplode("_grams").alias("start", "gram")
    ).select("id", "start", md5_60(F.col("gram")).alias("h"))

    if max_gram_df is None:
        wh = Window.partitionBy("h")
        dup_starts = (
            g.withColumn("_min_id", F.min("id").over(wh))
            .withColumn("_max_id", F.max("id").over(wh))
            .where(F.col("_min_id") != F.col("_max_id"))
            .select("id", "start")
        )
    else:
        dup_filter = (F.count_distinct("id") >= 2) & (
            F.count_distinct("id") <= max_gram_df
        )
        dups = (
            g.groupBy("h").agg(dup_filter.alias("_keep")).where("_keep").select("h")
        )
        dup_starts = g.join(dups, "h").select("id", "start")

    # Coverage = |union of [start, start+k-1] intervals|. (id, start) is
    # unique in dup_starts (posexplode emits each position once; both the
    # window filter and the dups semi-join only drop rows), so with starts
    # sorted the union length is sum(min(k, next_start - start)) with k for
    # the last interval — ONE window pass over m rows instead of exploding
    # m*k position rows and paying a double count_distinct Expand (2m*k
    # rows into the final exchange; 16x fewer rows at the default k=8).
    w_doc = Window.partitionBy("id").orderBy("start")
    gap = F.lead("start").over(w_doc) - F.col("start")
    seg = F.when(gap.isNull(), F.lit(k)).otherwise(F.least(F.lit(k), gap))
    per_doc = (
        dup_starts.withColumn("_seg", seg)
        .groupBy("id")
        .agg(
            F.sum("_seg").alias("covered_tokens"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
    )
    return (
        base.select("id", "n_tokens")
        .join(per_doc, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.when(F.col("n_tokens") == 0, F.lit(0))
            .otherwise(
                F.floor(
                    F.coalesce("covered_tokens", F.lit(0))
                    * F.lit(10000.0)
                    / F.col("n_tokens")
                )
            )
            .cast("long")
            .alias("dup_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered exact anti-join
# ---------------------------------------------------------------------------

_BLOOM_SEED = 0x9E3779B9  # second xxhash64 seed for double hashing


def build_bloom_bitmap(
    df: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 5
):
    """Build a Bloom-filter bitmap over ``df[key_col]`` as a NumPy uint8
    array of ``num_bits / 8`` bytes (``num_bits`` must be a power of two).

    Hashing is JVM-side (two independent ``xxhash64`` seeds per key,
    whole-stage codegen); Python only sets bits per Arrow batch with
    vectorized double hashing pos_i = (h1 + i*h2) mod m (Kirsch &
    Mitzenmacher 2006 — two hashes simulate k). Each scan partition
    yields ONE bitmap row; the driver ORs them. Driver traffic is
    partitions x m/8 bytes, independent of row count — at cluster scale
    feed the per-partition bitmaps through a two-level OR (bitmap rows
    grouped mod R, applyInPandas OR, then driver) if partitions x m/8
    exceeds driver memory.
    """
    import numpy as np
    import pandas as pd

    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
    m = num_bits

    hashed = df.select(
        F.xxhash64(F.col(key_col)).alias("h1"),
        F.xxhash64(F.col(key_col), F.lit(_BLOOM_SEED)).alias("h2"),
    )

    def one_bitmap_per_partition(batches: Iterator["pd.DataFrame"]):
        bm = np.zeros(m // 8, dtype=np.uint8)
        empty = True
        for pdf in batches:
            empty = False
            h1 = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(num_hashes):
                pos = (h1 + np.uint64(i) * h2) & np.uint64(m - 1)
                np.bitwise_or.at(
                    bm,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        if not empty:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = hashed.mapInPandas(one_bitmap_per_partition, "bm binary").collect()
    out = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out


def bloom_anti_join(
    new_df: DataFrame,
    corpus_df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT anti-join of ``new_df`` against ``corpus_df`` on ``key_col``,
    prefiltered by a Bloom filter — the standard continuous-crawl shape:
    the incoming batch is small, the stored corpus is 100 TB, and a plain
    anti-join would shuffle (or at least scan + hash) the corpus per
    batch. Here the corpus is folded once into an m-bit bitmap (bounded
    bytes, not rows, through the driver), broadcast, and each new row is
    tested map-side: a clear bit proves the key is NOT in the corpus
    (bloom filters have no false negatives), so those rows pass with NO
    join at all. Only the bloom-POSITIVE residue — true duplicates plus
    ~fpp false positives — goes through the exact left-anti join, which
    guarantees the final result equals the plain anti-join bit-for-bit.

    Null keys never match an anti-join on either engine, so they pass
    through whichever path they take. Returns ``new_df``'s columns.

    Sibling: ``operators/sampling.bloom_build``/``bloom_probe`` keep the
    filter as a DataFrame of packed words (persistable, driver-free,
    SQL-bit-replayable) for callers who want the membership report
    itself rather than an exact anti-join.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = num_bits
    bitmap = build_bloom_bitmap(corpus_df, key_col, num_bits, num_hashes)
    bc = new_df.sparkSession.sparkContext.broadcast(bitmap.tobytes())

    # NB: no type hints — `from __future__ import annotations` stringifies
    # them and pandas_udf's hint inference can't resolve locally-imported
    # pd; hint-less defaults to the scalar eval type.
    @pandas_udf("boolean")
    def maybe_in_corpus(h1s, h2s):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        h1 = h1s.to_numpy(dtype=np.int64).view(np.uint64)
        h2 = h2s.to_numpy(dtype=np.int64).view(np.uint64)
        res = np.ones(len(h1), dtype=bool)
        for i in range(num_hashes):
            pos = (h1 + np.uint64(i) * h2) & np.uint64(m - 1)
            bit = (
                bm[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1)
            res &= bit.astype(bool)
        return pd.Series(res)

    flagged = new_df.withColumn(
        "_maybe",
        maybe_in_corpus(
            F.xxhash64(F.col(key_col)), F.xxhash64(F.col(key_col), F.lit(_BLOOM_SEED))
        ),
    )
    definite_new = flagged.where(~F.col("_maybe")).drop("_maybe")
    residual = (
        flagged.where(F.col("_maybe"))
        .drop("_maybe")
        .join(corpus_df.select(F.col(key_col)).distinct(), key_col, "left_anti")
    )
    return definite_new.unionByName(residual)


def mirror_hosts(
    df: DataFrame,
    url_col: str,
    text_col: str,
    min_hosts: int = 2,
) -> DataFrame:
    """Cross-host mirror detection: content served verbatim from two or
    more hosts (mirrors, CDNs with distinct hostnames, scraper farms
    republishing a corpus). Exact-duplicate text on ONE host is
    ordinary dedup; the same bytes on many hosts is a site-level signal
    the crawl frontier should know about (fetch one mirror, not all).

    Returns (fingerprint, n_hosts, n_urls, hosts) per mirrored content
    group: md5 of the text, distinct host count, total urls, and the
    sorted distinct host list as an array.

    Scale shape: host extraction is a JVM regexp; the group-by keys on
    the content hash with map-side partial aggregation (collect_set
    stays bounded because a flood of hosts serving one byte-identical
    payload is exactly what we're reporting — and min_hosts prunes the
    long tail of unmirrored content before any output materializes).
    """
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/?#]+)", 1)
    g = (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), host.alias("host"))
        .groupBy("fingerprint")
        .agg(
            F.count_distinct("host").alias("n_hosts"),
            F.count("*").alias("n_urls"),
            F.array_sort(F.collect_set("host")).alias("hosts"),
        )
        .where(F.col("n_hosts") >= min_hosts)
    )
    return g


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 4,
    block_col: str | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez & Stolfo 1995,
    the Merge/Purge method): sort records by a blocking key and emit every
    pair within ``window`` consecutive positions as a match candidate —
    the classic entity-resolution blocking step when LSH doesn't apply
    (short structured keys: names, addresses, titles).

    Emits (id_a, key_a, id_b, key_b) with id_a the earlier record in
    (key, id) sort order; each pair appears exactly once. Output is
    ~(window-1) x input rows, independent of how skewed the key
    distribution is — that bounded fan-out (vs hash blocking's quadratic
    hot buckets) is the method's selling point.

    Scale shape: with ``block_col`` (the standard multi-pass/blocked SNM
    variant) the sort is a per-block window — each block sorts on its own
    reducer and pairs never span blocks; pass e.g. a language, a key
    prefix, or a registered domain, and run multiple passes with
    different keys to recover cross-block recall, as the paper
    prescribes. Without it the window is global: ONE reducer sees every
    row — fine per-shard or on dimension-sized inputs, a scale-killer on
    a corpus (so callers must opt into it consciously).

    The neighbor collection is window-1 ``lead`` expressions evaluated in
    a single WindowExec pass (no self-join, no explode of the corpus):
    each row carries its next window-1 (id, key) structs, then one narrow
    posexplode emits the pairs map-side.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    parts = [block_col] if block_col else []
    w = Window.partitionBy(*parts).orderBy(F.col(key_col), F.col(id_col))
    nbrs = [
        F.lead(F.struct(F.col(id_col).alias("id"), F.col(key_col).alias("key")), i)
        .over(w)
        .alias(f"_nb{i}")
        for i in range(1, window)
    ]
    wide = df.select(
        F.col(id_col).alias("id_a"), F.col(key_col).alias("key_a"), *nbrs
    )
    nb = F.explode(F.array(*[F.col(f"_nb{i}") for i in range(1, window)])).alias(
        "_nb"
    )
    return (
        wide.select("id_a", "key_a", nb)
        .where(F.col("_nb").isNotNull())
        .select(
            "id_a",
            "key_a",
            F.col("_nb.id").alias("id_b"),
            F.col("_nb.key").alias("key_b"),
        )
    )


def edit_similarity(a: Column, b: Column) -> Column:
    """Normalized edit similarity ``1 - levenshtein(a,b)/max(len(a),len(b))``
    (1.0 when both strings are empty, 0 similarity against NULL treated as
    ''). Pure JVM expression — Spark's codegen'd Levenshtein — so a verify
    pass over candidate pairs stays inside WholeStageCodegen with zero
    Python and zero extra shuffle."""
    a = F.coalesce(a, F.lit(""))
    b = F.coalesce(b, F.lit(""))
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(a, b).cast("double") / denom.cast("double")
    )


def edit_verified_pairs(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    match_threshold: float = 0.85,
    possible_threshold: float = 0.6,
) -> DataFrame:
    """Match-scoring stage of a record-linkage pipeline (the step after
    blocking in Merge/Purge / Fellegi-Sunter practice): score each
    candidate pair from :func:`sorted_neighborhood_pairs` (or any blocking
    method) by normalized edit similarity of its key strings and classify
    ``match`` / ``possible`` / ``nonmatch`` by the two thresholds —
    'possible' is the clerical-review band of the Fellegi-Sunter decision
    rule, collapsed here to a deterministic similarity cut.

    Scale shape: the candidate relation is ~(window-1)x the corpus (SNM)
    or bucket-bounded (LSH), and this stage adds NO shuffle and NO Python
    to it — one codegen'd projection computing Levenshtein on the key
    strings the blocking stage already carries (no join back to the
    corpus). Edit distance is O(|a|·|b|), so keys should be short derived
    strings (titles, name+address lines), never whole documents — that is
    standard linkage practice, not a limitation of the plan.

    Reference analog: unified_ocr_pipeline.py's duplicate check is exact
    file identity; this is the fuzzy-identity generalization a web corpus
    needs for metadata records (citations, product listings, directory
    rows).
    """
    if not (0.0 <= possible_threshold <= match_threshold <= 1.0):
        raise ValueError(
            f"need 0 <= possible_threshold <= match_threshold <= 1, got "
            f"{possible_threshold}, {match_threshold}"
        )
    sim = edit_similarity(F.col(key_a), F.col(key_b))
    return pairs.withColumn("similarity", sim).withColumn(
        "decision",
        F.when(F.col("similarity") >= match_threshold, F.lit("match"))
        .when(F.col("similarity") >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("nonmatch")),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    prefix_chars: int = 400,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every character ``k``-gram, slide a
    ``window`` over the hash stream, keep each window's minimum, and
    return the distinct selected hashes per document as
    ``(id_col, fp bigint)`` rows.

    Winnowing's guarantee (the reason MOSS uses it over plain 0 mod p
    sampling): any shared substring of length ≥ k + window - 1 yields at
    least one SHARED fingerprint, and no substring match shorter than k
    is ever detected — a local algorithm with both density and
    detection bounds (§2 of the paper).  That makes it the exact-match
    complement to MinHash (set resemblance) and SimHash (cosine-ish):
    winnowing catches verbatim plagiarism/quotation spans.

    Only the first ``prefix_chars`` chars are fingerprinted: the k-gram
    hash stream is O(len) md5 calls as JVM expressions, and a bounded
    prefix keeps that linear cost capped per row while still covering
    the lead/template region where near-verbatim crawl dups agree.  The
    whole computation is ONE narrow projection (transform over a
    sequence + windowed array_min + array_distinct + explode) — no
    Python, no shuffle; 60-bit md5 gram hashes so the DuckDB oracle
    replays every selected fingerprint bit-for-bit.
    """
    empty = F.array().cast("array<bigint>")
    txt = F.substring(F.col(text_col), 1, prefix_chars)
    n_g = F.length(txt) - k + 1
    gram = lambda i: F.conv(  # noqa: E731 — md5-60 of the k-gram at i
        F.substring(F.md5(F.substring(txt, i, F.lit(k))), 1, 15), 16, 10
    ).cast("long")
    # Spark's sequence(1, n) DESCENDS when n < 1 — guard empties explicitly
    grams = F.when(
        n_g >= 1, F.transform(F.sequence(F.lit(1), n_g), gram)
    ).otherwise(empty)

    def window_mins(g: Column) -> Column:
        n_w = F.size(g) - window + 1
        return F.when(
            n_w >= 1,
            F.transform(
                F.sequence(F.lit(1), n_w),
                lambda j: F.array_min(F.slice(g, j, window)),
            ),
        ).otherwise(empty)

    # LET-BINDING, not a direct reference: Catalyst performs no common-
    # subexpression elimination inside higher-order-function lambdas, so
    # slice(grams, j, w) inlined per window re-evaluates the WHOLE gram
    # hash stream for every window — O(n²) md5 calls per row (measured
    # 181 s for 500×306-char docs).  Binding the evaluated array to a
    # lambda variable via a 1-element transform makes every window read
    # a variable instead (4 s for the same input, 44x).
    mins = F.element_at(F.transform(F.array(grams), window_mins), 1)
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(mins)).alias("fp")
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    prefix_chars: int = 400,
    min_shared: int = 2,
    max_fp_df: int = 1000,
) -> DataFrame:
    """Verbatim-overlap candidate pairs by shared winnowing fingerprints:
    ``(id_a, id_b, n_shared bigint)`` with id_a < id_b and at least
    ``min_shared`` distinct shared fingerprints.

    Scale posture — identical topology to :func:`ngram_jaccard_pairs`:
    fingerprint inverted-index self-join; boilerplate fingerprints with
    document frequency > ``max_fp_df`` are pigeonhole-bounded (at most
    total_fps / max_fp_df of them), broadcast as the OVER-threshold set,
    and left-anti'd off before the join — never the corpus-sized
    complement.  One hash-agg counts shared fingerprints per pair.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, window, prefix_chars)
    flood = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_fp_df)
        .select("fp")
    )
    pruned = fps.join(F.broadcast(flood), "fp", "left_anti")
    return (
        pruned.alias("l")
        .join(pruned.alias("r"), "fp")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
