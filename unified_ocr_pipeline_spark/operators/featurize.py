"""Deterministic text → embedding featurization (hashed n-gram projection).

The embedding-side operators (``semantic_dedup``, ``ivf_topk``,
``mine_bitext``, ``pq_encode``) all consume an ``array<double>`` vector
column; real pipelines must MAKE that column from raw text first.  This
module provides the deterministic baseline featurizer: the hashing trick
(Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning") over character n-grams — each gram is md5-60-hashed, the hash
picks a bucket (``h % dim``) and a sign (``(h / dim) % 2``), bucket sums
are L2-normalized.  No vocabulary, no training pass, no model artifact:
any executor featurizes any batch independently, and re-runs/incremental
batches produce bit-identical vectors (the property the dedup family
needs).  A learned encoder would slot in behind the same (id, emb)
contract; this is the zero-dependency stand-in with real retrieval
behavior (shared grams → shared buckets → high cosine).

Scale shape: ONE narrow Arrow pass (``mapInPandas``), no shuffle, no
driver state; the per-batch gram→(bucket, sign) dict caches the md5 of
each DISTINCT gram (char n-grams repeat massively — English 3-gram
entropy ≈ 8 bits — so the cache turns per-gram hashing into per-distinct
amortized cost).  Output width is ``dim`` doubles/doc, sized by the
caller (16 for fixtures; 256-1024 for a real corpus).

Oracle replay: md5-60 is byte-identical to DuckDB's
``('0x' || substr(md5(g), 1, 15))::BIGINT`` (see
``operators/sampling.md5_60``), bucket sums are integer-valued, and the
normalize is one sqrt + one divide in IEEE double on both sides — the
DuckDB mirror in ``__spark_entry__.oracle_sql('text_embed')`` reproduces
every value exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame


def _gram_bucket_sign(gram: str, dim: int) -> tuple[int, int]:
    """(bucket, sign) for one n-gram: md5-60 of the utf-8 bytes, bucket
    = h % dim, sign from the next bit above the bucket field."""
    h = int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)
    return h % dim, 1 if (h // dim) % 2 == 0 else -1


def text_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    n: int = 3,
) -> DataFrame:
    """(id_col, emb array<double>): L2-normalized hashed char-n-gram
    embedding per document.

    Grams are ALL consecutive length-``n`` character substrings of the
    raw text (no case folding — Python/JVM/DuckDB lowercasing disagree
    on edge codepoints, and determinism is the contract).  Documents
    with no gram (null/short text) or an all-cancelling bucket sum
    (zero norm) are dropped — a zero vector has no direction and every
    consumer (cosine top-k, IVF cells, SemDeDup) would misbehave on it.
    """
    import numpy as np
    import pandas as pd

    if dim <= 0 or n <= 0:
        raise ValueError(f"dim {dim} and n {n} must be positive")
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        cache: dict[str, tuple[int, int]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            ids, vecs = [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) < n:
                    continue
                raw = np.zeros(dim, dtype=np.float64)
                for i in range(len(text) - n + 1):
                    g = text[i : i + n]
                    bs = cache.get(g)
                    if bs is None:
                        bs = cache[g] = _gram_bucket_sign(g, dim)
                    raw[bs[0]] += bs[1]
                nrm = float(np.sqrt(np.dot(raw, raw)))
                if nrm == 0.0:
                    continue
                ids.append(rid)
                vecs.append(raw / nrm)
            if ids:
                yield pd.DataFrame({id_col: ids, "emb": vecs})

    return df.select(id_col, text_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, emb array<double>"
    )
