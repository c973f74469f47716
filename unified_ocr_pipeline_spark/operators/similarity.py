"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: the correctness baseline. Queries are broadcast
  (small side), the corpus streams; dot products via ``zip_with`` +
  ``aggregate`` — JVM-side, no Python.
- LSH-bucketed (random hyperplane / signed random projection): the scale
  path. Each vector gets an L×B sign-bit bucket key; candidates share a
  bucket in ≥1 of L tables; top-k computed within candidates only. At
  100 TB the bucket join replaces the full cross product; recall is tuned
  with (L, B).

Also: embedding-cosine near-dup pairs (dedup by cosine ≥ threshold).
"""

from __future__ import annotations

import math
import random
from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def np_cosine(A, B):
    """Batched cosine over two (n, dim) float64 arrays with explicit
    zero-norm handling (sim = -1, never a near-dup/neighbor) — the shared
    exact-verify kernel for the LSH and IVF candidate re-rank stages."""
    import numpy as np

    denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, (A * B).sum(axis=1) / denom, -1.0)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (qid, nid, sim) — ties broken by neighbor id.

    queries must be small (it is broadcast); the corpus side never shuffles
    until the per-query top-k aggregation (k rows per query survive).
    """
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col("qid"))
    sims = pairs.select(
        "qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", F.round("sim", 4).alias("sim"))
    )


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 42) -> List[List[List[float]]]:
    rng = random.Random(seed)
    return [
        [
            [rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_bits)
        ]
        for _ in range(n_tables)
    ]


def lsh_bucket_keys(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_tables: int = 4,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Add (table, bucket) rows per vector: signed-random-projection LSH.

    Output has one row per (input row × table): columns of input + table int
    + bucket int. Hyperplanes are seeded literals compiled into the plan —
    no joins, no Python at runtime.
    """
    planes = _hyperplanes(dim, n_tables, n_bits, seed)
    v = _as_double(F.col(vec_col))

    def bucket_for(table: int) -> Column:
        bits = None
        for b in range(n_bits):
            plane = F.array(*[F.lit(x) for x in planes[table][b]])
            sign = (dot(v, plane) >= 0).cast("int")
            term = sign * F.lit(1 << b)
            bits = term if bits is None else bits + term
        return bits

    tables = F.explode(
        F.array(
            *[
                F.struct(F.lit(t).alias("table"), bucket_for(t).alias("bucket"))
                for t in range(n_tables)
            ]
        )
    ).alias("t")
    return df.select("*", tables).select("*", "t.table", "t.bucket").drop("t")


def lsh_bucket_keys_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_tables: int = 4,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Vectorized SRP-LSH bucketing: one NumPy matmul per Arrow batch
    computes ALL tables' sign bits at once — (batch × dim) @ (dim ×
    tables·bits). Replaces ``lsh_bucket_keys``'s n_tables × n_bits literal
    Catalyst dot-product expressions, which cost minutes of codegen +
    per-row expression evaluation at realistic (L, B); measured ~10× on
    the driver bench. Identical hyperplanes (same seed), float64 both
    paths.

    Output: (id, vec, table, bucket) — one row per (input row × table).
    """
    import numpy as np
    import pandas as pd

    planes = np.asarray(_hyperplanes(dim, n_tables, n_bits, seed))  # (T,B,dim)
    flat = planes.reshape(n_tables * n_bits, dim).T.copy()          # (dim,T*B)
    weights = 1 << np.arange(n_bits)

    in_df = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)     # (n,dim)
            signs = (V @ flat) >= 0                                  # (n,T*B)
            buckets = (
                signs.reshape(n, n_tables, n_bits) * weights
            ).sum(axis=2)                                            # (n,T)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), n_tables),
                    "vec": [v for v in pdf["vec"] for _ in range(n_tables)],
                    "table": np.tile(np.arange(n_tables), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    id_type = in_df.schema["id"].dataType.simpleString()
    vec_type = in_df.schema["vec"].dataType.simpleString()
    return in_df.mapInPandas(
        gen, schema=f"id {id_type}, vec {vec_type}, table int, bucket long"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 3,
    n_tables: int = 4,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates = bucket collisions in ≥1 table."""
    cb = lsh_bucket_keys_np(corpus, id_col, vec_col, dim, n_tables, n_bits, seed).select(
        F.col("id").alias("nid"), F.col("vec").alias("nv"), "table", "bucket"
    )
    qb = lsh_bucket_keys_np(queries, id_col, vec_col, dim, n_tables, n_bits, seed).select(
        F.col("id").alias("qid"), F.col("vec").alias("qv"), "table", "bucket"
    )
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "qv", "nid", "nv")
        .dropDuplicates(["qid", "nid"])
    )
    sims = cand.select(
        "qid", "nid",
        cosine(_as_double(F.col("qv")), _as_double(F.col("nv"))).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", F.round("sim", 4).alias("sim"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    n_tables: int = 6,
    n_bits: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold),
    LSH-bucketed self-join + exact verify on candidates."""
    import numpy as np
    import pandas as pd
    from pyspark.storagelevel import StorageLevel

    # the bucketed table feeds both sides of the self-join — persist so the
    # NumPy bucketing stage runs once, not twice
    b = lsh_bucket_keys_np(df, id_col, vec_col, dim, n_tables, n_bits, seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    l = b.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), "table", "bucket")
    r = b.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), "table", "bucket")
    cand = (
        l.join(r, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "va", "vb")
    )

    # exact verify, vectorized: one NumPy pass per Arrow batch instead of
    # interpreted zip_with/aggregate lambdas per pair (measured ~4 s → ~0.3 s
    # on 15k candidates at sf0.1)
    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["va"].tolist(), dtype=np.float64)
            B = np.array(pdf["vb"].tolist(), dtype=np.float64)
            sim = np_cosine(A, B)
            keep = sim >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "sim": np.round(sim[keep], 4),
                }
            )

    id_type = b.schema["id"].dataType.simpleString()
    return cand.mapInPandas(
        verify, schema=f"id_a {id_type}, id_b {id_type}, sim double"
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization
# ---------------------------------------------------------------------------

def quantize_embeddings(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x_i| / 127,
    q_i = floor(x_i / scale + 0.5) in [-127, 127] — the standard 4x
    storage/bandwidth cut for billion-vector ANN corpora (dequantized
    value q_i * scale is within scale/2 of x_i, so cosine top-k on
    dequantized vectors tracks the full-precision ranking).

    Everything is elementwise JVM ``transform`` arithmetic — exact IEEE
    double ops (one divide, one floor), bit-replayable in the SQL
    oracle; no shuffle, no Python. Zero vectors quantize to all-zero
    with scale 0. Returns (id, qvec array<int>, scale double,
    dim int).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = mx / F.lit(127.0)
    q = F.when(mx == F.lit(0.0), F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        q.alias("qvec"),
        scale.alias("scale"),
        F.size(v).cast("int").alias("dim"),
    )


def quantization_stats(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector quantization fidelity report over
    :func:`quantize_embeddings`: (id, dim, scale, qsum, max_err) where
    ``qsum`` is the integer sum of the quantized components (a checksum
    that pins every q_i exactly) and ``max_err`` = max_i |q_i*scale -
    x_i| (bounded by scale/2). Scalar outputs only, so the result is
    hash-comparable across engines. Narrow plan — no exchange."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qd = quantize_embeddings(df, id_col, vec_col)
    src = df.select(F.col(id_col).alias("id"), v.alias("_v"))
    j = qd.join(src, "id")
    err = F.array_max(
        F.zip_with(
            F.col("qvec"),
            F.col("_v"),
            lambda q, x: F.abs(q.cast("double") * F.col("scale") - x),
        )
    )
    return j.select(
        "id",
        "dim",
        "scale",
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("qsum"),
        err.alias("max_err"),
    )
