"""IVF (inverted-file) approximate nearest neighbor over an embedding column.

The second scale path for similarity search next to SRP-LSH
(operators/similarity.py): a coarse quantizer partitions the corpus into
``n_cells`` Voronoi cells; each query probes only its ``nprobe`` nearest
cells and re-ranks candidates exactly. At 100 TB the cell assignment is a
single vectorized matmul per Arrow batch, the corpus is written partitioned
by ``cell`` (partition pruning = the "inverted file"), and the probe join
touches ``nprobe / n_cells`` of the data instead of all of it.

Two quantizer sources:

- ``seeded_centroids``: data-independent Gaussian centroids from a fixed
  seed. Deterministic and replayable in ANSI SQL (the DuckDB oracle inlines
  the same literals), so the full IVF path is hash-checked end-to-end by
  the driver harness.
- ``kmeans_train``: real Lloyd's k-means on a driver-collected sample.
  Training on a bounded sample (10^5-10^6 vectors) is the standard IVF
  practice at any corpus scale — the sample fits on the driver even when
  the corpus is 100 TB, and the resulting centroids are broadcast literals
  exactly like the seeded ones.

Reference has no ANN surface; this extends the engine for training-data
pipelines (brief: "an IVF or LSH-bucketed variant as the scale path").
"""

from __future__ import annotations

import random
from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seeded_centroids(n_cells: int, dim: int, seed: int = 42) -> List[List[float]]:
    """Data-independent Gaussian centroids (fixed seed) — the
    oracle-replayable quantizer. Same RNG discipline as
    similarity._hyperplanes."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_cells)]


def kmeans_train(
    df: DataFrame,
    vec_col: str,
    n_cells: int,
    sample_rows: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> List[List[float]]:
    """Lloyd's k-means on a bounded, deterministic sample.

    ``sample_rows`` caps driver memory regardless of corpus size (ordered
    take, not ``.sample`` — deterministic across runs/partitions). Empty
    clusters are reseeded from the farthest points, so exactly ``n_cells``
    centroids come back.
    """
    import numpy as np

    rows = (
        df.select(F.col(vec_col).alias("v"))
        # orderBy().limit() compiles to TakeOrderedAndProject: a per-
        # partition top-K heap + driver merge, NOT a global sort-shuffle —
        # deterministic and scale-safe
        .orderBy(F.xxhash64(F.col("v").cast("array<double>").cast("string")))
        .limit(sample_rows)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans_train: input has no vectors")
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    if len(cents) < n_cells:  # corpus smaller than n_cells
        pad = rng.standard_normal((n_cells - len(cents), X.shape[1]))
        cents = np.vstack([cents, pad])
    for _ in range(iters):
        # (n, k) squared distances via ||x||² - 2x·c + ||c||²
        d2 = (
            (X * X).sum(axis=1, keepdims=True)
            - 2.0 * (X @ cents.T)
            + (cents * cents).sum(axis=1)
        )
        assign = d2.argmin(axis=1)
        new = np.empty_like(cents)
        # reseed dead cells from DISTINCT farthest points (same point for
        # two dead cells would leave them duplicated forever — argmin ties
        # resolve to the lower index, permanently starving the other)
        farthest = iter(np.argsort(-d2.min(axis=1)))
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
            else:
                try:
                    new[c] = X[next(farthest)]
                except StopIteration:  # more dead cells than sample points
                    new[c] = cents[c]
        if np.allclose(new, cents):
            cents = new
            break
        cents = new
    return cents.tolist()


def assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: List[List[float]],
) -> DataFrame:
    """(id, vec, cell): nearest-centroid assignment, one NumPy matmul per
    Arrow batch — centroids ride the closure (broadcast), no join, no
    per-row Python. Output is the corpus side of the inverted file; at
    scale, write it ``partitionBy("cell")`` so probes prune partitions."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)          # (k, dim)
    c_sq = (C * C).sum(axis=1)                           # (k,)

    in_df = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            d2 = -2.0 * (V @ C.T) + c_sq                 # ||v||² constant per row
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "vec": pdf["vec"],
                    "cell": d2.argmin(axis=1).astype("int32"),
                }
            )

    id_type = in_df.schema["id"].dataType.simpleString()
    vec_type = in_df.schema["vec"].dataType.simpleString()
    return in_df.mapInPandas(
        gen, schema=f"id {id_type}, vec {vec_type}, cell int"
    )


def probe_cells(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: List[List[float]],
    nprobe: int,
) -> DataFrame:
    """(qid, qv, cell) with ``nprobe`` rows per query: the cells whose
    centroids are nearest to the query (ties broken by cell index).
    ``nprobe`` is clamped to the cell count — probing "all cells plus
    headroom" degrades to exact search instead of crashing."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    nprobe = min(nprobe, len(C))

    in_df = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["qv"].tolist(), dtype=np.float64)
            d2 = -2.0 * (V @ C.T) + c_sq
            # argsort is stable → equal distances keep ascending cell index
            near = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "qid": np.repeat(pdf["qid"].to_numpy(), nprobe),
                    "qv": [v for v in pdf["qv"] for _ in range(nprobe)],
                    "cell": near.reshape(-1).astype("int32"),
                }
            )

    id_type = in_df.schema["qid"].dataType.simpleString()
    vec_type = in_df.schema["qv"].dataType.simpleString()
    return in_df.mapInPandas(
        gen, schema=f"qid {id_type}, qv {vec_type}, cell int"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: Optional[List[List[float]]] = None,
    dim: int = 64,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via IVF: candidates are corpus vectors in
    the query's ``nprobe`` nearest cells; exact cosine re-rank within them.

    With ``centroids=None`` the seeded (oracle-replayable) quantizer is
    used; pass ``kmeans_train(...)`` output for a trained one. Join shape:
    corpus-side cell assignment streams (one matmul per batch, never
    shuffles raw vectors beyond the candidate join); the probe side is tiny
    (n_queries × nprobe) and broadcast.

    ``exclude_self=False`` keeps (qid == nid) matches: when queries and
    corpus are DISTINCT sets (bitext mining's two languages) an id
    collision across them is legitimate, the same contract distinction
    as ``bitext._directional_topk`` vs ``similarity.brute_force_topk``.
    """
    import numpy as np
    import pandas as pd

    cents = centroids if centroids is not None else seeded_centroids(n_cells, dim, seed)
    cb = assign_cells(corpus, id_col, vec_col, cents).select(
        F.col("id").alias("nid"), F.col("vec").alias("nv"), "cell"
    )
    qb = probe_cells(queries, id_col, vec_col, cents, nprobe)
    cand = cb.join(F.broadcast(qb), ["cell"])
    if exclude_self:
        cand = cand.where(F.col("nid") != F.col("qid"))
    cand = cand.select("qid", "qv", "nid", "nv")

    # exact verify: one NumPy pass per Arrow batch — the shared kernel
    # also used by similarity.cosine_near_dup_pairs (one zero-norm
    # convention for both ANN paths)
    from .similarity import np_cosine

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["qv"].tolist(), dtype=np.float64)
            B = np.array(pdf["nv"].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {"qid": pdf["qid"], "nid": pdf["nid"], "sim": np_cosine(A, B)}
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    sims = cand.mapInPandas(
        verify, schema=f"qid {id_type}, nid {id_type}, sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", F.round("sim", 4).alias("sim"))
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: List[List[float]],
    threshold: float = 0.95,
    max_cell: Optional[int] = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to its nearest quantizer
    cell, then compare pairs only WITHIN a cell and keep those with
    cosine >= threshold. (id_a, id_b, sim, cell), id_a < id_b.

    The cell partition is what makes all-pairs tractable: k cells cut
    candidate pairs by ~k versus a corpus self-join, and the quantizer is
    the same one IVF search uses (one NumPy matmul per Arrow batch, no
    join). ``max_cell`` prunes flood cells (a cell holding more than
    max_cell vectors is skipped entirely) — same guard as the LSH band
    and simhash chunk caps; at real scale use enough k-means cells that
    cells stay small (the paper uses ~10^4-10^5 clusters).
    """
    import numpy as np
    import pandas as pd

    # single consumer (the per-cell groupBy) — no persist needed; the
    # max_cell flood guard runs INSIDE the grouped kernel (the group is
    # already materialized there), avoiding a separate count window
    a = assign_cells(df, id_col, vec_col, centroids)
    from .similarity import np_cosine

    # Within-cell pairing as ONE NumPy matmul per cell (applyInPandas),
    # not a self-join: the join form ships BOTH 64-dim vectors on every
    # candidate pair row through an exchange (O(pairs × dim) shuffle
    # bytes); this form shuffles each vector exactly once (O(vectors ×
    # dim)) and does the m² work inside BLAS. Measured 4.0 s → ~1 s at
    # sf0.1. The matmul screens with a 1e-9 slack, then the survivors'
    # sims are recomputed with the shared np_cosine kernel so emitted
    # values are bit-identical to the per-pair path (and the oracle).
    def cell_pairs(key, pdf):
        m = len(pdf)
        if m < 2 or (max_cell is not None and m > max_cell):
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "sim": [], "cell": []}
            ).astype({"sim": "float64", "cell": "int32"})
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.array(pdf["vec"].tolist(), dtype=np.float64)[order]
        norms = np.linalg.norm(V, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            Vn = np.where(norms[:, None] > 0, V / norms[:, None], 0.0)
        S = Vn @ Vn.T
        iu, ju = np.triu_indices(m, k=1)
        cand = S[iu, ju] >= threshold - 1e-9
        ii, jj = iu[cand], ju[cand]
        if not len(ii):
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "sim": [], "cell": []}
            ).astype({"sim": "float64", "cell": "int32"})
        sim = np_cosine(V[ii], V[jj])
        keep = sim >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ii][keep],
                "id_b": ids[jj][keep],
                "sim": np.round(sim[keep], 4),
                "cell": np.full(int(keep.sum()), key[0], dtype="int32"),
            }
        )

    id_type = a.schema["id"].dataType.simpleString()
    return a.groupBy("cell").applyInPandas(
        cell_pairs, schema=f"id_a {id_type}, id_b {id_type}, sim double, cell int"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: List[List[float]],
    threshold: float = 0.95,
    max_cell: Optional[int] = None,
) -> DataFrame:
    """Full SemDeDup keep-set: pairs → connected components → keep the
    min-id representative per semantic-duplicate group. Returns
    (id, component, is_canonical) for every id that appears in at least
    one pair; ids with no semantic near-dup are implicitly kept (absent
    from the output, same contract as dedup_clusters)."""
    from .cc import connected_components

    pairs = semantic_dedup_pairs(
        df, id_col, vec_col, centroids, threshold, max_cell
    )
    comp = connected_components(pairs, "id_a", "id_b")
    w = Window.partitionBy("component")
    return comp.withColumn(
        "is_canonical", F.col("id") == F.min("id").over(w)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the ANN memory-scale path beyond IVF-flat
# ---------------------------------------------------------------------------

def pq_codebooks(
    m: int, ksub: int, dim: int, seed: int = 7
) -> "np.ndarray":
    """Seeded Gaussian PQ codebooks, shape (m, ksub, dim/m) — one
    ksub-centroid codebook per subspace (Jégou et al. 2011).  A single
    sequential RNG stream (same discipline as seeded_centroids /
    _hyperplanes) so the oracle can regenerate the identical literals;
    production would train each codebook with kmeans_train on subvector
    slices — the encode/search contract below is unchanged."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = random.Random(seed)
    dsub = dim // m
    flat = [rng.gauss(0.0, 1.0) for _ in range(m * ksub * dsub)]
    return np.asarray(flat, dtype=np.float64).reshape(m, ksub, dsub)


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: "np.ndarray",
) -> DataFrame:
    """(id_col, codes array<int>) — each vector compressed to m bytes
    (code j = argmin over codebook j of ||v_sub − c||², computed as the
    monotone −2·v·c + ||c||² with ties to the LOWEST code, numpy argmin
    ≡ ORDER BY score, code).

    64-dim float32 → m=4 codes is a 64× memory cut: the property that
    lets a 10⁹-vector index live in executor RAM for the ADC scan.
    One narrow Arrow pass; codebooks ride the closure (m·ksub·dsub
    doubles — KBs)."""
    import numpy as np
    import pandas as pd

    m, ksub, dsub = codebooks.shape
    c2 = np.einsum("mkd,mkd->mk", codebooks, codebooks)  # (m, ksub)
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            codes = np.empty((len(v), m), dtype=np.int32)
            for j in range(m):
                sub = v[:, j * dsub : (j + 1) * dsub]
                scores = -2.0 * sub @ codebooks[j].T + c2[j]
                codes[:, j] = np.argmin(scores, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return df.mapInPandas(gen, schema=f"{id_col} {id_type}, codes array<int>")


def pq_topk(
    encoded: DataFrame,
    queries: "list[tuple]",
    codebooks: "np.ndarray",
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes:
    ``(qid bigint, nid, adist double, rank int)``.

    ``queries`` is a bounded [(qid, vector)] list (broadcast, the same
    contract as brute_force_topk).  Per query a (m × ksub) lookup table
    of −2·q_sub·c + ||c||² is precomputed; each candidate's approximate
    distance is m table lookups — no float vector is ever touched at
    scan time.  The Arrow pass emits only its BATCH-LOCAL top-k per
    query (partial top-k, the associative trick that keeps the exchange
    at O(batches·q·k) rows), then one window finishes the global rank;
    ties break by neighbor id.  Self-matches are excluded."""
    import numpy as np
    import pandas as pd

    m, ksub, dsub = codebooks.shape
    c2 = np.einsum("mkd,mkd->mk", codebooks, codebooks)
    luts = []
    qids = []
    for qid, qv in queries:
        qv = np.asarray(qv, dtype=np.float64)
        lut = np.empty((m, ksub))
        for j in range(m):
            lut[j] = -2.0 * (qv[j * dsub : (j + 1) * dsub] @ codebooks[j].T) + c2[j]
        luts.append(lut)
        qids.append(qid)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            codes = np.asarray([np.asarray(c) for c in pdf["codes"]])
            out_q, out_n, out_d = [], [], []
            cols = np.arange(m)
            for lut, qid in zip(luts, qids):
                adist = np.round(lut[cols, codes].sum(axis=1), 4)
                mask = ids != qid
                cand_ids, cand_d = ids[mask], adist[mask]
                take = min(k, len(cand_ids))
                if not take:
                    continue
                part = np.lexsort((cand_ids, cand_d))[:take]
                out_q.extend([qid] * take)
                out_n.extend(cand_ids[part])
                out_d.extend(cand_d[part])
            yield pd.DataFrame({"qid": out_q, "nid": out_n, "adist": out_d})

    id_type = encoded.schema[id_col].dataType.simpleString()
    partial = encoded.mapInPandas(
        gen, schema=f"qid bigint, nid {id_type}, adist double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("adist").asc(), F.col("nid").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "adist", "rank")
    )


# ---------------------------------------------------------------------------
# Prototypicality pruning (cluster-distance data selection)
# ---------------------------------------------------------------------------

def prototypicality_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: List[List[float]],
    keep_frac: float = 0.5,
    keep: str = "hard",
) -> DataFrame:
    """Self-supervised prototypicality pruning (Sorscher et al. 2022,
    arXiv:2206.14486 "Beyond neural scaling laws"): score every
    embedding by its cosine similarity to its own quantizer centroid —
    high similarity = prototypical/easy, low = hard/informative — and
    keep a per-cluster fraction. The paper's headline result: with
    abundant data, pruning the EASY (most prototypical) examples beats
    random subsetting and can beat power-law scaling; with scarce data,
    keep the easy ones instead. ``keep="hard"`` keeps the least
    prototypical ``keep_frac`` of each cell; ``keep="easy"`` the most.

    Returns (id, cell, proto_sim, rnk, kept): the assigned cell, the
    4-decimal cosine to its centroid, the within-cell rank (1 = first
    kept under the chosen policy; ties on the rounded sim break by id
    ascending — fully deterministic/replayable), and the keep flag
    (rnk <= ceil(keep_frac * cell_size); ceil so no nonempty cell is
    wiped out entirely).

    Scale shape: assignment + scoring is the assign_cells matmul — one
    NumPy pass per Arrow batch, centroids ride the closure, no join.
    The rank is ONE cell-keyed window; cell sizes come from the same
    window (no second exchange). The quantizer is the same one IVF/
    SemDeDup use (seeded for the oracle, kmeans_train in production —
    the paper uses k-means over SwAV embeddings).
    """
    import numpy as np
    import pandas as pd

    from .similarity import np_cosine

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    in_df = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            d2 = -2.0 * (V @ C.T) + c_sq
            cell = d2.argmin(axis=1)
            sim = np_cosine(V, C[cell])
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cell": cell.astype("int32"),
                    "proto_sim": np.round(sim, 4),
                }
            )

    id_type = in_df.schema["id"].dataType.simpleString()
    scored = in_df.mapInPandas(
        gen, schema=f"id {id_type}, cell int, proto_sim double"
    )

    order = (
        [F.col("proto_sim").asc(), F.col("id").asc()]
        if keep == "hard"
        else [F.col("proto_sim").desc(), F.col("id").asc()]
    )
    w = Window.partitionBy("cell").orderBy(*order)
    wc = Window.partitionBy("cell")
    return scored.select(
        "id",
        "cell",
        "proto_sim",
        F.row_number().over(w).alias("rnk"),
        (
            F.row_number().over(w)
            <= F.ceil(F.count("*").over(wc) * F.lit(float(keep_frac)))
        ).alias("kept"),
    )
