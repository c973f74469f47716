"""Margin-based bitext mining over two embedding sets (CCMatrix-style).

Mining parallel sentence/document pairs across languages is a core
Common-Crawl curation workload (Artetxe & Schwenk 2019, "Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings"; Schwenk
et al. 2021 CCMatrix). Raw cosine is miscalibrated across embedding
neighborhoods — hub vectors score high against everything — so the
standard fix scores each candidate pair by its RATIO MARGIN:

    margin(x, y) = cos(x, y) / ((avgNN_k(x→Y) + avgNN_k(y→X)) / 2)

i.e. the pair's similarity relative to the mean similarity of each
side's k-nearest neighborhood. Pairs are kept when they are each
other's best margin match (mutual) and clear a threshold.

Scale shape:
- The ONLY corpus-scale stages are the two directional top-k searches;
  here they are exact (fine up to ~10^5 queries — the query side is
  broadcast), and at 100 TB you swap in the engine's ANN stages
  (``operators/ivf.ivf_topk`` / ``operators/similarity.lsh_topk``) —
  everything downstream consumes the same (id, id, sim) shape.
- Neighborhood averages are one hash-agg each, one row per vector.
- Candidate scoring is two id-keyed joins (each one exchange), then a
  per-source and a per-target window — both partitioned by their key,
  never global.

Float canon: sims and margins are rounded to 4 decimals at the OUTPUT
(and the threshold compares the ROUNDED margin), so the DuckDB oracle's
independent replay lands on identical values.

Reference analog: none (single-node, no embeddings) — this family is
part of the training-data surface the brief adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _as_double, cosine


def _directional_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus → (qid, nid,
    sim). Unlike ``similarity.brute_force_topk`` there is NO qid != nid
    exclusion: src and tgt are distinct sets and their id spaces may
    legitimately collide. Queries are broadcast; corpus never shuffles
    until k rows per query survive the window."""
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nv")
    )
    # The exact-search corpus is small by contract (ANN replaces this
    # stage at scale), but a small parquet fixture arrives as ONE scan
    # partition — and the cosine work is queries × corpus, far wider
    # than the row count suggests. Spread the cheap (id, vec) projection
    # across the cluster before fanning out against the broadcast
    # queries; the shuffle moves only corpus_rows × (8 + dim·8) bytes.
    c = c.repartition(c.sparkSession.sparkContext.defaultParallelism)
    sims = c.crossJoin(F.broadcast(q)).select(
        "qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    threshold: float = 1.0,
    mutual: bool = True,
    ann_threshold: int | None = 100_000,
    n_cells: int = 64,
    nprobe: int = 8,
    centroids: list[list[float]] | None = None,
    n_src: int | None = None,
    n_tgt: int | None = None,
) -> DataFrame:
    """Mine aligned pairs across two embedding sets → ``(src_id, tgt_id,
    sim, margin)``, margin-best per source (and per target when
    ``mutual``), filtered to ``round(margin, 4) >= threshold``.

    Candidates are the union of both directions' top-k sets, so a pair
    only one side ranks highly still gets scored; neighborhood averages
    cover EVERY src and tgt vector (they come from the full top-k
    relations, not the surviving candidates).

    ANN routing: when either side holds more than ``ann_threshold``
    vectors, the two directional searches route through the IVF
    machinery (``ivf.ivf_topk``, kmeans-trained cells, ``nprobe``
    probes, ``exclude_self=False``) instead of the exact
    broadcast-product — no cross product anywhere in the plan above the
    threshold, which is what survives two corpus-sized sides at 100 TB.
    Below it (fixtures, the oracle) the exact product is both faster
    and bit-replayable. ``ann_threshold=None`` forces the exact path;
    ``ann_threshold=0`` forces ANN. The downstream margin pipeline is
    IDENTICAL either way — both searches emit the same (qid, nid, sim)
    shape; ANN sims arrive rounded to 4 (the ivf_topk canon), which
    only perturbs margins at the 4th decimal — inherent to the
    approximate path and inside its recall tolerance anyway.

    Sizing the route costs a count per side UNLESS the caller passes
    ``n_src``/``n_tgt``.  Against a materialized parquet relation that
    count is a metadata read, but when ``src``/``tgt`` arrive as
    DERIVED frames (filtered/featurized — the common case) each count
    executes the full upstream lineage once ON TOP of the search
    itself.  Callers in that position should either pass known (even
    approximate — only the >threshold comparison matters) counts, or
    persist the inputs first; ``examples/curate_job.py`` shows the
    persist-then-mine shape.
    """
    use_ann = False
    if ann_threshold is not None:
        if n_src is None:
            n_src = src.select(id_col).count()
        if n_tgt is None:
            n_tgt = tgt.select(id_col).count()
        use_ann = max(n_src, n_tgt) > ann_threshold
    if use_ann:
        from .ivf import ivf_topk, kmeans_train

        cents = centroids
        if cents is None:
            cents = kmeans_train(
                tgt.select(vec_col).unionByName(src.select(vec_col)),
                vec_col,
                n_cells=n_cells,
            )
        fwd = ivf_topk(
            tgt, src, id_col, vec_col, k=k, nprobe=nprobe,
            centroids=cents, exclude_self=False,
        )
        bwd = ivf_topk(
            src, tgt, id_col, vec_col, k=k, nprobe=nprobe,
            centroids=cents, exclude_self=False,
        )
    else:
        fwd = _directional_topk(tgt, src, id_col, vec_col, k)
        bwd = _directional_topk(src, tgt, id_col, vec_col, k)

    avg_src = fwd.groupBy("qid").agg(F.avg("sim").alias("a_src")).withColumnRenamed("qid", "src_id")
    avg_tgt = bwd.groupBy("qid").agg(F.avg("sim").alias("a_tgt")).withColumnRenamed("qid", "tgt_id")

    cand = (
        fwd.select(F.col("qid").alias("src_id"), F.col("nid").alias("tgt_id"), "sim")
        .unionByName(
            bwd.select(
                F.col("nid").alias("src_id"), F.col("qid").alias("tgt_id"), "sim"
            )
        )
        .groupBy("src_id", "tgt_id")
        .agg(F.max("sim").alias("sim"))  # both directions compute the identical cosine
    )

    # LEFT joins + coalesce: on the exact path every query has a top-k
    # relation so both averages always exist (identical to the former
    # inner joins); on the ANN path a query whose probed cells were all
    # empty has NO rows in its direction's top-k — its pairs (contributed
    # by the OTHER direction) must still score, so the missing side's
    # neighborhood average falls back to the present one rather than the
    # inner join silently dropping the pair.
    scored = (
        cand.join(avg_src, "src_id", "left")
        .join(avg_tgt, "tgt_id", "left")
        .withColumn("a_src", F.coalesce("a_src", "a_tgt"))
        .withColumn("a_tgt", F.coalesce("a_tgt", "a_src"))
        .withColumn(
            "margin", F.col("sim") / ((F.col("a_src") + F.col("a_tgt")) / 2)
        )
    )
    w_fwd = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id")
    )
    scored = scored.withColumn("rn_fwd", F.row_number().over(w_fwd))
    keep = F.col("rn_fwd") == 1
    if mutual:
        w_bwd = Window.partitionBy("tgt_id").orderBy(
            F.col("margin").desc(), F.col("src_id")
        )
        scored = scored.withColumn("rn_bwd", F.row_number().over(w_bwd))
        keep = keep & (F.col("rn_bwd") == 1)
    return (
        scored.where(keep)
        .select(
            "src_id",
            "tgt_id",
            F.round("sim", 4).alias("sim"),
            F.round("margin", 4).alias("margin"),
        )
        .where(F.col("margin") >= threshold)
    )


def strand_url_pairs(
    df: DataFrame,
    url_col: str,
    lang_col: str,
    pivot_lang: str = "en",
) -> DataFrame:
    """STRAND-style bitext candidate pairs from URL structure (Resnik &
    Smith 2003): two pages are translation candidates when their urls
    differ ONLY by a language path segment — http://h/en/p7 vs
    http://h/fr/p7. The structural complement to the embedding-margin
    miner (``mine_bitext``): zero model cost, high precision on
    language-mirrored sites, the standard first-pass candidate
    generator real crawl bitext pipelines run before any scoring.

    The language segment is stripped with one Java∩RE2 regexp_replace
    — but ONLY when the first 2-3-lowercase-letter path segment equals
    the row's own language label (case-insensitive): /en/ on an
    en-labeled page is a language segment; /faq/, /api/, /www/ — or
    /en/ on a page whose detector says otherwise — are ordinary path
    segments and stay in the key, so unrelated sections can't collapse
    onto one generic path and pair across languages. The remainder is
    the alignment key. Pairing = pivot-language side joined to every other
    language on (host, generic path) — ONE key-keyed shuffle join, no
    cross join; per-(key, lang) duplicates are collapsed to the
    min-url representative first, so a template flood cannot square
    itself through the join.

    Returns (host, generic_path, src_url, dst_url, dst_lang)."""
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/?#]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^https?://[^/?#]+([^?#]*)", 1)
    seg = F.regexp_extract(path, r"^/([a-z]{2,3})(?:/|$)", 1)
    generic = F.when(
        seg == F.lower(F.col(lang_col)),
        F.regexp_replace(path, r"^/[a-z]{2,3}(/|$)", "/"),
    ).otherwise(path)
    keyed = (
        df.select(
            host.alias("host"),
            generic.alias("generic_path"),
            F.col(lang_col).alias("lang"),
            F.col(url_col).alias("url"),
        )
        .groupBy("host", "generic_path", "lang")
        .agg(F.min("url").alias("url"))
    )
    src = keyed.where(F.col("lang") == pivot_lang).select(
        "host", "generic_path", F.col("url").alias("src_url")
    )
    dst = keyed.where(F.col("lang") != pivot_lang).select(
        "host",
        "generic_path",
        F.col("url").alias("dst_url"),
        F.col("lang").alias("dst_lang"),
    )
    return src.join(dst, ["host", "generic_path"])
