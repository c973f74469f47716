"""Corpus-curation operators: line-level boilerplate dedup and benchmark
decontamination.

Reference analog: the reference pipeline curates per-document (duplicate
detection at unified_ocr_pipeline.py:249-271 is whole-file identity); these
two operators are the cross-document curation steps a web-scale training
corpus needs (C4/CCNet-style line dedup; eval-benchmark n-gram
decontamination), built per the round brief's training-pipeline mandate.

Scale notes (100 TB posture):
- line_dedup: the doc-frequency aggregate shuffles keyed by (line, salt) —
  salted two-level exact distinct-count, because the definitional hot key
  (a boilerplate line in nearly every doc) would otherwise merge on one
  reducer — then a broadcast LEFT ANTI against only the OVER-THRESHOLD
  lines: with threshold k the bad-line set is at most total_lines/k
  distinct values (pigeonhole), i.e. orders of magnitude smaller than the
  corpus, so it broadcasts where the full line-frequency table never
  could. Reassembly is one agg keyed by doc id.
- decontaminate: the benchmark side (an eval set — thousands of docs, not
  billions) is aggregated to distinct n-grams and broadcast; the corpus
  side streams through a map-side explode + broadcast semi-join + one
  count agg by doc. No corpus-sized shuffle keyed on n-gram strings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ASCII whitespace tokenizer shared with the DuckDB oracles: Java regex \s
# and RE2 \s are both [ \t\n\x0B\f\r]-ish ASCII classes, so the split is
# replayable bit-for-bit in SQL (same recipe as functions/text.py).
_WS_TRIM = r"^\s+|\s+$"


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int,
    broadcast_bad: bool = True,
    df_salt: int = 16,
) -> DataFrame:
    """C4/CCNet-style line-level boilerplate removal.

    Splits each document into lines, computes each distinct line's
    document frequency across the corpus, drops every occurrence of lines
    appearing in more than ``max_df`` documents (nav bars, cookie banners,
    copyright footers) plus blank lines, and reassembles the surviving
    lines in their original order.

    Returns (id, clean_text, n_lines_in, n_lines_kept) for EVERY input
    document — a fully-boilerplate page yields ``clean_text = ''``.

    ``broadcast_bad`` forces the over-threshold line set onto a broadcast
    LEFT ANTI (the set is ≤ total_lines/max_df distinct lines, tiny next
    to the corpus); disable it to let AQE choose if a pathological corpus
    makes the set large.

    ``df_salt`` spreads each line's doc-frequency count over that many
    reducers: a naive ``count_distinct(id)`` merges every occurrence of a
    line on ONE reducer, and the definitional worst case — a boilerplate
    line present in nearly every document — is exactly the key that
    floods it. Ids are disjointly partitioned by ``pmod(xxhash64(id),
    df_salt)``, so per-salt distinct counts SUM to the exact global
    doc-frequency (no id is double-counted across salts).
    """
    sid = F.col(id_col)
    lines_arr = F.split(F.col(text_col), "\n")
    # non-blank input line count: JVM-side expression, no extra shuffle
    n_in = F.size(
        F.filter(lines_arr, lambda x: F.regexp_replace(x, _WS_TRIM, "") != "")
    )
    base = df.select(sid.alias("id"), lines_arr.alias("_lines"), n_in.alias("n_lines_in"))

    lines = base.select(
        "id", F.posexplode("_lines").alias("pos", "line")
    ).where(F.regexp_replace("line", _WS_TRIM, "") != "")

    bad = (
        lines.groupBy("line", F.pmod(F.xxhash64("id"), F.lit(df_salt)).alias("_s"))
        .agg(F.count_distinct("id").alias("_d"))
        .groupBy("line")
        .agg(F.sum("_d").alias("line_df"))
        .where(F.col("line_df") > max_df)
        .select("line")
    )
    if broadcast_bad:
        bad = F.broadcast(bad)

    kept = lines.join(bad, "line", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").cast("int").alias("n_lines_kept"),
    )
    return (
        base.select("id", "n_lines_in")
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_lines_in").cast("int").alias("n_lines_in"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("int").alias("n_lines_kept"),
        )
    )


def _ngrams_of(df: DataFrame, text_col: str, n: int, out: str) -> DataFrame:
    """Adds column ``out``: array of word n-gram strings (space-joined);
    empty array when the doc has fewer than ``n`` tokens.

    The token array is MATERIALIZED as a column first, so the per-element
    ``slice`` lambda captures a bound attribute — a lambda capturing the
    raw split expression re-evaluates the split per element (Catalyst
    inlines the subtree; no CSE inside higher-order functions), turning
    this O(tokens × text-length) per row. ``sequence`` is guarded because
    Spark's ``sequence(1, 0)`` counts DOWN instead of returning empty."""
    toks = F.split(F.regexp_replace(F.col(text_col), _WS_TRIM, ""), r"\s+")
    d = df.withColumn("_toks", toks)
    t = F.col("_toks")
    n_starts = F.size(t) - (n - 1)
    ngs = F.when(
        n_starts >= 1,
        F.transform(
            F.sequence(F.lit(1), n_starts),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.withColumn(out, ngs).drop("_toks")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Eval-benchmark decontamination: flag corpus documents sharing word
    n-grams with a held-out benchmark set (the standard pre-training
    hygiene step — e.g. GPT-3's 13-gram and Gopher's 8-gram filters).

    Returns (id, overlap_ngrams, contaminated) for every corpus document:
    ``overlap_ngrams`` counts DISTINCT corpus-doc n-grams that appear
    anywhere in the benchmark; ``contaminated`` is true at
    ``overlap_ngrams >= min_overlap``.

    The benchmark's distinct n-gram set is broadcast (eval sets are
    thousands of docs); the corpus side is a map-side explode + broadcast
    semi-join + one count aggregate keyed by doc id — no corpus-sized
    shuffle keyed on n-gram strings.
    """
    sid = F.col(id_col)
    bench_ng = (
        _ngrams_of(benchmark, text_col, n, "_ngs")
        .select(F.explode("_ngs").alias("ng"))
        .distinct()
    )
    doc_ng = _ngrams_of(corpus, text_col, n, "_ngs").select(
        sid.alias("id"),
        F.explode(F.array_distinct("_ngs")).alias("ng"),
    )
    hits = (
        doc_ng.join(F.broadcast(bench_ng), "ng", "left_semi")
        .groupBy("id")
        .agg(F.count("*").cast("int").alias("overlap_ngrams"))
    )
    return (
        corpus.select(sid.alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("overlap_ngrams", F.lit(0)).cast("int").alias("overlap_ngrams"),
            (F.coalesce("overlap_ngrams", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top-k keywords per document
# ---------------------------------------------------------------------------

def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the standard corpus-level
    term-weighting pass (keyword extraction / near-dup feature vectors /
    topic routing for training-data curation).

    tf = in-document occurrences of the token; df = number of documents
    containing it; idf = ln((N + 1) / (df + 1)) with N = documents that
    have at least one token. Tokens present in more than
    ``max_df_frac * N`` documents are dropped before scoring (corpus
    stopwords / boilerplate carry no signal and dominate the join
    volume). Ties rank by token ascending so the result is fully
    deterministic.

    Returns (id, token, tf int, df long, tfidf double, rnk int) with
    rnk in 1..k per document; documents with no surviving token emit no
    rows.

    Scale shape (100 TB posture): the tokenizer is a JVM split + explode
    on scan partitions (no Python); tf is ONE hash-agg keyed by
    (doc, token) with map-side partial agg; df is a second hash-agg over
    the (doc, token) table keyed by token — each distinct pair counted
    once, so the df shuffle carries vocabulary-scale rows, not
    corpus-scale. N arrives via a broadcast one-row aggregate (scalar
    subquery shape — no driver round-trip), and the max_df prune cuts
    the hottest tokens BEFORE the tf<->df join, which is a plain shuffle
    hash join on token: the df table is vocabulary-sized and must NOT be
    broadcast. Top-k is a row_number window keyed by doc — per-doc row
    counts are bounded by distinct in-doc tokens, so no skew hotspot.
    """
    toks = F.split(F.regexp_replace(F.col(text_col), _WS_TRIM, ""), r"\s+")
    tok = (
        df.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .where(F.size("_t") > 0)
        .select("id", F.explode("_t").alias("token"))
        .where(F.length("token") > 0)
    )
    tf = tok.groupBy("id", "token").agg(F.count("*").cast("int").alias("tf"))
    dft = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = tf.select(F.count_distinct("id").alias("n_docs"))
    dft = dft.join(F.broadcast(n_docs)).where(
        F.col("df") <= F.floor(F.lit(max_df_frac) * F.col("n_docs"))
    )
    scored = tf.join(dft, "token").select(
        "id",
        "token",
        "tf",
        "df",
        (
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        ).alias("tfidf"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("id", "token", "tf", "df", "tfidf", "rnk")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Global top-``k`` documents by BM25 relevance for a bag of query
    ``terms`` (Robertson/Sparck Jones; the Lucene idf variant
    ln(1 + (N - df + 0.5)/(df + 0.5)) which is always positive). The
    retrieval primitive of a corpus-curation stack: targeted sampling
    ("find docs about X"), contamination triage, topic routing.

    Returns (id, score double, n_terms_hit int) ordered by (score desc,
    id asc), exactly ``k`` rows or fewer.

    Scale shape: the query-term filter applies DIRECTLY under the token
    explode — map-side, before any aggregation — so everything
    downstream is sized by documents-containing-query-terms, not the
    corpus. Per-doc length comes from a narrow F.size projection (no
    tokenize-again aggregate); N and avgdl arrive as ONE broadcast
    one-row aggregate; per-term df is a tiny agg joined broadcast. The
    global top-k is ORDER BY + LIMIT, which Spark executes as
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows
    — no full sort, no single-reducer order-by).
    """
    terms = [t for t in terms]
    toks = F.split(F.regexp_replace(F.col(text_col), _WS_TRIM, ""), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.length(F.regexp_replace(F.col(text_col), _WS_TRIM, "")) == 0,
            F.lit(0),
        )
        .otherwise(F.size(toks))
        .cast("int")
        .alias("dl"),
        toks.alias("_t"),
    )
    stats = base.select(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = (
        base.select("id", "dl", F.explode("_t").alias("token"))
        .where(F.col("token").isin(terms))
        .groupBy("id", "dl", "token")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    dft = hits.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(dft), "token")
        .join(F.broadcast(stats))
        .select(
            "id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (1.0 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count("*").cast("int").alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` adjacent-bigram collocations by pointwise mutual
    information — the classic corpus-statistics pass (Church & Hanks
    1990) used to mine multi-word expressions for tokenizer vocab
    seeding and to spot boilerplate phrases that dominate a crawl.

    PMI = ln( p(w1,w2) / (p(w1) p(w2)) ) with p() estimated from
    adjacent-pair and unigram counts. Bigrams seen fewer than
    ``min_count`` times are dropped (PMI's low-frequency pathology).
    Returns (w1, w2, c12 long, pmi double), ordered by the exact
    probability ratio descending then (w1, w2) ascending, limited to k.

    Determinism across engines: the rank key is the ratio
    ``(c12*N*N) / (M*c1*c2)`` computed in double with a frozen
    association order — integer-valued doubles multiply exactly here
    and the single division is correctly rounded, so Spark and an
    external SQL verifier produce bit-identical sort keys; ln() is
    applied only to the OUTPUT column (value-compared with rounding,
    never ranked on).

    Scale shape: bigrams form map-side under zip_with+explode; unigram
    and bigram counts are hash-aggs with partial combine (vocab-scale
    shuffles, not corpus-scale); N and M arrive as one-row broadcast
    aggregates; the two count joins are vocab-keyed shuffle joins (the
    unigram table must NOT be broadcast at web scale); top-k is a
    global TakeOrderedAndProject, no full sort. Counts enter the
    arithmetic as doubles, so corpus sizes beyond 2^63 tokens cannot
    overflow ANSI bigint multiplication.
    """
    toks = F.split(F.regexp_replace(F.col(text_col), _WS_TRIM, ""), r"\s+")
    base = df.select(toks.alias("_t")).where(F.size("_t") > 0)
    uni = (
        base.select(F.explode("_t").alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    sz = F.size("_t")
    pairs = (
        base.where(sz >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("_t", 1, sz - 1),
                    F.slice("_t", 2, sz - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .where((F.length("w1") > 0) & (F.length("w2") > 0))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    n_tok = uni.select(F.sum("c").cast("double").alias("n"))
    m_big = big.select(F.sum("c12").cast("double").alias("m"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        big.where(F.col("c12") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(n_tok))
        .join(F.broadcast(m_big))
        .select(
            "w1",
            "w2",
            "c12",
            (
                (F.col("c12").cast("double") * F.col("n") * F.col("n"))
                / (F.col("m") * F.col("c1").cast("double") * F.col("c2").cast("double"))
            ).alias("_ratio"),
        )
    )
    return (
        scored.orderBy(F.col("_ratio").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
        .select("w1", "w2", "c12", F.log("_ratio").alias("pmi"))
    )


def curation_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage-by-stage survivor counts for the canonical web-corpus
    curation chain (CCNet/C4/Gopher order): input → English → Gopher
    quality gates → C4 line-cleanup leaves text → exact-dedup distinct.
    The per-stage yield table is the first dashboard any corpus build
    publishes (how much mass does each gate drop?) and the regression
    alarm for gate drift between crawl batches.

    Each stage is CUMULATIVE (applied to the previous stage's
    survivors). Scale shape: every gate is a pure codegen Column over
    the text, so the whole funnel is ONE table scan + ONE global
    aggregate — the five counts ride the same partial-agg reduction
    (count-distinct via expand on the md5 of survivors only); the
    result is a single row fanned out to (stage_idx, stage, n_docs)
    rows by posexplode. No joins, no windows, no second scan, no
    Python."""
    from ..functions import text as TX

    t = F.col(text_col)
    k_lang = TX.lang_guess(t) == "en"
    k_gopher = k_lang & TX.gopher_keep(t)
    k_c4 = k_gopher & (F.length(TX.ws_trim(TX.c4_clean(t))) > 0)
    one = df.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(k_lang.cast("long")).alias("n1"),
        F.sum(k_gopher.cast("long")).alias("n2"),
        F.sum(k_c4.cast("long")).alias("n3"),
        F.count_distinct(F.when(k_c4, F.md5(t))).alias("n4"),
    )
    stages = F.array(
        F.struct(F.lit("input").alias("stage"), F.col("n0").alias("n_docs")),
        F.struct(F.lit("lang_en").alias("stage"), F.col("n1").alias("n_docs")),
        F.struct(F.lit("gopher").alias("stage"), F.col("n2").alias("n_docs")),
        F.struct(F.lit("c4_nonempty").alias("stage"), F.col("n3").alias("n_docs")),
        F.struct(F.lit("exact_dedup").alias("stage"), F.col("n4").alias("n_docs")),
    )
    return one.select(F.posexplode(stages).alias("stage_idx", "s")).select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        F.col("s.stage").alias("stage"),
        F.col("s.n_docs").cast("long").alias("n_docs"),
    )
