"""Distributed inverted-index construction (postings lists).

Index building is the canonical web-corpus batch workload next to
extraction and dedup (the original MapReduce paper's worked example is
exactly this job): term -> ordered postings of (doc, tf), plus the df/cf
statistics retrieval needs. The reference repo has no search surface;
this family is mandated by the round brief's web-scale posture (a crawl
pipeline that extracts text almost always feeds an indexer next).

Scale shape (100 TB posture):
- Tokenize = JVM split + explode on scan partitions, no Python.
- tf = ONE hash-agg keyed by (doc, token) with map-side partial combine,
  so the shuffle carries distinct pairs, not raw token occurrences.
- Postings assembly = ONE hash-agg keyed by (token, shard). The shard
  key bounds the width of any single output row: a corpus stopword's
  postings at 10^12 docs would otherwise be one multi-GB array in a
  single reducer (the classic index-build hot key). Sharding by a
  deterministic function of the doc id splits that row across
  ``n_shards`` reducers while keeping each shard internally ordered —
  exactly how segmented indexes (Lucene et al.) lay postings out.
  Global df/cf per term = sum over its shard rows (associative).
- The optional ``max_df_frac`` prune drops corpus stopwords BEFORE the
  postings agg (same guard as tfidf_topk) when the index does not need
  them; it defaults off because a real index usually keeps everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS_TRIM = r"^\s+|\s+$"


def build_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int = 1,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Build sharded postings lists over whitespace tokens.

    Returns (token, shard int, df long, cf long, postings string) —
    one row per (token, doc-id shard) where df/cf count that shard's
    documents/occurrences and ``postings`` serializes the shard's
    ordered entries as ``"<id>:<tf>,..."`` (ascending id). The shard of
    a document is ``id % n_shards`` — deterministic and replayable, so
    an external verifier can rebuild the exact artifact.

    ``max_df_frac`` (if set) drops tokens appearing in more than that
    fraction of documents before postings assembly.
    """
    toks = F.split(F.regexp_replace(F.col(text_col), _WS_TRIM, ""), r"\s+")
    tok = (
        df.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .where(F.size("_t") > 0)
        .select("id", F.explode("_t").alias("token"))
        .where(F.length("token") > 0)
    )
    tf = tok.groupBy("id", "token").agg(F.count("*").cast("int").alias("tf"))
    if max_df_frac is not None:
        dft = tf.groupBy("token").agg(F.count("*").alias("_df_all"))
        n_docs = tf.select(F.count_distinct("id").alias("_n_docs"))
        keep = dft.join(F.broadcast(n_docs)).where(
            F.col("_df_all") <= F.floor(F.lit(max_df_frac) * F.col("_n_docs"))
        )
        tf = tf.join(keep.select("token"), "token", "left_semi")
    shard = F.pmod(F.col("id").cast("bigint"), F.lit(n_shards)).cast("int")
    entries = tf.select(
        "token",
        shard.alias("shard"),
        F.struct(F.col("id").cast("bigint").alias("id"), "tf").alias("e"),
    )
    return entries.groupBy("token", "shard").agg(
        F.count("*").alias("df"),
        F.sum("e.tf").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("e")),
                lambda s: F.concat_ws(":", s["id"].cast("string"), s["tf"].cast("string")),
            ),
            ",",
        ).alias("postings"),
    )


def conjunctive_match(
    df: DataFrame, id_col: str, text_col: str, terms: list[str]
) -> DataFrame:
    """Boolean AND retrieval: documents containing every term in
    ``terms`` at least once. Returns (id) rows.

    Scale shape: the term filter applies map-side under the explode
    (only query-term occurrences survive to the shuffle), then ONE
    hash-agg keyed by doc counts distinct matched terms — the
    postings-intersection semantics without materializing an index.
    """
    toks = F.split(F.regexp_replace(F.col(text_col), _WS_TRIM, ""), r"\s+")
    tok = (
        df.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .select("id", F.explode("_t").alias("token"))
        .where(F.col("token").isin(list(terms)))
    )
    return (
        tok.groupBy("id")
        .agg(F.count_distinct("token").alias("_hit"))
        .where(F.col("_hit") == len(set(terms)))
        .select("id")
    )
