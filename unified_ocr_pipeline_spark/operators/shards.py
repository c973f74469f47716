"""Training-shard assignment: the write-side endpoint of the pipeline.

After curation/dedup/sampling, a training corpus ships as a fixed set of
shard files the trainer streams — each shard a deterministic, disjoint,
roughly-equal slice of the corpus with a manifest the data loader (and
any later audit) can verify.  The reference pipeline's analog is its
partitioned output tree keyed by PO number plus the per-run summary
(`scripts/unified_ocr_pipeline.py:246, 273-275`; `run_pipeline.sh:73-88`);
at web scale the same job is "assign every doc a shard + emit a manifest
row per shard", which is what this module does, Spark-first:

- ``shard_manifest``: shard = md5-60(id) % n_shards (uniform, seedless,
  replayable), within-shard order = (hash, id) — a deterministic global
  shuffle, the Lee et al./GPT-style "shuffle once at write time" so the
  trainer can read shards sequentially.  The manifest row carries doc
  count, token sum, and an order-sensitive md5 roster fingerprint, so a
  byte-level writer can be verified against the manifest without
  re-reading payloads.
- ``hrw_assign`` / ``hrw_rebalance``: Highest-Random-Weight (rendezvous)
  hashing (Thaler & Ravishankar 1998) — shard = argmin over shards of
  md5-60(id ":" shard).  Under a resize n → n+1 ONLY the docs whose new
  shard wins move (expected 1/(n+1) of the corpus), and every mover goes
  TO the new shard — the property a continuously-growing crawl store
  needs so adding capacity doesn't reshuffle 100 TB.  Modulo sharding
  moves (n-1)/n of everything; HRW moves 1/(n+1).

Scale posture: ``shard_manifest`` is ONE shard-keyed hash aggregation
(map-side combined; the roster agg carries ids, not payloads).  HRW
assignment is a pure per-row JVM projection (transform over a
shard-count-sized sequence + array_min) — no shuffle at all; the
rebalance report joins the two projections row-wise, still shuffle-free.
Everything replays in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import md5_60


def shard_assign(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """df + (shard int, _h bigint): modulo-of-hash shard and the 60-bit
    hash used for within-shard ordering.  Pure projection."""
    h = md5_60(F.col(id_col))
    return df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("int")
    )


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    size_col: str | None = None,
) -> DataFrame:
    """One manifest row per training shard:
    ``(shard int, n_docs bigint, n_tokens bigint, roster_md5 string)``.

    ``roster_md5`` fingerprints the shard's exact CONTENT AND ORDER —
    md5 of the comma-joined ids sorted by (md5-60(id), id), the shard's
    read order.  A writer that drops, duplicates, or reorders one doc
    changes the fingerprint; two independent runs over the same corpus
    agree bit-for-bit.  ``size_col`` (e.g. a token count) feeds
    ``n_tokens``; absent, tokens are counted as whitespace runs server-
    side would — here we simply emit 0 to keep the schema stable.

    ONE shard-keyed hash aggregation; the collect_list rows are
    (hash, id) pairs — bytes proportional to ids, never payloads, and
    per-shard cardinality is corpus/n_shards by the uniform hash.
    """
    sized = shard_assign(df, id_col, n_shards).withColumn(
        "_sz",
        F.col(size_col).cast("bigint") if size_col else F.lit(0).cast("bigint"),
    )
    roster = F.md5(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("_h").alias("h"),
                            F.col(id_col).cast("string").alias("id"),
                        )
                    )
                ),
                lambda s: s["id"],
            ),
        )
    )
    return (
        sized.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_sz").alias("n_tokens"),
            roster.alias("roster_md5"),
        )
        .orderBy("shard")
    )


def hrw_weight(id_col: Column, shard: Column) -> Column:
    """The rendezvous weight md5-60(id ":" shard)."""
    return md5_60(
        F.concat(id_col.cast("string"), F.lit(":"), shard.cast("string"))
    )


def hrw_assign(
    df: DataFrame, id_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """df + ``out_col``: the Highest-Random-Weight shard (argmin of the
    per-shard hash weight; min vs max is a convention — fixed here so
    the SQL oracle replays it).  Ties are impossible in practice (60-bit
    weights) and broken by shard id via the struct ordering anyway.
    Pure JVM projection: transform over sequence(0, n-1) + array_min."""
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            hrw_weight(F.col(id_col), s).alias("w"),
            s.cast("int").alias("s"),
        ),
    )
    return df.withColumn(out_col, F.array_min(weights)["s"])


def hrw_rebalance(
    df: DataFrame, id_col: str, n_from: int, n_to: int
) -> DataFrame:
    """Per-doc resize report: ``(id_col, shard_a int, shard_b int,
    moved boolean)`` for a shard-count change ``n_from`` → ``n_to``.

    The rendezvous guarantee under growth: every moved doc lands on a
    NEW shard (id ≥ n_from), and the expected moved fraction is
    (n_to - n_from)/n_to — vs (n_from-1)/n_from for modulo sharding.
    Both assignments are projections over the same row, so the whole
    report is shuffle-free."""
    out = hrw_assign(df, id_col, n_from, "shard_a")
    out = hrw_assign(out, id_col, n_to, "shard_b")
    return out.select(
        id_col,
        "shard_a",
        "shard_b",
        (F.col("shard_a") != F.col("shard_b")).alias("moved"),
    )
