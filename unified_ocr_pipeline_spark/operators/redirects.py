"""Redirect-chain resolution over (src → dst) hop edges.

3xx responses carry a ``Location`` header (``functions/http.py``); a
crawl sees chains — http → https → www-canonical → final — and the
curation layer needs every discovered url mapped to the page that
actually served content (otherwise the same document is kept once per
chain entry point and link-graph mass leaks onto vanished hops).  The
reference pipeline has no network layer at all (one watched directory,
``scripts/unified_ocr_pipeline.py:1152-1155``); this operator exists
for the web-scale ingest the north rule targets.

Spark-first shape: POINTER DOUBLING, the same O(log n)-rounds trick as
the dedup clustering (``operators/cc.py``) — after round k every row
knows the node 2^k hops ahead, so ``log2(max_hops)`` self-joins resolve
chains up to ``max_hops`` long.  A naive per-hop loop would be
``max_hops`` shuffle rounds; at a 32-hop cap doubling does 5.  Each
round is one equi-join on the hop key — no driver-side iteration over
rows, no collect.

Cycles (a → b → a, or a self-loop) never reach a terminal: after the
rounds their cursor still sits on a node that has an outgoing edge, and
they report ``resolved = false`` with NULL final/hops — exactly the
``max-hops-exceeded`` failure a fetcher would report.  Chains longer
than ``max_hops`` are indistinguishable from cycles by construction
(both are "gave up after the cap"), which is the semantics crawlers
actually implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    max_hops: int = 32,
) -> DataFrame:
    """Resolve every redirect source to its final target.

    ``edges``: one row per redirect hop (``src_col`` → ``dst_col``).
    A src with several recorded Locations (revisits disagreeing across
    fetches) is collapsed deterministically to its MINIMUM dst before
    resolution — the caller who wants latest-fetch-wins should pre-pick
    with the CDX latest view instead.

    ``max_hops`` must be a power of two (the doubling rounds land
    exactly on it, which keeps the contract oracle-replayable: a
    recursive walk capped at ``hops < max_hops`` sees the identical
    frontier).

    Returns one row per distinct src:
    ``(src_col, final_url string, hops int, resolved boolean)`` —
    ``resolved = false`` (NULL final/hops) for cycles and chains longer
    than the cap.
    """
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    rounds = max_hops.bit_length() - 1  # log2

    f = (
        edges.groupBy(F.col(src_col).alias("_src"))
        .agg(F.min(dst_col).alias("_cur"))
        .withColumn("_hops", F.lit(1))
    )
    for _ in range(rounds):
        ahead = f.select(
            F.col("_src").alias("_a_src"),
            F.col("_cur").alias("_a_cur"),
            F.col("_hops").alias("_a_hops"),
        )
        f = (
            f.join(ahead, f["_cur"] == ahead["_a_src"], "left")
            .select(
                "_src",
                F.coalesce("_a_cur", "_cur").alias("_cur"),
                (
                    F.col("_hops") + F.coalesce(F.col("_a_hops"), F.lit(0))
                ).alias("_hops"),
            )
        )

    # terminal test: the cursor still has an outgoing edge => gave up
    # (cycle or over-cap chain). Semi-join via the tiny distinct-src
    # relation; marker join instead of left_anti so unresolved rows
    # stay in the output with resolved=false.
    srcs = f.select(F.col("_src").alias("_t"), F.lit(True).alias("_is_src"))
    out = f.join(srcs, f["_cur"] == srcs["_t"], "left")
    resolved = F.col("_is_src").isNull()
    return out.select(
        F.col("_src").alias(src_col),
        F.when(resolved, F.col("_cur")).alias("final_url"),
        F.when(resolved, F.col("_hops")).alias("hops"),
        resolved.alias("resolved"),
    )
