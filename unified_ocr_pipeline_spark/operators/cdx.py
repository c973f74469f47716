"""CDX-style web-archive indexing with revisit (digest-dedup) records.

Web archives (Common Crawl, Wayback) index every capture as a CDX row
keyed by SURT + timestamp, and deduplicate storage by writing a cheap
``revisit`` record instead of the payload when a page's content digest
matches a prior capture of the same page.  This module reproduces that
flow as DataFrame ops:

- :func:`cdx_index` — per capture: SURT key, payload digest, capture
  ordinal within the page's history, and the ``response``/``revisit``
  classification (first capture of a (surt, digest) pair is the
  response; later identical captures are revisits pointing at it).
- :func:`storage_savings` — per-host rollup of how many captures and
  bytes the revisit dedup saves, the operational metric an archive
  tracks.

The reference pipeline dedups inputs by file hash before OCR
(``scripts/unified_ocr_pipeline.py`` processed-set check); this is the
same idea lifted to the web-archive data model.

Scale shape: digests and SURT keys are JVM expressions (md5 / regexp /
array lambdas) computed map-side; the classification is ONE exchange
keyed by (surt, digest) — the window partition key — with no second
shuffle for the response-timestamp backreference (``first`` over the
same window).  At 10^12 captures the (surt, digest) key is near-unique
outside genuine revisit runs, so the exchange is skew-free by
construction; hot pages with many unchanged captures bound a partition
by their own capture count, not by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.url import surt_key


def payload_digest(payload: Column) -> Column:
    """Content digest of a payload column (binary or string) as hex.

    md5 here (JVM built-in, codegen); a production archive uses sha1
    (WARC-Payload-Digest) — same shape, swap the function.
    """
    return F.md5(payload.cast("binary"))


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """One CDX row per capture: ``(surt, ts, url, digest, capture_no
    int, record_type string, response_ts)``.

    ``capture_no`` is the 0-based ordinal of the capture in its page's
    (surt-keyed) history.  ``record_type`` is ``response`` for the
    first capture carrying a given (surt, digest) and ``revisit`` for
    every later identical one; ``response_ts`` is the timestamp of the
    response record a revisit points at (its own ts for responses).

    Ties on timestamp break by url then digest so re-runs are
    byte-stable.  Both windows share the surt-hash exchange: Catalyst
    plans one Exchange(surt) and sorts once per window family.
    """
    surt = surt_key(F.col(url_col)).alias("surt")
    dig = payload_digest(F.col(payload_col)).alias("digest")
    base = captures.select(
        surt, F.col(ts_col).alias("ts"), F.col(url_col).alias("url"), dig
    )
    hist = Window.partitionBy("surt").orderBy(
        F.col("ts").asc(), F.col("url").asc(), F.col("digest").asc()
    )
    dup = Window.partitionBy("surt", "digest").orderBy(
        F.col("ts").asc(), F.col("url").asc()
    )
    first_ts = Window.partitionBy("surt", "digest")
    return base.select(
        "surt",
        "ts",
        "url",
        "digest",
        (F.row_number().over(hist) - F.lit(1)).cast("int").alias("capture_no"),
        F.when(F.row_number().over(dup) == 1, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("record_type"),
        F.min("ts").over(first_ts).alias("response_ts"),
    )


def cdx_merge(
    stored: DataFrame,
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """Classify a NEW batch of captures against a stored CDX index
    without recomputing history: ``(surt, ts, url, digest, record_type,
    response_ts)`` for the new captures only.

    A new capture is a ``revisit`` when its (surt, digest) matches a
    stored response OR an earlier capture within the batch; its
    ``response_ts`` points at the stored response when one exists, else
    at the batch's own first occurrence.  ``capture_no`` is omitted —
    the global ordinal needs per-surt history counts the merge
    deliberately doesn't read.

    The continuous-crawl shape (mirror of ``operators/dedup.py``'s
    incremental band probe): the stored side collapses to its
    (surt, digest, response_ts) key projection before the join, so the
    exchange moves keys, never payloads; with the stored index bucketed
    by surt the shuffle is one-sided.  Cost is O(new + matching keys),
    not O(stored).
    """
    new = cdx_index(captures, url_col, ts_col, payload_col).drop(
        "capture_no", "record_type", "response_ts"
    )
    prior = (
        stored.where(F.col("record_type") == "response")
        .groupBy("surt", "digest")
        .agg(F.min("ts").alias("_prior_ts"))
    )
    j = new.join(prior, ["surt", "digest"], "left")
    dup = Window.partitionBy("surt", "digest").orderBy(
        F.col("ts").asc(), F.col("url").asc()
    )
    batch_first = Window.partitionBy("surt", "digest")
    return j.select(
        "surt",
        "ts",
        "url",
        "digest",
        F.when(
            F.col("_prior_ts").isNotNull() | (F.row_number().over(dup) > 1),
            F.lit("revisit"),
        )
        .otherwise(F.lit("response"))
        .alias("record_type"),
        F.coalesce(F.col("_prior_ts"), F.min("ts").over(batch_first)).alias(
            "response_ts"
        ),
    )


def storage_savings(
    cdx: DataFrame,
    payload_bytes_col: Column | None = None,
) -> DataFrame:
    """Per-surt-host rollup of the revisit dedup:
    ``(host, n_captures, n_revisits, revisit_share double[, bytes_saved])``.

    ``cdx`` is :func:`cdx_index` output; ``payload_bytes_col`` (a Column
    over that output, e.g. a joined length) adds a bytes_saved sum over
    revisit rows.  One hash-agg keyed by the SURT's host prefix.
    """
    host = F.split(F.col("surt"), r"\)").getItem(0).alias("host")
    is_rev = (F.col("record_type") == "revisit").cast("long")
    aggs = [
        F.count("*").alias("n_captures"),
        F.sum(is_rev).alias("n_revisits"),
        (F.sum(is_rev) / F.count("*")).alias("revisit_share"),
    ]
    if payload_bytes_col is not None:
        aggs.append(
            F.sum(F.when(F.col("record_type") == "revisit", payload_bytes_col)
                  .otherwise(F.lit(0))).alias("bytes_saved")
        )
    return cdx.groupBy(host).agg(*aggs)
