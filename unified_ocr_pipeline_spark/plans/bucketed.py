"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a key-key join is the exchange: both sides
re-hash and move every row. Spark's bucketed tables pre-apply that hash at
WRITE time (``bucketBy(N, key)`` + ``saveAsTable``) and record the layout in
the catalog; a later join between two tables bucketed on the same key into
the same N reads co-located buckets and plans NO Exchange on either side
(and, with ``sortBy``, no Sort either) — the shuffle is paid once, at write,
and amortized over every downstream join/aggregation on that key.

This complements the pipeline's directory partitioning
(``partitionBy(epoch, bucket)`` in plans/pipeline.py — coarse pruning +
manifest unit) : directory partitions prune FILES, bucketing aligns TASKS.
A production deployment of the extracted table would use both: partition by
epoch, bucket by url hash, so url-keyed dedup/diff/join across epochs never
re-shuffles.

``tests/test_bucketed.py`` asserts the zero-Exchange plan and result parity
with the plain shuffled join.
"""

from __future__ import annotations

from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog table bucketed by ``bucket_cols`` into
    ``num_buckets`` (optionally sorted within each bucket). ``path`` makes
    it an external table so callers control the storage location."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two SAME-KEY, SAME-N bucketed tables. With bucketing metadata in
    the catalog Spark plans this without any Exchange; mismatched bucket
    counts fall back to shuffling the smaller-bucketed side only."""
    return spark.table(left_name).join(spark.table(right_name), list(on), how)


@contextmanager
def no_broadcast(spark: SparkSession):
    """Temporarily disable broadcast joins (forces the sort-merge path the
    bucketed layout is designed for — broadcast would hide the exchange
    question entirely for small test tables)."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, old)
