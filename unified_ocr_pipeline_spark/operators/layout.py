"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

A 100 TB table answers range predicates on ONE column via min/max file
pruning only if the data is sorted on that column — and then every
other column's pruning is destroyed. Z-ordering (bit-interleaving the
dimensions, as in Delta/Iceberg OPTIMIZE ZORDER) gives every
interleaved dimension partial locality: sorting by the Morton code
clusters rows that are close in ALL dimensions, so per-file min/max
ranges stay narrow on each one and a scan with a predicate on either
column skips most files.

Scale shape: the key is a pure JVM bit expression (codegen, no
shuffle); the layout pass is ONE repartitionByRange on the key plus a
within-partition sort — the same exchange any global sort pays, after
which the partitioned write inherits the clustering. Nothing here is
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code interleaving the low ``bits`` bits of two
    non-negative integer columns: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1. Values are masked to ``bits`` bits first,
    so out-of-range inputs wrap instead of overflowing (callers bucket
    or rank real values into the grid first)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31 (two lanes in one bigint)")
    mask = F.lit((1 << bits) - 1).cast("bigint")
    av = a.cast("bigint").bitwiseAND(mask)
    bv = b.cast("bigint").bitwiseAND(mask)
    acc = F.lit(0).cast("bigint")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return acc


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional pruning: compute the Morton
    key, range-partition on it, sort within partitions. Writing the
    result with a file-per-partition layout yields files whose min/max
    on BOTH columns are narrow (the property file-skipping needs)."""
    keyed = df.withColumn("_z", zorder_key(F.col(col_a), F.col(col_b), bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, "_z").sortWithinPartitions("_z")
