"""Range (interval) join: pair left rows with right rows whose timestamp
falls in ``[left_ts + lower, left_ts + upper]``, sharing a key.

Beyond-reference operator (round brief §custom operators: "as-of join,
range join"). Spark expresses a range join as an equi-join on the key with
a range predicate — which degenerates to a per-key sort-merge with a
post-filter, or (keyless) to BroadcastNestedLoopJoin. The scale path here
is the standard **banded bin join**: quantize time into bins at least as
wide as the match window, explode each LEFT row into the (≤ 2, when
``bin_width ≥ window``) bins its window overlaps, equi-join on
``(key, bin)`` against the right side's single home bin, then apply the
exact range filter. Every true pair appears in exactly one joined bin (the
right row's home bin), so no dedup pass is needed. The join is a plain
hash/sort-merge equi-join — no nested-loop anywhere (plan-asserted in
tests/test_plans.py).

Scale notes: shuffle keys are (key, bin) — time-binning also spreads a hot
key across bins, a free partial skew fix; bin_width tunes the
candidates-per-bin vs rows-exploded trade-off (default: the window width).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    value_cols: Optional[List[str]] = None,
    bin_width: Optional[int] = None,
    how: str = "inner",
) -> DataFrame:
    """Rows (left.*, right value_cols) for pairs with
    ``left_ts + lower <= right_ts <= left_ts + upper`` and equal ``on`` key.

    ``lower``/``upper`` are in the same units as the timestamp columns
    (e.g. millis). ``how`` is 'inner' or 'left' (left keeps unmatched left
    rows with null value columns).
    """
    if upper < lower:
        raise ValueError("upper must be >= lower")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    window = upper - lower
    bw = int(bin_width or max(window, 1))

    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]

    l_cols = [F.col(c) for c in left.columns]
    lo_bin = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(bw))
    hi_bin = F.floor((F.col(left_ts) + F.lit(upper)) / F.lit(bw))
    lx = left.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))

    rx = right.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        F.floor(F.col(right_ts) / F.lit(bw)).alias("_bin"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )

    cond = (
        (lx[on] == rx["_rk"])
        & (lx["_bin"] == rx["_bin"])
        & (rx["_rts"] >= lx[left_ts] + F.lit(lower))
        & (rx["_rts"] <= lx[left_ts] + F.lit(upper))
    )
    joined = lx.join(rx, cond, "inner").select(
        *l_cols,
        F.col("_rts").alias(f"r_{right_ts}"),
        *[F.col(f"_v_{c}").alias(c) for c in value_cols],
    )
    if how == "inner":
        return joined

    # left join: union unmatched left rows back in with null right columns.
    # (A direct left-join over the exploded bins would duplicate unmatched
    # left rows once per bin.)
    matched_keys = joined.select(*[F.col(c) for c in left.columns]).distinct()
    unmatched = left.join(matched_keys, on=left.columns, how="left_anti")
    jtypes = {f.name: f.dataType for f in joined.schema.fields}
    nulls = unmatched.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(jtypes[f"r_{right_ts}"]).alias(f"r_{right_ts}"),
        *[F.lit(None).cast(jtypes[c]).alias(c) for c in value_cols],
    )
    return joined.unionByName(nulls, allowMissingColumns=False)
