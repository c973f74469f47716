"""As-of (most-recent-prior-event) join — an operator Spark lacks natively.

Implemented as the classic union-tag-window composition (no Python, one
shuffle on the partition key):

1. UNION the left (probe) and right (reference) streams with a tag column,
   projecting both onto a common (key, ts, payload) shape.
2. One window pass ``last(right_payload, ignorenulls=True)`` over
   ``partitionBy(key).orderBy(ts, tag)`` carries the latest right-side value
   forward onto every left row.
3. Filter back to left rows.

Scale notes: this is strictly better than the naive range-join
(``l JOIN r ON r.ts <= l.ts`` + max) which is O(n·m) per key; the union
window is O((n+m) log(n+m)) per key with ONE exchange on ``key`` — the same
plan a native ASOF JOIN (DuckDB / pandas merge_asof) would pick,
distributed. Skewed keys are handled by AQE skew-split since the window
partitions by key only.

Reference analog: none (the reference never joins datasets — SURVEY.md
§2.3); this is part of the training-data-pipeline operator family the round
brief adds.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: Optional[int] = None,
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (< when ``strict``) for the same ``on`` key.

    ``left_ts`` / ``right_ts`` must be numeric columns (e.g. produced with
    ``unix_millis``) so tolerance arithmetic is unit-honest. Returns the
    left columns plus ``asof_ts`` and ``asof_<c>`` for each requested right
    value column (all null when no prior right row exists or the match is
    further back than ``tolerance``).
    """
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast("long").alias("_rts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_ts).cast("long").alias("_rts"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    u = l.unionByName(r)

    # right rows (side=0) sort before left rows at equal ts ⇒ <= semantics;
    # for strict (<), left rows sort first so equal-ts right rows are
    # excluded from the carried state.
    second = F.col("_side") if not strict else (1 - F.col("_side"))
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), second)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_side",
        "_ts",
        "_lrow",
        F.last("_rts", ignorenulls=True).over(w).alias("_asof_ts"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    ).where(F.col("_side") == 1)

    within = (
        F.lit(True)
        if tolerance is None
        else (F.col("_ts") - F.col("_asof_ts")) <= F.lit(tolerance)
    )
    return carried.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        F.when(within, F.col("_asof_ts")).alias("asof_ts"),
        *[
            F.when(within, F.col(f"_asof_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
