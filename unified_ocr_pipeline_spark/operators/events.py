"""Event-sequence analytics: ordered funnel conversion.

Crawl/clickstream pipelines report how traffic converts through an
ordered step sequence (view -> click -> purchase). The greedy-earliest
semantics below are the canonical ones (Amplitude/Mixpanel-style): step
i is reached iff an event of type step_i exists STRICTLY after the
earliest qualifying occurrence of step i-1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel conversion counts for the ordered ``steps`` sequence.

    Returns one row per step: (step int 1-based, step_name,
    n_users long, conversion double = n_users / step-1's n_users) —
    conversion of the first step is 1.0; steps nobody reaches still
    appear with n_users 0.

    Semantics: per user, t_1 = min ts of a step-1 event; t_i = min ts of
    a step-i event with ts > t_{i-1} (strict — simultaneous events do
    not advance the funnel). Greedy-earliest is the standard funnel
    definition and, unlike "any ordered subsequence", is a pure
    min-fold, so it runs as one aggregation per step.

    Scale shape: each step is ONE hash-agg keyed by user over only that
    step's events (the type filter prunes map-side) joined against the
    previous step's (user, t) table — len(steps) small aggregations all
    hash-partitioned on the same user key, so AQE/exchange reuse keeps
    them co-located; no windows, no per-user sorts. The final counts
    are scalar aggregates.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    )
    reached = []  # per-step DataFrame of (u, t)
    prev = None
    for s in steps:
        cur = e.where(F.col("et") == s)
        if prev is None:
            cur = cur.groupBy("u").agg(F.min("ts").alias("t"))
        else:
            cur = (
                cur.join(prev.select("u", F.col("t").alias("_pt")), "u")
                .where(F.col("ts") > F.col("_pt"))
                .groupBy("u")
                .agg(F.min("ts").alias("t"))
            )
        reached.append(cur)
        prev = cur

    counts = None
    for i, (name, r) in enumerate(zip(steps, reached), start=1):
        c = r.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(name).alias("step_name"), "n_users"
        )
        counts = c if counts is None else counts.unionByName(c)
    # the counts frame is len(steps) rows — the single-partition window
    # over it is trivially cheap
    w_prev = F.lag("n_users").over(Window.orderBy("step"))
    return counts.select(
        "step",
        "step_name",
        "n_users",
        F.when(F.col("step") == 1, F.lit(1.0))
        .otherwise(
            F.when(w_prev == 0, F.lit(0.0)).otherwise(
                F.col("n_users") / w_prev.cast("double")
            )
        )
        .alias("conversion"),
    )
