"""Skew-aware equi-join: salt the hot side, replicate the other.

AQE's skew-join split only kicks in for sort-merge joins past size
thresholds and can't help when a reducer's skew comes from a LOW-
cardinality key (a 4-value language column, a mega-host) — every row of
a hot key still hashes to one reducer before AQE can split the
partition. Salting changes the join key itself: the fact side gets a
deterministic per-row salt in [0, salt), the dimension side is
replicated once per salt value, and the join runs on (key, salt) — each
hot key fans out over ``salt`` reducers by construction. Result is
EXACTLY the plain join (salt is join-neutral), which is what the oracle
checks.

Cost model: replication multiplies the dimension side by ``salt`` — use
when dim is too big to broadcast but small enough that salt x dim
beats one reducer carrying the hot key's entire fact volume.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (large, skewed on ``on``) with ``dim`` on the
    ``on`` columns, spreading each join key over ``salt`` reducers.

    The per-row salt is deterministic (xxhash64 of the whole fact row,
    mod salt) so re-runs produce identical partitioning — no rand()
    nondeterminism under task retry, which can duplicate or drop rows
    when a retried task re-draws its salts. Supported ``how``: inner
    and left (the replicated-dim layout preserves exactly these).
    Returns fact.* plus dim's non-key columns.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_skew_join supports how='inner' or 'left'")
    on = list(on)
    fsalt = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    dsalt = dim.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt"),
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = fsalt.join(dsalt, on + ["_salt"], how)
    return out.drop("_salt")
