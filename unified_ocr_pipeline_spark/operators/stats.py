"""Table-statistics collection (ANALYZE): per-column profile rows.

A 10^12-row table is operated by its stats: the optimizer's join
ordering and partition pruning, the data-quality dashboards, and the
"did this crawl batch drift?" checks all read the same per-column
profile — row count, null count, distinct count, min/max. The
reference has no table surface at all; this is the maintenance pass
every warehouse-resident corpus needs (Spark's own ANALYZE TABLE
computes exactly these).

Scale shape: a CONSTANT number of table scans regardless of how many
columns are profiled — never the naive one-job-per-column loop. With
exact distinct counts (the verifiable default) Spark plans the
multi-distinct rewrite as two branches (distinct-rewrite Expand +
plain aggregates, joined on the single result row): two scans total,
plan-asserted. With ``approx=True`` the HyperLogLog sketch is a
regular aggregate, so everything collapses into ONE scan — the
10^12-row configuration (off the oracle contract, also
plan-asserted). Either way the one result row pivots into per-column
rows with an explode over a built array — no second pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FRACTIONAL = (T.DoubleType, T.FloatType, T.DecimalType)


def column_stats(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """One row per column in ``cols``: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) with min/max rendered as strings
    (fractional types through printf '%.6f' so external verifiers
    format identically; everything else through a plain cast)."""
    by_name = {f.name: f.dataType for f in df.schema.fields}

    def render(expr: "F.Column", c: str) -> "F.Column":
        # min/max aggregate on the NATIVE type (string-rendering first
        # would make "9" sort above "10"); only the result is rendered.
        if isinstance(by_name[c], _FRACTIONAL):
            return F.format_string("%.6f", expr)
        return expr.cast("string")

    nd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            render(F.min(F.col(c)), c).alias(f"_min_{c}"),
            render(F.max(F.col(c)), c).alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")
