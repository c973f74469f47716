"""Bucketed-table co-located join: plan shape + result parity.

The scale claim being tested: once two tables are bucketed on the join key
into the same bucket count, the join plans with ZERO Exchange operators —
the shuffle was paid once at write time. (plans/bucketed.py)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.plans.bucketed import (
    colocated_join,
    no_broadcast,
    write_bucketed,
)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )
    right = spark.range(0, 2000, 3).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("score"),
    )
    write_bucketed(left, "bk_left", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "bk_left"))
    write_bucketed(right, "bk_right", ["doc_id"], 8, sort_cols=["doc_id"],
                   path=str(tmp_path / "bk_right"))
    yield left, right
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    with no_broadcast(spark):
        joined = colocated_join(spark, "bk_left", "bk_right", ["doc_id"])
        plan = _plan_of(joined)
        assert "Exchange" not in plan, plan
        # sortBy at write time also removes the per-task Sort before SMJ
        assert joined.count() == 667


def test_colocated_join_matches_shuffled_join(spark, bucketed_pair):
    left, right = bucketed_pair
    with no_broadcast(spark):
        got = sorted(
            (r["doc_id"], r["fp"], r["score"])
            for r in colocated_join(
                spark, "bk_left", "bk_right", ["doc_id"]
            ).collect()
        )
    want = sorted(
        (r["doc_id"], r["fp"], r["score"])
        for r in left.join(right, ["doc_id"]).collect()
    )
    assert got == want


def test_unbucketed_baseline_does_exchange(spark, bucketed_pair):
    """Control: the same join over the raw DataFrames (no bucket metadata)
    plans at least one Exchange — i.e. the zero-Exchange plan above is the
    bucketing's doing, not an artifact of table size."""
    left, right = bucketed_pair
    with no_broadcast(spark):
        plan = _plan_of(left.join(right, ["doc_id"]))
        assert "Exchange" in plan
