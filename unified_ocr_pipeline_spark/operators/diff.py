"""Snapshot diff (CDC-style) between two keyed fingerprinted relations.

A recurring crawl re-fetches the same urls every epoch; the curation
question is "what actually changed since the last snapshot" — new pages,
vanished pages, pages whose content fingerprint moved. The reference
handles the single-node version of this with source-file deletes plus a
processed-set (K8, unified_ocr_pipeline.py's move-after-process loop); the
engine's epoch manifests + ``read_extracted_latest`` give the storage side,
and this operator gives the set algebra: one full-outer shuffle join on the
key, fingerprints compared column-wise. No driver-side state, scales as a
plain hash join; if one side is a small reference snapshot Spark/AQE will
broadcast it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ADDED, REMOVED, CHANGED, UNCHANGED = "added", "removed", "changed", "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Rows keyed by ``key_cols`` classified added/removed/changed/unchanged
    between ``old`` and ``new`` by comparing ``fp_col``. Output columns:
    ``*key_cols, change, fp_old, fp_new`` (fps null on the absent side).

    Presence is tracked with an explicit marker per side, NOT by
    fingerprint nullness: a key present in both snapshots with a null
    fingerprint on one side is ``changed``/``unchanged`` (null-safe
    compare), never a spurious add/remove. Null KEY columns still never
    join (SQL semantics) — callers need a non-null key contract, which the
    engine's url/doc_id keys satisfy by construction.
    """
    keys = list(key_cols)
    o = old.select(
        *keys, F.col(fp_col).alias("fp_old"), F.lit(True).alias("_in_old")
    )
    n = new.select(
        *keys, F.col(fp_col).alias("fp_new"), F.lit(True).alias("_in_new")
    )
    j = o.join(n, keys, "full_outer")
    change: Column = (
        F.when(F.col("_in_old").isNull(), F.lit(ADDED))
        .when(F.col("_in_new").isNull(), F.lit(REMOVED))
        .when(~F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    return j.select(*keys, change.alias("change"), "fp_old", "fp_new")
