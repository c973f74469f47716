"""Regression: dedup_clusters must work when the caller's id column is
literally named "id" (the component-map join key's old name)."""

from __future__ import annotations

from unified_ocr_pipeline_spark.operators import cc as CC


def test_dedup_clusters_id_col_named_id(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = CC.dedup_clusters(docs, pairs, "id")
    assert set(out.columns) == {"id", "component", "is_canonical"}
    rows = {r["id"]: (r["component"], r["is_canonical"]) for r in out.collect()}
    assert rows == {1: (1, True), 2: (1, False), 3: (3, True)}
