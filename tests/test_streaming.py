"""Incremental-ingest test: Trigger.AvailableNow over a growing pages dir
(the reference's cron micro-batch semantics, SURVEY.md §2.10)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from unified_ocr_pipeline_spark.sources.fixtures import (
    PAGES_ARROW_SCHEMA,
    generate_pages_rows,
)
from unified_ocr_pipeline_spark.plans.pipeline import ExtractionPipeline
from unified_ocr_pipeline_spark.streaming.incremental import run_available_now


def _write_batch(path, rows, name):
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_ARROW_SCHEMA),
                   f"{path}/{name}.parquet")


def test_available_now_incremental(spark, tmp_path):
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    rows = generate_pages_rows(120, seed=42)
    batch1, batch2 = rows[:70], rows[70:]
    _write_batch(pages_dir, batch1, "b1")

    pipe = ExtractionPipeline(spark, out, num_buckets=8, salt_factor=4)

    # tick 1: processes batch1
    n1 = run_available_now(spark, str(pages_dir), pipe, ckpt)
    assert n1 >= 1
    urls1 = {r["url"] for r in pipe.read_extracted().select("url").collect()}
    assert urls1 == {r["url"] for r in batch1}

    # tick 2 with nothing new: the P9 empty-batch short-circuit
    n_idle = run_available_now(spark, str(pages_dir), pipe, ckpt)
    assert n_idle == 0

    # drop batch2, tick 3: ONLY new files are read; old output intact
    _write_batch(pages_dir, batch2, "b2")
    n2 = run_available_now(spark, str(pages_dir), pipe, ckpt)
    assert n2 >= 1
    urls_all = {r["url"] for r in pipe.read_extracted().select("url").collect()}
    assert urls_all == {r["url"] for r in rows}


def test_windowed_ingest_stats_with_watermark(spark, tmp_path):
    from unified_ocr_pipeline_spark.streaming.incremental import windowed_ingest_stats

    pages_dir = tmp_path / "wpages"
    pages_dir.mkdir()
    rows = generate_pages_rows(150, seed=7)
    _write_batch(pages_dir, rows, "w1")

    q = windowed_ingest_stats(
        spark, str(pages_dir), str(tmp_path / "wckpt"), query_name="wstats_t"
    )
    q.awaitTermination()

    got = spark.sql("SELECT * FROM wstats_t").collect()
    assert got, "windowed aggregation produced no rows"
    # every window is exactly 1 hour and counts sum to the input rows
    assert all((r["window_end"] - r["window_start"]).total_seconds() == 3600 for r in got)
    assert sum(r["n_pages"] for r in got) == 150
    langs = {r["lang"] for r in got}
    assert langs.issubset({"en", "de", "fr", "es", "unk"}) and len(langs) >= 2
