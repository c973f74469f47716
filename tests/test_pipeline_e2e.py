"""End-to-end golden test: Spark pipeline output must be byte-identical per
url to the sequential oracle (SURVEY.md §5 step 2 — the north rule's
correctness core), plus resume and skew checks."""

from __future__ import annotations

import os

import pytest

from unified_ocr_pipeline_spark.sources.fixtures import write_pages_parquet, HEAVY_HOST
from unified_ocr_pipeline_spark.oracle.run import run_oracle
from unified_ocr_pipeline_spark.plans.pipeline import ExtractionPipeline

N_ROWS = 400
MAX_BYTES = 64 * 1024


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pages") / "pages")
    n = write_pages_parquet(p, N_ROWS, seed=42, max_bytes=MAX_BYTES)
    assert n == N_ROWS
    return p


@pytest.fixture(scope="module")
def golden(pages_path):
    return run_oracle(pages_path, max_bytes=MAX_BYTES)


@pytest.fixture(scope="module")
def run_output(spark, pages_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "run")
    pipe = ExtractionPipeline(
        spark, out, num_buckets=16, salt_factor=4, max_bytes=MAX_BYTES
    )
    result = pipe.run(pages_path)
    return pipe, result


def test_row_counts_match_oracle(run_output, golden):
    pipe, result = run_output
    rows = pipe.read_extracted().count()
    assert rows == len(golden)  # dedup by url applied on both sides
    assert result.rows_written == len(golden)
    assert result.buckets_skipped == 0


def test_extracted_text_byte_identical(run_output, golden):
    pipe, _ = run_output
    got = {
        r["url"]: r
        for r in pipe.read_extracted()
        .select("url", "extracted_text", "po_number", "status", "content_type")
        .collect()
    }
    assert set(got) == set(golden)
    mismatches = [
        u
        for u, g in golden.items()
        if got[u]["extracted_text"] != g.extracted_text
    ]
    assert mismatches == [], f"{len(mismatches)} urls differ, e.g. {mismatches[:3]}"
    for u, g in golden.items():
        assert got[u]["po_number"] == g.po_number, u
        assert got[u]["status"] == g.status, u
        assert got[u]["content_type"] == g.content_type, u


def test_spans_and_fields_match_oracle(run_output, golden):
    pipe, _ = run_output
    rows = pipe.read_extracted().select(
        "url", "spans", "fields", "quality_clauses",
        "total_pages", "po_page_count", "router_page_count",
        "total_images", "image_counts",
    ).collect()
    some_images = False
    for r in rows:
        g = golden[r["url"]]
        got_spans = [(s["label"], s["page_no"], s["start"], s["end"]) for s in r["spans"]]
        want_spans = [(s.label, s.page_no, s.start, s.end) for s in g.spans]
        assert got_spans == want_spans, r["url"]
        assert r["fields"].asDict() == g.fields, r["url"]
        assert dict(r["quality_clauses"] or {}) == g.quality_clauses, r["url"]
        assert r["total_pages"] == g.total_pages
        assert r["po_page_count"] == g.po_page_count
        assert r["router_page_count"] == g.router_page_count
        # P2/A2: per-page image counts and the doc total
        assert r["total_images"] == g.total_images, r["url"]
        assert list(r["image_counts"] or []) == list(g.image_counts), r["url"]
        some_images = some_images or g.total_images > 0
    assert some_images, "fixture produced no embedded-image records"


def test_statuses_cover_quarantine_classes(run_output):
    pipe, _ = run_output
    statuses = {
        r["status"]: r["n"]
        for r in pipe.read_extracted().groupBy("status").count().withColumnRenamed("count", "n").collect()
    }
    assert statuses.get("ok", 0) > 0
    assert statuses.get("oversize", 0) > 0  # oversize class quarantined, not parsed
    assert statuses.get("empty", 0) > 0     # html-empty-main


def test_metrics_and_manifest_written(run_output, spark):
    pipe, result = run_output
    m = spark.read.parquet(pipe.metrics_path)
    assert m.where(m.run_id == result.run_id).count() > 0
    cols = set(m.columns)
    assert {"bucket", "partition_id", "row_count", "stage_proc_us",
            "content_hash", "ok_rows", "quarantined_rows"} <= cols
    # A2: images aggregate in the lineage metrics
    assert m.agg({"total_images": "sum"}).first()[0] > 0
    man = spark.read.parquet(pipe.manifest_path)
    assert man.select("bucket").distinct().count() == result.buckets_processed


def test_salted_buckets_spread_heavy_host(run_output, spark):
    """The heavy host (≥30% of rows) must land in >1 bucket (salting), and
    no bucket should hold more than ~2× the mean row count."""
    pipe, _ = run_output
    df = pipe.read_extracted()
    heavy = df.where(df.url.contains(HEAVY_HOST)).select("bucket").distinct().count()
    assert heavy > 1, "salting failed: heavy host collapsed into one bucket"
    counts = [r["n"] for r in df.groupBy("bucket").count().withColumnRenamed("count", "n").collect()]
    mean = sum(counts) / len(counts)
    assert max(counts) <= 3.0 * mean, f"bucket skew too high: {max(counts)} vs mean {mean}"


def test_resume_skips_completed_buckets(run_output, spark, pages_path, golden):
    """North-rule resume clause: a second run over the same input must skip
    every completed bucket and leave the output unchanged."""
    pipe, first = run_output
    before = {
        (r["bucket"], r["content_hash"], r["run_id"])
        for r in spark.read.parquet(pipe.manifest_path).collect()
    }
    second = pipe.run(pages_path)
    assert second.buckets_skipped == first.buckets_processed
    assert second.buckets_processed == 0
    assert second.rows_written == 0
    after = {
        (r["bucket"], r["content_hash"], r["run_id"])
        for r in spark.read.parquet(pipe.manifest_path).collect()
    }
    assert before == after  # no bucket reprocessed, hashes untouched
    assert pipe.read_extracted().count() == len(golden)


def test_partial_manifest_resume(spark, pages_path, golden, tmp_path_factory):
    """Kill-after-partition-k simulation: pre-write manifests for a subset of
    buckets, run with resume, assert only the missing buckets are processed
    and the union equals the full golden set."""
    out = str(tmp_path_factory.mktemp("out2") / "run")
    pipe = ExtractionPipeline(spark, out, num_buckets=16, salt_factor=4, max_bytes=MAX_BYTES)
    full = pipe.run(pages_path)  # baseline full run

    # simulate a killed job: drop manifests for half the buckets and delete
    # their output, as if the job died before completing them
    man = spark.read.parquet(pipe.manifest_path)
    keep_buckets = [r["bucket"] for r in man.select("bucket").distinct().collect()][::2]
    import shutil

    man.where(man.bucket.isin(keep_buckets)).write.mode("overwrite").parquet(
        pipe.manifest_path + "_tmp"
    )
    shutil.rmtree(pipe.manifest_path)
    os.rename(pipe.manifest_path + "_tmp", pipe.manifest_path)

    resumed = pipe.run(pages_path)
    assert resumed.buckets_skipped == len(keep_buckets)
    assert resumed.buckets_processed == full.buckets_processed - len(keep_buckets)

    got = {
        r["url"]: r["extracted_text"]
        for r in pipe.read_extracted().select("url", "extracted_text").collect()
    }
    assert set(got) == set(golden)
    assert all(got[u] == g.extracted_text for u, g in golden.items())


def test_compact_epoch_preserves_content(spark, pages_path, tmp_path_factory):
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("out") / "compact")
    pipe = ExtractionPipeline(
        spark, out, num_buckets=16, salt_factor=4, max_bytes=MAX_BYTES
    )
    pipe.run(pages_path)

    def state():
        df = pipe.read_extracted().where(F.col("epoch") == 0)
        rows = df.groupBy("bucket").agg(
            F.count("*").alias("n"), F.expr("bit_xor(row_hash)").alias("h")
        ).collect()
        return {r["bucket"]: (r["n"], r["h"]) for r in rows}

    import glob
    before_files = len(glob.glob(f"{out}/extracted/epoch=0/bucket=*/*.parquet"))
    before = state()
    n_files = pipe.compact_epoch(0)
    after = state()
    after_files = len(glob.glob(f"{out}/extracted/epoch=0/bucket=*/*.parquet"))

    assert after == before                      # content identical per bucket
    assert n_files == after_files == len(after) # exactly one file per bucket
    assert after_files <= before_files
    # manifests still valid → a resumed run skips every bucket
    res = pipe.run(pages_path)
    assert res.buckets_processed == 0 and res.buckets_skipped == len(after)


def test_compact_epoch_recovers_stranded_stash(spark, pages_path, tmp_path_factory):
    """Simulate a crash between the two swap renames (epoch only present
    as the hidden .old stash): the next compact_epoch must restore and
    recompact instead of reporting an empty epoch."""
    import os
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("out") / "crash")
    pipe = ExtractionPipeline(
        spark, out, num_buckets=16, salt_factor=4, max_bytes=MAX_BYTES
    )
    pipe.run(pages_path)
    before = pipe.read_extracted().where(F.col("epoch") == 0).count()

    src = f"{out}/extracted/epoch=0"
    os.rename(src, f"{out}/extracted/.old_epoch=0")   # the crash window
    n_files = pipe.compact_epoch(0)
    assert n_files > 0                                 # not "empty epoch"
    after = pipe.read_extracted().where(F.col("epoch") == 0).count()
    assert after == before
    assert not os.path.exists(f"{out}/extracted/.old_epoch=0")


def test_resume_adopts_epoch_bucket_numbering(spark, pages_path, tmp_path_factory):
    """Bucket ids belong to the epoch: a resume on a differently-sized
    cluster (different auto num_buckets) must adopt the manifest's
    recorded numbering, or the anti-join would skip never-processed pages
    (silent loss) and reprocess others under a conflicting layout."""
    out = str(tmp_path_factory.mktemp("out") / "elastic")
    pipe1 = ExtractionPipeline(
        spark, out, num_buckets=16, salt_factor=4, max_bytes=MAX_BYTES
    )
    res1 = pipe1.run(pages_path)
    assert res1.buckets_processed == 16

    # "new cluster": same output dir, different bucket config
    pipe2 = ExtractionPipeline(
        spark, out, num_buckets=32, salt_factor=8, max_bytes=MAX_BYTES
    )
    res2 = pipe2.run(pages_path)          # resume=True default
    assert (pipe2.num_buckets, pipe2.salt_factor) == (16, 4)  # adopted
    assert res2.buckets_processed == 0 and res2.buckets_skipped == 16
    assert pipe2.read_extracted().count() == res1.rows_written
