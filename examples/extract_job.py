#!/usr/bin/env python3
"""End-to-end extraction job — the reference's cron batch, engine-style.

Run:
    zip -qr engine.zip unified_ocr_pipeline_spark
    spark-submit --py-files engine.zip examples/extract_job.py \
        <pages_parquet_dir> <output_dir> [cores]

Reads a pages table (url, warc_ts, html, text, lang), runs preflight +
extraction + salted-bucket dedup/write + manifests + lineage metrics,
prints the run summary and the per-language yield. Re-running against the
same output dir resumes from manifests (completed buckets are skipped).

The pages input may also be a catalog table: pass ``table:<name>`` (an
Iceberg table when the session configures an Iceberg catalog — see
sources/tables.py).
"""
import sys

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.plans.session import get_spark
from unified_ocr_pipeline_spark.plans.pipeline import ExtractionPipeline


def main() -> None:
    pages = sys.argv[1]
    out = sys.argv[2]
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark(app_name="extract_job", cores=cores,
                      shuffle_partitions=max(cores, 16))
    pipe = ExtractionPipeline(spark, out)
    res = pipe.run(pages)
    print(
        f"run={res.run_id} buckets={res.buckets_processed} "
        f"skipped={res.buckets_skipped} rows={res.rows_written} "
        f"wall={res.wall_sec:.1f}s"
    )

    yield_by_lang = (
        pipe.read_extracted_latest()
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("total_text_length").alias("chars"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
        )
        .orderBy("lang")
    )
    for r in yield_by_lang.collect():
        print(f"  {r['lang']}: docs={r['n_docs']} ok={r['ok']} chars={r['chars']}")
    spark.stop()


if __name__ == "__main__":
    main()
