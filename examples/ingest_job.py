#!/usr/bin/env python3
"""Crawl ingestion front-end: WARC containers → admitted, scheduled,
utf-8 pages — the stage that feeds examples/extract_job.py.

Run:
    zip -qr engine.zip unified_ocr_pipeline_spark
    spark-submit --py-files engine.zip examples/ingest_job.py \
        [warc_parquet_dir] [cores]

Input: a parquet of (file_id string, blob binary) WARC containers —
``spark.read.format("binaryFile")`` over a crawl dump produces exactly
this shape (path, content).  With no argument the job synthesizes a
small deterministic WARC fixture so the pipeline is runnable anywhere.

Stages (each one operator from the engine):
  1. segment   — sources/warc.parse_warc_records: one narrow Arrow pass,
                 Content-Length-governed; truncated tails and bad gzip
                 members become typed rows, not failures
  2. transcode — sources/transcode.transcode_payloads: BOM/utf-8/latin-1
                 ladder to one canonical text column + charset stats
  3. admit     — operators/robots.robots_admit: longest-match prefix
                 rules per host, Allow wins ties, default allow
  4. schedule  — operators/robots.schedule_fetches: one fetch per host
                 per delay window, priority-ordered (here: recency)
The output is the (url, warc_ts, html, text, lang) pages shape the
extraction pipeline ingests.
"""
import sys

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.plans.session import get_spark
from unified_ocr_pipeline_spark.operators import robots as ROB
from unified_ocr_pipeline_spark.sources import transcode as TC
from unified_ocr_pipeline_spark.sources import warc as WARC


def synth_warc(spark, n_files=8, recs_per_file=50):
    base = spark.range(n_files * recs_per_file).select(
        (F.col("id") % n_files).cast("string").alias("file_id"),
        F.col("id").alias("i"),
    )
    rec = WARC.warc_record_bytes(
        F.lit("response"),
        F.concat(
            F.lit("http://h"), (F.col("i") % 5).cast("string"),
            F.lit(".example.com/"),
            F.when(F.col("i") % 3 == 0, F.lit("private/"))
            .otherwise(F.lit("public/")),
            F.col("i").cast("string"),
        ),
        F.lit("2024-01-01T00:00:00Z"),
        F.encode(
            F.concat(F.lit("page body number "), F.col("i").cast("string")),
            "UTF-8",
        ),
    )
    return (
        base.select("file_id", F.struct("i", rec.alias("r")).alias("s"))
        .groupBy("file_id")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select(
            "file_id",
            F.aggregate(
                "arr", F.lit(b""), lambda a, x: F.concat(a, x["r"])
            ).alias("blob"),
        )
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else None
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="ingest_job", cores=cores,
                      shuffle_partitions=cores * 2)

    blobs = spark.read.parquet(src) if src else synth_warc(spark)

    # 1. segment — persist: the Python-heavy WARC parse feeds both the
    # quarantine count and the whole downstream chain, and the summary
    # at the end fires several actions; without the cache each one
    # re-runs segmentation + transcoding end to end
    recs = WARC.parse_warc_records(blobs, "blob", "file_id").persist()
    ok = recs.where(F.col("warc_type") == "response")
    bad = recs.where(F.col("warc_type") != "response")

    # 2. transcode (keep the record key alongside)
    keyed = ok.select(
        F.concat_ws("#", "file_id", F.col("rec_idx").cast("string")).alias("rk"),
        "target_uri", "warc_date", "payload",
    )
    texts = TC.transcode_payloads(keyed, "payload", "rk")
    pages = keyed.select("rk", "target_uri", "warc_date").join(texts, "rk")

    # 3. admit (one formulaic robots body per host; swap in fetched
    # robots bodies in production)
    host = F.regexp_extract("target_uri", r"^https?://([^/]+)", 1)
    urls = pages.select(
        F.col("target_uri").alias("url"), host.alias("host"),
        "warc_date", "charset", "text",
    )
    hosts = urls.select("host").distinct().select(
        "host",
        F.lit("User-agent: *\nDisallow: /private/\n").alias("body"),
    )
    rules = ROB.robots_rules(hosts, "host", "body")
    admitted = ROB.robots_admit(urls, rules, "url", "host").where("admitted")

    # 4. schedule
    sched = ROB.schedule_fetches(
        admitted.select("url", "host", "warc_date", "charset", "text"),
        "host", "url", delay_sec=5, epoch=1700000000,
    )

    out = sched.select(
        "url",
        F.to_timestamp("warc_date").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
        "charset", "slot", "fetch_at",
    )
    out = out.persist()
    n_all = recs.count()
    n_bad = bad.count()
    n_admit = out.count()
    by_charset = {r["charset"]: r["n"] for r in
                  out.groupBy("charset").agg(F.count("*").alias("n")).collect()}
    print(f"records={n_all} quarantined={n_bad} admitted_pages={n_admit} "
          f"charsets={by_charset}")
    spark.stop()


if __name__ == "__main__":
    main()
