#!/usr/bin/env python3
"""Web-archive indexing back-end: extracted pages → CDX index with
revisit dedup, per-host storage savings, and structured-data mining —
the stage that runs AFTER examples/extract_job.py on a continuous crawl.

Run:
    zip -qr engine.zip unified_ocr_pipeline_spark
    spark-submit --py-files engine.zip examples/archive_job.py [cores]

Synthesizes a deterministic two-crawl capture history (no external
data), then:
  1. index      — operators/cdx.cdx_index over crawl 1: SURT keys,
                  payload digests, response/revisit classification in
                  ONE surt-keyed exchange
  2. merge      — operators/cdx.cdx_merge: crawl 2 classified against
                  the stored index without recomputing history (the
                  continuous-crawl path)
  3. savings    — operators/cdx.storage_savings: per-host dedup payoff
  4. mine       — functions/html.jsonld_blocks + meta_robots over the
                  stored responses: structured records and page-level
                  noindex opt-outs, all JVM-side
"""
import sys

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.functions import html as HTML
from unified_ocr_pipeline_spark.operators import cdx as CDX
from unified_ocr_pipeline_spark.plans.session import get_spark


def synth_captures(spark, n_pages=200, n_epochs=6):
    base = spark.range(n_pages * n_epochs).select(
        (F.col("id") % n_pages).alias("page"),
        (F.col("id") / n_pages).cast("long").alias("epoch"),
    )
    body = F.concat(
        F.lit('<html><head><script type="application/ld+json">'
              '{"@type":"Article","name":"page '),
        F.col("page").cast("string"),
        F.lit(' v'),
        (F.col("epoch") / 2).cast("long").cast("string"),  # change every 2nd crawl
        F.lit('"}</script>'),
        F.when(F.col("page") % 10 == 0,
               F.lit('<meta name="robots" content="noindex">')).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    )
    return base.select(
        F.concat(F.lit("http://www.Site"), (F.col("page") % 7).cast("string"),
                 F.lit(".example.com/p/"), F.col("page").cast("string")).alias("url"),
        (F.col("epoch") * 1000 + F.col("page")).alias("warc_ts"),
        body.alias("html"),
        F.col("epoch"),
    )


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="archive_job", cores=cores,
                      shuffle_partitions=cores * 2)
    caps = synth_captures(spark).cache()

    stored = CDX.cdx_index(caps.where(F.col("epoch") < 4)).cache()
    by_type = {r["record_type"]: r["n"] for r in
               stored.groupBy("record_type").agg(F.count("*").alias("n")).collect()}
    print(f"crawl-1 index: {by_type}")

    delta = CDX.cdx_merge(stored, caps.where(F.col("epoch") >= 4))
    d_type = {r["record_type"]: r["n"] for r in
              delta.groupBy("record_type").agg(F.count("*").alias("n")).collect()}
    print(f"crawl-2 merge: {d_type}")

    save = CDX.storage_savings(stored).orderBy("host")
    for r in save.collect()[:3]:
        print(f"  {r['host']}: {r['n_revisits']}/{r['n_captures']} revisits "
              f"({r['revisit_share']:.2f})")

    responses = caps.where(F.col("epoch") < 4)
    mined = responses.select(
        F.size(HTML.jsonld_blocks(F.col("html"))).alias("n_ld"),
        *HTML.meta_robots(F.col("html")),
    )
    stats = mined.agg(
        F.sum("n_ld").alias("ld_blocks"),
        F.sum(F.col("noindex").cast("long")).alias("noindex_pages"),
    ).first()
    print(f"mined: {stats['ld_blocks']} json-ld blocks, "
          f"{stats['noindex_pages']} noindex pages")
    spark.stop()


if __name__ == "__main__":
    main()
