#!/usr/bin/env python3
"""Training-data curation over an extracted/documents table: boilerplate
strip → dedup → decontaminate → quality gate → stratified balance → pack
into context windows.

Run:
    spark-submit --py-files engine.zip examples/curate_job.py \
        <documents_parquet> [cores] [benchmark_parquet]

The input needs (doc_id, text, lang, source) columns — the driver
testdata documents table shape. Stages:
  0. line-level boilerplate strip (C4-style: drop lines shared by many
     docs — nav bars, cookie banners, footers)
  1. exact dedup (hash groups, keep one per group)
  2. MinHash-LSH near-dup pairs (flood-capped banding join) → connected
     components → keep the highest-quality doc per cluster
  2b. (optional, when a benchmark parquet is given) eval-benchmark
     decontamination: drop docs sharing 8-grams with the held-out set
  2c. semantic dedup from RAW TEXT: deterministic hashed-n-gram
     featurizer (text_embed) -> kmeans-trained IVF cells -> SemDeDup
     keep-set — catches paraphrase-level duplicates token-level LSH
     misses, with no external embedding model
  3. per-lang quality gate (keep the top half by Gopher-style score)
  3b. learned quality gate: quality_lr_train distills the rule gate
     into a trained LR (bounded gradient passes), gated at the corpus's
     own per-lang score median
  4. per-source stratified sample (balance the corpus); for token-budget
     mixtures use SAMP.mixture_sample / mixture_sample_rate instead
  5. concat-and-chunk packing into 4096-char context windows
"""
import sys

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.plans.session import get_spark
from unified_ocr_pipeline_spark.functions import text as TX
from unified_ocr_pipeline_spark.operators import cc as CC
from unified_ocr_pipeline_spark.operators import curation as CUR
from unified_ocr_pipeline_spark.operators import dedup as DD
from unified_ocr_pipeline_spark.operators import featurize as FZ
from unified_ocr_pipeline_spark.operators import ivf as IVF
from unified_ocr_pipeline_spark.operators import sampling as SAMP


def main() -> None:
    docs_path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    bench_path = sys.argv[3] if len(sys.argv) > 3 else None

    spark = get_spark(app_name="curate_job", cores=cores,
                      shuffle_partitions=max(cores, 16))
    d = spark.read.parquet(docs_path)
    n0 = d.count()

    # 0. line-level boilerplate strip: replaces text with the de-templated
    # version, drops docs that were ALL boilerplate
    clean = CUR.line_dedup(d, "doc_id", "text", max_df=max(10, n0 // 100))
    d = (
        d.drop("text")
        .join(clean.where(F.col("n_lines_kept") > 0)
              .select(F.col("id").alias("doc_id"),
                      F.col("clean_text").alias("text")),
              "doc_id")
    )

    # 1. exact dedup
    keep = DD.exact_dedup_groups(d, "doc_id", "text").select(
        F.col("keeper_id").alias("doc_id")
    )
    d = d.join(keep, "doc_id", "left_semi")
    n1 = d.count()

    # 2. near-dup removal: pairs → clusters → keep one per cluster.
    # Clustering (not pairwise drop-the-higher-id) is what makes chains
    # safe: for pairs (A,B) and (B,C) a pairwise drop removes B AND C,
    # while the component {A,B,C} keeps exactly its best-quality member.
    sigs = DD.minhash_signatures(d, "doc_id", "text", num_hashes=32)
    pairs = DD.minhash_lsh_pairs(
        sigs, num_hashes=32, num_bands=8, threshold=0.7, max_band_bucket=10_000
    )
    d = d.withColumn("q", TX.quality_score(F.col("text")))
    # persist: the decontamination join, the featurizer pass, and the
    # semantic-dedup anti-join below all re-read this relation (released
    # once the post-semantic corpus is materialized)
    d_cc = (
        CC.dedup_clusters(d, pairs, "doc_id", prefer_col="q")
        .where("is_canonical")
        .drop("component", "is_canonical")
        .persist()
    )
    d = d_cc
    n2 = d.count()

    # 2b. optional eval-benchmark decontamination (GPT-3/Gopher hygiene)
    if bench_path:
        bench = spark.read.parquet(bench_path)
        flags = CUR.decontaminate(d, bench, "doc_id", "text",
                                  n=8, min_overlap=1)
        d = d.join(
            flags.where(~F.col("contaminated"))
            .select(F.col("id").alias("doc_id")),
            "doc_id", "left_semi",
        )

    # 2c. semantic dedup from raw text: the featurizer makes the
    # embedding path runnable with zero model dependencies; cells are
    # trained on a bounded sample, candidate pairs stay cell-local
    emb = FZ.text_embed(d, "text", "doc_id", dim=64).persist()
    cents = IVF.kmeans_train(emb, "emb", n_cells=16, sample_rows=100_000)
    sem = IVF.semantic_dedup(emb, "doc_id", "emb", cents, threshold=0.97)
    sem_drop = sem.where(~F.col("is_canonical")).select(
        F.col("id").alias("doc_id")
    )
    # persist the post-SEMANTIC corpus (the relation every later stage
    # reads), materialize it, then release the superseded upstream
    # caches — exactly one corpus-sized cache stays live at a time
    d = d.join(sem_drop, "doc_id", "left_anti").persist()
    n2c = d.count()
    emb.unpersist()
    d_cc.unpersist()

    # 3. quality gate: Gopher-style score (computed above for the
    # canonical pick), keep top half per lang.
    # Persist here: everything above (exact-dedup join + MinHash UDF +
    # LSH self-join + CC) is the dominant cost and feeds three more actions.
    d_sem = d
    d = SAMP.quantile_gate_per_group(
        d, ["lang"], "q", 0.5, tie_cols=["doc_id"]
    ).persist()
    n3 = d.count()
    d_sem.unpersist()

    # 3b. learned gate on top of the rule gate: train the LR on the
    # surviving corpus (one feature scan, 4 bounded gradient passes),
    # then gate at the corpus's own score median — deployment picks the
    # threshold from a quantile, not an absolute 0.5 (a skewed corpus
    # shifts the whole score distribution)
    wts = FZ.quality_lr_train(d, "text", iters=4, lr=0.5)
    d = d.withColumn("lr_q", FZ.quality_lr_score_trained("text", wts))
    d = SAMP.quantile_gate_per_group(
        d, ["lang"], "lr_q", 0.5, tie_cols=["doc_id"]
    ).drop("lr_q")
    n3b = d.count()

    # 4. balance per source
    d = SAMP.sample_per_group(d, ["source"], "doc_id", 1_000_000)
    # 5. pack into context windows (weight derived from the text itself —
    # only (doc_id, text, lang, source) are required of the input)
    d = d.withColumn("weight", F.length("text"))
    packed = SAMP.pack_sequences(d, ["lang"], "doc_id", "weight", 4096)
    windows = packed.agg(F.max("pack_window")).first()[0]

    print(f"docs: raw={n0} exact_dedup={n1} near_dedup={n2} "
          f"sem_dedup={n2c} quality_gated={n3} lr_gated={n3b} "
          f"windows<=?{windows}")
    spark.stop()


if __name__ == "__main__":
    main()
