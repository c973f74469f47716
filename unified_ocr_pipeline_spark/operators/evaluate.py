"""Extraction-quality evaluation: token-level precision/recall/F1.

The reference validates extraction against golden outputs by byte
identity (``tests/`` fixtures; the north rule's byte-identical clause) —
the right bar for regression-testing ONE extractor.  Comparing two
extractors (or an extractor against human-cleaned gold) needs the
graded version: token-multiset overlap per document, the standard
main-content-extraction metric (trafilatura/boilerpipe benchmarks
report exactly this).

Scale shape: explode both sides to (id, token) COUNTS — the groupBy
partial-aggregates map-side so the shuffle carries per-doc vocabulary,
not token streams — then one join on (id, token) and a final per-doc
agg.  Everything stays in JVM expressions; no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    return toks.groupBy("id", "tok").agg(F.count("*").alias("c"))


def extraction_f1(
    pred: DataFrame,
    gold: DataFrame,
    id_col: str,
    pred_col: str,
    gold_col: str,
) -> DataFrame:
    """Per-document token-multiset P/R/F1 of ``pred`` against ``gold``:
    ``(id_col, n_pred, n_gold, n_common, precision, recall, f1)``.

    ``n_common`` = Σ_tok min(count_pred, count_gold) — the multiset
    intersection, so a prediction that repeats a gold token ten times
    is not credited ten times.  Documents present in only one side get
    the zero-overlap row (full outer join); both-empty documents are
    dropped (no tokens to grade).  Metrics are rounded to 4 so the
    relation replays exactly in SQL.
    """
    p = _token_counts(pred, id_col, pred_col).withColumnRenamed("c", "pc")
    g = _token_counts(gold, id_col, gold_col).withColumnRenamed("c", "gc")
    j = p.join(g, ["id", "tok"], "full_outer").select(
        "id",
        F.coalesce("pc", F.lit(0)).alias("pc"),
        F.coalesce("gc", F.lit(0)).alias("gc"),
    )
    per_doc = j.groupBy("id").agg(
        F.sum("pc").alias("n_pred"),
        F.sum("gc").alias("n_gold"),
        F.sum(F.least("pc", "gc")).alias("n_common"),
    )
    prec = F.when(
        F.col("n_pred") == 0, F.lit(0.0)
    ).otherwise(F.col("n_common") / F.col("n_pred"))
    rec = F.when(
        F.col("n_gold") == 0, F.lit(0.0)
    ).otherwise(F.col("n_common") / F.col("n_gold"))
    f1 = F.when(
        prec + rec == 0, F.lit(0.0)
    ).otherwise(2 * prec * rec / (prec + rec))
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_pred",
        "n_gold",
        "n_common",
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(f1, 4).alias("f1"),
    )


def minhash_estimate_error(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Validate the MinHash estimator against ground truth: for every
    LSH candidate pair, the signature-agreement estimate next to the
    EXACT word-shingle Jaccard and the absolute error — the calibration
    report a dedup pipeline publishes before anyone trusts its
    threshold (Broder 1997's estimator has stddev ~ sqrt(J(1-J)/k);
    this surfaces the empirical error at the configured k).

    Returns (id_a, id_b, est_jaccard, exact_jaccard double, abs_err
    double) for pairs with est >= threshold.

    Scale shape: the expensive exact computation runs ONLY on LSH
    survivors — shingle rows are left-semi-joined down to candidate
    docs first, so the shingle-keyed intersection join is sized by the
    candidate set, never the corpus. Intersection = one join on
    (id_b, shingle) + one pair-keyed hash-agg; set sizes are per-doc
    hash-aggs. exact = |A∩B| / (|A|+|B|-|A∩B|) in one correctly-rounded
    double division, so an external SQL verifier reproduces it
    bit-for-bit.
    """
    from pyspark.storagelevel import StorageLevel

    from .dedup import minhash_lsh_pairs, minhash_signatures, word_shingles

    sigs = minhash_signatures(df, id_col, text_col, num_hashes=num_hashes)
    # pairs feeds three consumers (candidate-id set, intersection join,
    # final join) — without materialization the banding self-join would
    # re-execute for each one.
    pairs = minhash_lsh_pairs(
        sigs, num_hashes=num_hashes, num_bands=num_bands, threshold=threshold
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cand_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # Shrink to candidate docs BEFORE the shingle explode: the explode
    # multiplies rows by shingle count, so the semi-join must run on the
    # doc table, not on exploded shingle rows.
    cand_docs = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_text")
    ).join(cand_ids, "id", "left_semi")
    sh = cand_docs.select(
        "id",
        F.explode(word_shingles(F.col("_text"), shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        pairs.select("id_a", "id_b")
        .join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    exact = F.coalesce("i", F.lit(0)).cast("double") / (
        F.col("na") + F.col("nb") - F.coalesce("i", F.lit(0))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            exact.alias("exact_jaccard"),
            F.abs(F.col("est_jaccard") - exact).alias("abs_err"),
        )
    )


def lsh_pr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Corpus-level precision/recall of the MinHash-LSH near-dup pair
    set against EXACT shingle-Jaccard ground truth at the same
    threshold — the one-row acceptance report for a dedup config
    (bands/rows/threshold) before it runs on the real corpus.

    Returns one row (n_pred, n_truth, tp, fp, fn, prec, rec, f1),
    rounded to 4. Predicted = LSH candidate pairs whose ESTIMATED
    Jaccard clears the threshold; truth = pairs whose exact Jaccard
    does. An LSH miss (banding never collides) is a false negative; an
    estimator overshoot on a below-threshold pair is a false positive.

    Scale shape: both pair sets are the existing scale-safe operators
    (banding join; DF-pruned inverted index) — nothing quadratic is
    added; the comparison itself is one full-outer join on the pair key
    plus a single global aggregate.
    """
    from .dedup import minhash_lsh_pairs, minhash_signatures, ngram_jaccard_pairs

    sigs = minhash_signatures(df, id_col, text_col, num_hashes=num_hashes)
    pred = minhash_lsh_pairs(
        sigs, num_hashes=num_hashes, num_bands=num_bands, threshold=threshold
    ).select("id_a", "id_b", F.lit(True).alias("_p"))
    truth = ngram_jaccard_pairs(
        df,
        id_col,
        text_col,
        shingle_n=shingle_n,
        threshold=threshold,
        max_shingle_df=max_shingle_df,
    ).select("id_a", "id_b", F.lit(True).alias("_t"))
    j = pred.join(truth, ["id_a", "id_b"], "full_outer")
    agg = j.agg(
        F.sum(F.when(F.col("_p") & F.col("_t"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_p") & F.col("_t").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_p").isNull() & F.col("_t"), 1).otherwise(0)).alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") == 0, F.lit(0.0)
    ).otherwise(F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(
        F.col("tp") + F.col("fn") == 0, F.lit(0.0)
    ).otherwise(F.col("tp") / (F.col("tp") + F.col("fn")))
    f1 = F.when(prec + rec == 0, F.lit(0.0)).otherwise(
        2 * prec * rec / (prec + rec)
    )
    return agg.select(
        (F.col("tp") + F.col("fp")).alias("n_pred"),
        (F.col("tp") + F.col("fn")).alias("n_truth"),
        "tp",
        "fp",
        "fn",
        F.round(prec, 4).alias("prec"),
        F.round(rec, 4).alias("rec"),
        F.round(f1, 4).alias("f1"),
    )


def quality_calibration(
    df: "DataFrame", text_col: str = "text", n_buckets: int = 10
) -> "DataFrame":
    """Reliability table for the LR quality classifier against the
    Gopher rule-gate as a weak label: per score-bucket counts, label
    agreement rate, and mean score. The standard pre-deployment check
    for a learned filter — a well-calibrated score's keep_rate climbs
    monotonically with the bucket; a flat table means the classifier
    adds nothing over the rules.

    ONE scan + ONE bucket-keyed hash-agg (both signals are codegen
    Column expressions); the bucket relation is n_buckets rows."""
    from ..functions import text as TX

    t = F.col(text_col)
    score = TX.quality_lr_score(t)
    label = TX.gopher_keep(t)
    bucket = F.least(
        F.lit(n_buckets - 1), F.floor(score * n_buckets).cast("int")
    )
    return (
        df.select(bucket.alias("bucket"), score.alias("_s"), label.alias("_l"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("_l").cast("long")).alias("n_keep"),
            F.round(
                F.sum(F.col("_l").cast("long")) / F.count("*").cast("double"), 4
            ).alias("keep_rate"),
            F.round(F.sum("_s") / F.count("*").cast("double"), 4).alias(
                "avg_score"
            ),
        )
    )
