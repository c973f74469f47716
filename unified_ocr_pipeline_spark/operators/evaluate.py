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
