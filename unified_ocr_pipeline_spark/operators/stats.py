"""Table-statistics collection (ANALYZE): per-column profile rows.

A 10^12-row table is operated by its stats: the optimizer's join
ordering and partition pruning, the data-quality dashboards, and the
"did this crawl batch drift?" checks all read the same per-column
profile — row count, null count, distinct count, min/max. The
reference has no table surface at all; this is the maintenance pass
every warehouse-resident corpus needs (Spark's own ANALYZE TABLE
computes exactly these).

Scale shape: a CONSTANT number of table scans regardless of how many
columns are profiled — never the naive one-job-per-column loop. With
exact distinct counts (the verifiable default) Spark plans the
multi-distinct rewrite as two branches (distinct-rewrite Expand +
plain aggregates, joined on the single result row): two scans total,
plan-asserted. With ``approx=True`` the HyperLogLog sketch is a
regular aggregate, so everything collapses into ONE scan — the
10^12-row configuration (off the oracle contract, also
plan-asserted). Either way the one result row pivots into per-column
rows with an explode over a built array — no second pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FRACTIONAL = (T.DoubleType, T.FloatType, T.DecimalType)


def column_stats(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """One row per column in ``cols``: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) with min/max rendered as strings
    (fractional types through printf '%.6f' so external verifiers
    format identically; everything else through a plain cast)."""
    by_name = {f.name: f.dataType for f in df.schema.fields}

    def render(expr: "F.Column", c: str) -> "F.Column":
        # min/max aggregate on the NATIVE type (string-rendering first
        # would make "9" sort above "10"); only the result is rendered.
        if isinstance(by_name[c], _FRACTIONAL):
            return F.format_string("%.6f", expr)
        return expr.cast("string")

    nd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            render(F.min(F.col(c)), c).alias(f"_min_{c}"),
            render(F.max(F.col(c)), c).alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")


def lexical_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity profile: (id, n_tokens, n_types,
    n_hapax, yule_k).

    Yule's K (Yule 1944) = 10^4 * (sum_f f^2 - N) / N^2 over the
    token-frequency spectrum — a length-robust repetitiveness measure
    (machine-generated and template text scores high, natural prose
    low), used alongside the Gopher gates as a cheap quality prior.

    Scale shape: explode to (doc, token), ONE (doc, token) hash-agg
    (partial map-side combine absorbs within-partition repeats — the
    dominant mass for repetitive docs, exactly the ones K flags), then
    ONE doc-keyed agg. All integer arithmetic until the final division;
    round-4 float canon. No windows, no Python, no driver state."""
    toks = df.select(
        F.col(id_col).alias("_ld_id"),
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col(text_col)), r"^\s+|\s+$", ""), r"\s+")
        ).alias("token"),
    ).where(F.col("token") != "")
    freq = toks.groupBy("_ld_id", "token").agg(F.count("*").alias("f"))
    n = F.sum("f")
    s2 = F.sum(F.col("f") * F.col("f"))
    return (
        freq.groupBy("_ld_id")
        .agg(
            n.cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
            F.round(
                F.lit(10000.0)
                * (s2 - n).cast("double")
                / (n * n).cast("double"),
                4,
            ).alias("yule_k"),
        )
        .withColumnRenamed("_ld_id", id_col)
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    cols: Sequence[str],
    bounds: dict,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per column between a reference batch
    and a current batch: PSI = sum_buckets (p - q) * ln(p / q) over
    fixed-width buckets, shares floored at ``eps`` so empty buckets
    contribute finitely. The standard crawl-batch drift alarm
    (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted) — column
    stats say what a batch IS, PSI says how far it MOVED.

    ``bounds`` maps column -> (lo, hi); values clamp into
    [0, n_buckets-1] so outliers land in the edge buckets instead of
    vanishing.

    Scale shape: each side is ONE scan (per-row array of (col, bucket)
    structs, exploded — same constant-scan trick as column_stats) into
    a (col, bucket) hash-agg; the two tiny histograms full-outer join
    on (col, bucket) and one final col-keyed agg emits the PSI row.
    Histogram size = len(cols) * n_buckets regardless of row count."""

    def hist(df: DataFrame, out: str) -> DataFrame:
        structs = []
        for c in cols:
            lo, hi = bounds[c]
            frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(
                float(hi - lo)
            )
            b = F.least(
                F.lit(n_buckets - 1),
                F.greatest(F.lit(0), F.floor(frac * n_buckets).cast("int")),
            )
            structs.append(
                F.struct(F.lit(c).alias("col"), b.alias("bucket"))
            )
        return (
            df.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.col", "s.bucket")
            .groupBy("col", "bucket")
            .agg(F.count("*").alias(out))
        )

    r = hist(ref, "n_ref")
    c = hist(cur, "n_cur")
    j = r.join(c, ["col", "bucket"], "full_outer").select(
        "col",
        "bucket",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = Window.partitionBy("col")
    p = F.greatest(
        F.lit(eps), F.col("n_ref") / F.sum("n_ref").over(tot)
    )
    q = F.greatest(
        F.lit(eps), F.col("n_cur") / F.sum("n_cur").over(tot)
    )
    per_bucket = j.select(
        "col", "bucket", "n_ref", "n_cur",
        ((p - q) * F.log(p / q)).alias("_contrib"),
    )
    return (
        per_bucket.groupBy("col")
        .agg(
            F.sum("n_ref").cast("long").alias("n_ref"),
            F.sum("n_cur").cast("long").alias("n_cur"),
            F.round(F.sum("_contrib"), 6).alias("psi"),
        )
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the raw character
    distribution (case NOT folded — all-caps shouting and base64 case
    mixing are themselves signal) — the classic gibberish detector: keyboard mash and
    base64 blobs run HIGH (toward ln(alphabet)), repeated-padding spam
    runs LOW, natural language sits in a narrow band. Cheap complement
    to the word-level Gopher gates for text with no real words to gate
    on.

    Returns (id, n_chars_counted, n_unique_chars, entropy, band) with
    band cut on the ROUNDED entropy (low < 2.0 <= ok <= 3.8 < high —
    natural language sits ~2.9-3.1 nats, full base64 at ~4.16) so
    a SQL replay can't flip a boundary row on an ulp.

    Scale shape: same as lexical_diversity one level down — explode to
    (doc, char), ONE (doc, char) hash-agg whose map-side combine
    absorbs nearly everything (alphabet-bounded key space), then ONE
    doc agg. No windows, no Python."""
    chars = df.select(
        F.col(id_col).alias("_ce_id"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).where(F.col("ch") != "")
    freq = chars.groupBy("_ce_id", "ch").agg(F.count("*").alias("c"))
    n = F.sum("c")
    # entropy needs per-doc totals: aggregate c*ln(c) and N in ONE agg,
    # then H = ln(N) - sum(c*ln(c))/N  (algebraic identity — avoids a
    # second shuffle to attach N to each (doc, char) row)
    agg = freq.groupBy("_ce_id").agg(
        n.cast("long").alias("n_chars_counted"),
        F.count("*").cast("int").alias("n_unique_chars"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("_clogc"),
    )
    h = F.round(
        F.log(F.col("n_chars_counted").cast("double"))
        - F.col("_clogc") / F.col("n_chars_counted").cast("double"),
        6,
    )
    return agg.select(
        F.col("_ce_id").alias(id_col),
        "n_chars_counted",
        "n_unique_chars",
        h.alias("entropy"),
        F.when(h < 2.0, F.lit("low"))
        .when(h > 3.8, F.lit("high"))
        .otherwise(F.lit("ok"))
        .alias("band"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    approx: bool = False,
) -> DataFrame:
    """Robust per-group outlier flags: |x - median| > k * MAD (median
    absolute deviation). The mean/stddev z-score breaks exactly when
    needed most — a few huge outliers inflate the stddev until nothing
    flags; median/MAD have a 50% breakdown point (Hampel). The
    crawl-ops use: per-host page-size outliers (truncations, payload
    injection) that survive a global filter because hosts differ 100×
    in typical size.

    Returns df's columns plus (group_median, group_mad, is_outlier).
    A zero-MAD group (>= half the values identical) flags only values
    strictly different from the median.

    Scale shape: TWO group-keyed aggregates (median, then MAD over
    |x - med|) joined back — group stat relations are host-sized, so
    both joins broadcast. The exact interpolated percentile (the
    oracle-replayable default) BUFFERS each group's values in the
    aggregation — fine up to millions of rows per group, wrong for a
    10^12-row table; pass ``approx=True`` there for the
    percentile_approx sketch (bounded memory, one pass, off the
    oracle contract — same split as column_stats' HLL mode)."""
    pct = (
        (lambda c: F.percentile_approx(c, F.lit(0.5), F.lit(10000)))
        if approx
        else (lambda c: F.percentile(c, F.lit(0.5)))
    )
    v = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(pct(v).alias("group_median"))
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        pct(F.abs(v - F.col("group_median"))).alias("group_mad")
    )
    out = with_med.join(F.broadcast(mad), group_col)
    dev = F.abs(v - F.col("group_median"))
    return out.withColumn(
        "is_outlier",
        F.when(F.col("group_mad") > 0, dev > F.lit(k) * F.col("group_mad"))
        .otherwise(dev > 0),
    )
