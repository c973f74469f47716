"""Connected components over near-duplicate pairs → dedup clusters.

The missing last step of every LSH dedup pipeline: ``minhash_lsh_pairs`` /
``simhash_near_dups`` / ``cosine_near_dup_pairs`` emit *pairs*, but corpus
curation needs *clusters* — "these 40 documents are all the same article;
keep one". Near-duplicate similarity is not transitive, yet treating the
pair graph's connected components as clusters is the standard practice in
web-corpus dedup (a doc is dropped if it is a near-dup of ANY kept doc, so
the keep-set must pick exactly one representative per component).

Algorithm: iterative min-label propagation with pointer jumping
(path-halving), the DataFrame rendering of classic parallel
union-find / Hash-to-Min style CC:

    L'(v) = min( L(v),  min over neighbors u of L(u),  L(L(v)) )

The ``L(L(v))`` term (pointer jump) halves chain lengths each round, so
convergence is O(log n) iterations even on path graphs — a plain
neighbor-min propagation needs O(diameter) rounds, which on a 10^6-node
chain never finishes. Each iteration is two hash joins on the node id plus
one hash aggregate; ``localCheckpoint`` truncates the lineage each round so
the plan does not grow exponentially (the classic iterative-Spark trap).

Scale posture at 100 TB: the edge set from a banded LSH join is orders of
magnitude smaller than the corpus (only candidate near-dups appear), the
per-iteration shuffles partition on the node id with map-side partial
aggregation, and dedup graphs converge in a handful of rounds because
near-dup clusters are dense (diameter 1-2) — the log-n bound only matters
for adversarial chains, which the pointer jump handles. The driver-side
loop runs O(log n) actions, each a full distributed pass; no per-row data
ever reaches the driver except the single converged/changed counter.

Reference has no dedup surface at all; this extends the engine for
training-data curation (brief: "Deduplication ... as first-class
components").
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node
    id reachable from it.

    Parameters
    ----------
    edges : DataFrame with two same-type, orderable node-id columns
        ``src`` and ``dst`` — numeric doc ids and url strings both work
        (min/least over the natural ordering). Direction and duplicates
        are irrelevant.
    max_iter : safety bound on propagation rounds. With pointer jumping,
        25 rounds cover components of ~2^25 chained nodes; real dedup
        components converge in 2-4.

    Returns (id, component) with one row per distinct node, id-typed like
    the input. Deterministic: the component label is the min node id,
    independent of partitioning or iteration order.

    Raises RuntimeError if ``max_iter`` rounds did not converge (never on
    sane inputs; the bound exists so a pathological graph fails loudly
    instead of looping forever).
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col("s").isNotNull() & F.col("t").isNotNull())
    )
    # Undirected: keep each edge once in canonical (min, max) order; the
    # propagation step sends labels both ways explicitly.
    e = (
        e.select(F.least("s", "t").alias("s"), F.greatest("s", "t").alias("t"))
        .where(F.col("s") != F.col("t"))
        .dropDuplicates(["s", "t"])
        .localCheckpoint(eager=True)
    )

    labels = (
        e.select(F.col("s").alias("id"))
        .unionByName(e.select(F.col("t").alias("id")))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Neighbor messages, both directions (edge stored once).
        fwd = e.join(labels, e.s == labels.id).select(
            F.col("t").alias("id"), "lbl"
        )
        bwd = e.join(labels, e.t == labels.id).select(
            F.col("s").alias("id"), "lbl"
        )
        # Pointer jump: my label's current label.
        parent = labels.alias("a").join(
            labels.alias("b"), F.col("a.lbl") == F.col("b.id")
        ).select(F.col("a.id").alias("id"), F.col("b.lbl").alias("lbl"))

        new_labels = (
            labels.unionByName(fwd).unionByName(bwd).unionByName(parent)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        # Per-round snapshots: Dataset.unpersist would be a no-op here
        # (localCheckpoint persists the underlying RDD directly, not via
        # the CacheManager). Dropping our reference lets Spark's
        # ContextCleaner unpersist the checkpointed blocks once the JVM
        # handle is GC'd; peak live state is therefore O(|V|) per round
        # still referenced (current + in-flight), not O(rounds × |V|)
        # pinned forever.
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("lbl").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    prefer_col: Optional[str] = None,
) -> DataFrame:
    """Assign every document a dedup component and mark one canonical
    representative per component.

    Documents that appear in no pair form singleton components (their own
    id). The canonical doc is the one with the highest ``prefer_col``
    value (e.g. a quality score), ties and the default broken by lowest
    id — deterministic either way.

    Returns ALL of df's columns plus (component: same type as the id,
    is_canonical: boolean). A pre-existing ``component``/``is_canonical``
    column on df is rejected up front (the alternative — silently
    overwriting or an ambiguous-reference error deep in the plan — both
    lose). Works for numeric AND string (url) ids — the component label is
    the min id under the type's natural ordering. One hash join against
    the (small) component map — broadcast when it fits — plus one window
    over component for the canonical pick. The window partitions on
    ``component``; near-dup components are small by construction (LSH caps
    flood buckets upstream), so no skew hazard.
    """
    clash = {"component", "is_canonical"} & set(df.columns)
    if clash:
        raise ValueError(
            f"dedup_clusters adds output columns {sorted(clash)} that "
            "already exist on the input — rename or drop them first"
        )
    # Renamed join key: with id_col == "id" a bare drop("id") after the
    # join would remove BOTH columns (Spark drops every match by name).
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "id", "_cc_id"
    )
    out = (
        df.join(comp, df[id_col] == comp._cc_id, "left")
        .drop("_cc_id")
        .withColumn(
            "component",
            F.coalesce(F.col("component"), F.col(id_col)),
        )
    )
    from pyspark.sql import Window

    order = (
        [F.col(prefer_col).desc(), F.col(id_col).asc()]
        if prefer_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy("component").orderBy(*order)
    return out.withColumn(
        "is_canonical", F.row_number().over(w) == F.lit(1)
    )


def cluster_subsample(
    clustered: DataFrame,
    id_col: str,
    rate: float,
    seed: str = "cs1",
) -> DataFrame:
    """Cluster-aware subsampling of a dedup_clusters result: every
    canonical representative is kept; each non-canonical member is kept
    independently with probability ``rate`` — the standard
    soft-dedup policy (near-dups are partly redundant, not worthless:
    keeping a hash-sampled fraction preserves paraphrase diversity
    while cutting the redundancy mass; dropping to rate=0.0 is hard
    dedup).

    Deterministic: the keep decision is ``md5_60(seed || id) < rate *
    2^60`` — re-runs reproduce the same training set, the rate can be
    changed without reshuffling survivors of other rates arbitrarily,
    and an external SQL verifier replays the decision exactly.

    Returns the input rows that survive, with a ``kept_as`` column
    ('canonical' | 'sampled'). Pure projection + filter on top of the
    clustered frame — no additional shuffle.
    """
    from ..operators.sampling import md5_60

    u = md5_60(
        F.concat(F.lit(seed), F.col(id_col).cast("string"))
    ).cast("double")
    keep_sampled = u < F.lit(float(rate) * float(2**60))
    out = clustered.where(F.col("is_canonical") | keep_sampled)
    return out.withColumn(
        "kept_as",
        F.when(F.col("is_canonical"), F.lit("canonical")).otherwise(
            F.lit("sampled")
        ),
    )
