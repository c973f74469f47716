"""Crawl link-graph extraction: page HTML -> outlink edges -> domain stats.

The north star's corpus is Common-Crawl-style pages; the link graph is
the other first-class artifact a crawl pipeline produces besides text
(PageRank-family quality priors, host-level dedup hints, seed discovery).
The reference is a single-host document pipeline with no link surface;
this family is mandated by the round brief's web-scale posture.

Scale shape: href parsing is the sanctioned Arrow-batch kernel pattern
(kernels/html_extract.extract_links, compiled stdlib parser, one
JVM<->Python crossing per batch, runs on scan partitions BEFORE any
exchange — edges leave the Python stage as small strings, the raw HTML
never shuffles). Host extraction and the degree aggregation are JVM
expressions + one hash-agg keyed by host (map-side partial combine).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.html_extract import extract_anchors, extract_links

_HOST_RE = r"^https?://([^/?#]+)"


def outlink_edges(pages: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """One row per (src_url, href) absolute outlink, document order
    preserved per page via link_pos. HTML may be string or binary
    (utf-8, errors replaced)."""

    def gen(batches: Iterator["pd.DataFrame"]):  # noqa: F821
        import pandas as pd

        for pdf in batches:
            srcs, hrefs, poss = [], [], []
            for url, html in zip(pdf["_url"], pdf["_html"]):
                if html is None:
                    continue
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                for i, href in enumerate(extract_links(html)):
                    srcs.append(url)
                    hrefs.append(href)
                    poss.append(i)
            yield pd.DataFrame(
                {"src_url": srcs, "href": hrefs, "link_pos": poss}
            )

    narrow = pages.select(
        F.col(url_col).alias("_url"), F.col(html_col).alias("_html")
    )
    return narrow.mapInPandas(
        gen, schema="src_url string, href string, link_pos int"
    )


def domain_link_stats(edges: DataFrame) -> DataFrame:
    """Aggregate the edge list to per-destination-host stats:
    (dst_host, n_links, n_src_urls). One hash-agg; the two counts share
    the shuffle (count + count_distinct via expand)."""
    return (
        edges.select(
            F.regexp_extract("href", _HOST_RE, 1).alias("dst_host"), "src_url"
        )
        .where(F.col("dst_host") != "")
        .groupBy("dst_host")
        .agg(
            F.count("*").alias("n_links"),
            F.count_distinct("src_url").alias("n_src_urls"),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list (Page et al. 1999;
    crawl-quality prior / seed ranking). rank_0 = 1/N over the edge
    list's node set; rank_{t+1}(v) = (1-d)/N + d * sum over in-edges
    u->v of rank_t(u)/outdeg(u). Dangling nodes' mass is dropped (ranks
    sum to < 1) — the variant that needs no global redistribution join;
    fixed iteration count (not convergence-tested) keeps the result a
    pure function of the input, replayable as chained SQL CTEs.

    Scale shape: per iteration ONE shuffle join of the rank vector
    against the (src-partitioned) edge list plus ONE hash-agg keyed by
    dst — the textbook Pregel-on-DataFrames layout. The edge list with
    out-degrees is computed once and reused every iteration (at cluster
    scale: persist it; same pattern as operators/cc.py). Lineage is
    truncated with localCheckpoint every ``checkpoint_every`` iterations
    — same guard as the connected-components loop — so deep iteration
    counts don't compound the plan.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg), reused per iteration — materialized so each
    # iteration (and the nodes relation) doesn't re-execute the upstream
    # edge parse; without the barrier an expensive parse stage runs once
    # per reference per iteration
    graph = e.join(outdeg, "src").localCheckpoint(eager=False)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for it in range(iterations):
        contribs = (
            graph.join(ranks, graph["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration HITS hubs/authorities (Kleinberg 1999) over an
    edge list — the directory-page vs content-page split PageRank can't
    express (a crawl frontier wants hub pages for discovery, authority
    pages for content).

    h_0 = 1; per iteration: a(v) = Σ_{u→v} h(u) then L1-normalize,
    h(u) = Σ_{u→v} a(v) then L1-normalize.  L1 (sum) normalization is
    chosen over the classical L2 because it replays in SQL as a scalar
    subquery with no sqrt-of-sum-of-squares ordering hazard, and the
    fixed iteration count keeps the result a pure input function.

    Scale shape mirrors :func:`pagerank`: per iteration two shuffle
    joins of a node-sized vector against the edge list and two hash
    aggs; the normalizing sums stay IN-PLAN as single-row broadcast
    cross joins (no driver action per iteration); localCheckpoint
    truncates lineage on deep runs.

    Materialization: ``e``/``nodes`` and each iteration's ``a_raw``/
    ``h_raw`` are lazily localCheckpoint'ed — each is referenced twice
    (the raw vector by its normalizing total AND the join; the edge list
    twice per iteration), and without a materialization barrier Spark
    re-executes the whole upstream subtree per reference, which
    compounds ~4× per iteration when the edge list comes from an
    expensive parse stage (measured 11.3 s → ~1 s on the link-graph
    bench query at sf0.1).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    # iterations=0 returns the initial state (h=1, a=0) like
    # pagerank(iterations=0) returns its initial rank vector
    auth = nodes.select("node", F.lit(0.0).alias("auth"))
    for it in range(iterations):
        a_raw = (
            e.join(hub, e["src"] == hub["node"])
            .select("dst", "hub")
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
            .localCheckpoint(eager=False)
        )
        a_tot = a_raw.agg(F.sum("a_raw").alias("a_tot"))
        auth = (
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "node",
                (F.coalesce(F.col("a_raw"), F.lit(0.0)) / F.col("a_tot")).alias(
                    "auth"
                ),
            )
        )
        h_raw = (
            e.join(auth, e["dst"] == auth["node"])
            .select("src", "auth")
            .groupBy("src")
            .agg(F.sum("auth").alias("h_raw"))
            .localCheckpoint(eager=False)
        )
        h_tot = h_raw.agg(F.sum("h_raw").alias("h_tot"))
        hub = (
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "node",
                (F.coalesce(F.col("h_raw"), F.lit(0.0)) / F.col("h_tot")).alias(
                    "hub"
                ),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            hub = hub.localCheckpoint(eager=False)
            auth = auth.localCheckpoint(eager=False)
    return hub.join(auth, "node")


def frontier_bfs(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    seeds: DataFrame,
    max_depth: int = 3,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Crawl-frontier expansion: breadth-first reachability from seed
    nodes with hop labels — ``(node, depth int)``, depth = MINIMUM hop
    count ≤ ``max_depth`` (the "crawl N hops out from the seed list"
    primitive every focused crawl starts with).

    Per hop: ONE join of the frontier against the (src-keyed) edge list
    + a distinct + an anti-join against the visited set — the visited
    anti-join is what makes first-discovery depth equal min depth and
    keeps the frontier from re-expanding explored nodes (textbook
    Pregel BFS on DataFrames).  Bounded driver loop (``max_depth``
    iterations, no data-dependent actions), localCheckpoint lineage
    guard like :func:`pagerank`.  ``seeds`` is a DataFrame with a
    ``node`` column.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    visited = seeds.select("node").distinct().withColumn("depth", F.lit(0))
    frontier = visited.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        visited = visited.unionByName(nxt)
        if d % checkpoint_every == 0 and d < max_depth:
            visited = visited.localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


def anchor_edges(pages: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """One row per (src_url, href, anchor, link_pos) absolute outlink
    WITH its visible anchor text — the raw material for anchor-text
    aggregation. Same Arrow-batch shape as outlink_edges: the stdlib
    HTML parser runs on scan partitions (raw HTML never shuffles), and
    only the small (url, href, anchor) triples enter any exchange."""

    def gen(batches: Iterator["pd.DataFrame"]):  # noqa: F821
        import pandas as pd

        for pdf in batches:
            srcs, hrefs, texts, poss = [], [], [], []
            for url, html in zip(pdf["_url"], pdf["_html"]):
                if html is None:
                    continue
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                for i, (href, text) in enumerate(extract_anchors(html)):
                    srcs.append(url)
                    hrefs.append(href)
                    texts.append(text)
                    poss.append(i)
            yield pd.DataFrame(
                {
                    "src_url": srcs,
                    "href": hrefs,
                    "anchor": texts,
                    "link_pos": poss,
                }
            )

    narrow = pages.select(
        F.col(url_col).alias("_url"), F.col(html_col).alias("_html")
    )
    return narrow.mapInPandas(
        gen, schema="src_url string, href string, anchor string, link_pos int"
    )


def anchor_text_profile(edges: DataFrame) -> DataFrame:
    """Per-destination-host anchor-text consensus — the classic web
    signal (what OTHER pages call a host describes it better than the
    host describes itself; every crawl-era ranking/labeling pipeline
    aggregates it). Returns (dst_host, n_anchors, n_texts, top_anchor,
    top_anchor_n): total inbound anchors, distinct texts, and the most
    frequent text (ties broken by lexicographically smallest, so the
    result is deterministic).

    Scale shape: the (host, anchor) count agg runs FIRST with map-side
    partial agg, so the rank window — one reducer per HOST otherwise —
    only ever sees <= |distinct texts per host| rows, not the raw edge
    list. Two exchanges total, both keyed on dst_host (AQE coalesces
    the second into the first's partitioning when sizes allow)."""
    from pyspark.sql import Window

    by_text = (
        edges.select(
            F.regexp_extract("href", _HOST_RE, 1).alias("dst_host"), "anchor"
        )
        .where(F.col("dst_host") != "")
        .groupBy("dst_host", "anchor")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), F.col("anchor"))
    return (
        by_text.withColumn("_rk", F.row_number().over(w))
        .groupBy("dst_host")
        .agg(
            F.sum("n").alias("n_anchors"),
            F.count("*").alias("n_texts"),
            F.max(F.when(F.col("_rk") == 1, F.col("anchor"))).alias("top_anchor"),
            F.max(F.when(F.col("_rk") == 1, F.col("n"))).alias("top_anchor_n"),
        )
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str,
    dst_col: str,
    seed_col: str = "node",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration TrustRank (Gyongyi, Garcia-Molina & Pedersen,
    VLDB 2004): PageRank with the teleport vector restricted to a
    hand-vetted trusted seed set, so trust decays with link distance
    from the seeds and spam farms (reachable only through spam links)
    receive ~0 — the standard crawl-corpus quality prior next to raw
    PageRank. t_0(v) = 1/|S| for seeds else 0;
    t_{k+1}(v) = d * sum_{u->v} t_k(u)/outdeg(u) + (1-d) * seed(v)/|S|.
    Dangling mass is dropped (same variant as ``pagerank`` above —
    no global redistribution join, pure function of the input,
    replayable as chained SQL CTEs).

    ``seeds`` is a one-column DataFrame (``seed_col``) of trusted node
    ids; ids not present in the edge list's node set are ignored.

    Scale shape: identical to ``pagerank`` — per iteration ONE shuffle
    join of the trust vector against the src-keyed edge list plus ONE
    dst-keyed hash-agg; the seed membership is resolved ONCE up front
    with a left-semi join and folded into a static per-node teleport
    column carried through the loop (seed set never re-joined per
    iteration). localCheckpoint lineage guard as in ``pagerank``.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed_nodes = nodes.join(
        seeds.select(F.col(seed_col).alias("node")).distinct(), "node", "left_semi"
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        return nodes.withColumn("trust", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # reused every iteration — materialized (see pagerank)
    graph = e.join(outdeg, "src").localCheckpoint(eager=False)

    # Static teleport column: (1-d)/|S| on seeds, 0 elsewhere. Carried
    # on the node frame so each iteration needs no extra join; referenced
    # once per iteration AND by each next trust frame -> materialized.
    base = nodes.join(
        seed_nodes.withColumn("_is_seed", F.lit(True)), "node", "left"
    ).select(
        "node",
        F.when(F.col("_is_seed"), F.lit(1.0 / n_seeds))
        .otherwise(F.lit(0.0))
        .alias("seed_mass"),
    ).localCheckpoint(eager=False)
    trust = base.select("node", F.col("seed_mass").alias("trust"), "seed_mass")
    for it in range(iterations):
        contribs = (
            graph.join(trust, graph["src"] == trust["node"])
            .select("dst", (F.col("trust") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        trust = (
            base.join(contribs, base["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                    + F.lit(1.0 - damping) * F.col("seed_mass")
                ).alias("trust"),
                "seed_mass",
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            trust = trust.localCheckpoint(eager=False)
    return trust.select("node", "trust")


def host_reciprocity(
    edges: DataFrame, src_col: str = "src_host", dst_col: str = "dst_host"
) -> DataFrame:
    """Per-host reciprocal-link profile — the classic link-farm signal
    (organic linking is overwhelmingly one-directional; mutual-exchange
    rings reciprocate most of their outlinks, TrustRank/SpamRank-era
    heuristics gate on exactly this ratio).

    Returns (src_host, n_out_hosts, n_reciprocal, reciprocity double):
    distinct outlinked hosts (self-loops excluded), how many of them link
    back, and the ratio.

    Scale shape: the graph first collapses to DISTINCT host pairs (one
    hash-agg with map-side combine — url-level multiplicity never enters
    the join), then one self-join keyed on the composite (dst, src) pair
    detects back-edges, then one hash-agg per src. Nothing exceeds
    O(distinct host edges); no driver-side collection.
    """
    pairs = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .where((F.col("a") != "") & (F.col("b") != ""))
        .distinct()
    )
    back = pairs.select(F.col("a").alias("b"), F.col("b").alias("a"))
    marked = pairs.join(back, ["a", "b"], "left_semi").select(
        F.col("a"), F.lit(1).alias("_recip")
    )
    per_src = pairs.groupBy("a").agg(F.count("*").alias("n_out_hosts"))
    recip = marked.groupBy("a").agg(F.count("*").alias("n_reciprocal"))
    return (
        per_src.join(recip, "a", "left")
        .select(
            F.col("a").alias("src_host"),
            "n_out_hosts",
            F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"),
            (
                F.coalesce("n_reciprocal", F.lit(0)).cast("double")
                / F.col("n_out_hosts")
            ).alias("reciprocity"),
        )
    )


def co_citation(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    max_fanout: int = 64,
) -> DataFrame:
    """Co-citation counts between destination hosts (Small 1973, the
    classic relatedness signal web IR built on): two hosts are related
    in proportion to how many pages link to BOTH. Feeds related-site
    discovery and seed expansion for a focused crawl.

    Returns (host_a, host_b, n_cocite) with host_a < host_b.

    Scale shape: the graph first collapses to DISTINCT (src, dst) pairs
    (one hash-agg; url-level multiplicity never enters the join). The
    self-join on src is the quadratic hazard — a directory page linking
    10^4 hosts contributes 10^8 pairs — so sources with more than
    ``max_fanout`` distinct destinations are dropped whole (hub pages
    assert nothing about relatedness; same flood-guard posture as the
    LSH band cap). After the cap, per-src pair fanout is bounded by
    max_fanout^2, and the final count is one (a, b)-keyed hash-agg.
    """
    pairs = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("dst") != "")
        .distinct()
    )
    fan = pairs.groupBy("src").agg(F.count("*").alias("_fan"))
    kept = pairs.join(
        fan.where(F.col("_fan") <= max_fanout).select("src"), "src", "left_semi"
    )
    l = kept.select("src", F.col("dst").alias("host_a"))
    r = kept.select("src", F.col("dst").alias("host_b"))
    return (
        l.join(r, "src")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_cocite"))
    )


def label_propagation(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) over the UNDIRECTED simple graph of an edge list — community
    detection for host graphs (site networks, link farms, mirror
    families surface as one community; a crawl scheduler spreads budget
    across communities instead of hammering one).

    Semantics (a pure function of the input, replayable as chained SQL
    CTEs — same determinism discipline as :func:`pagerank`):

    - nodes = distinct endpoints; label_0(v) = v (its own id);
    - adjacency = distinct undirected neighbor pairs (multi-edges and
      self-loops dropped — multiplicity is fetch-count noise here, and a
      self-loop would just vote for the node's current label);
    - label_{t+1}(v) = the most frequent label among v's neighbors at
      time t, ties broken by MIN label; isolated nodes keep their label.

    Synchronous updates with a fixed iteration count (not
    convergence-tested): deterministic, at the cost of possible 2-cycles
    on bipartite structures — the standard trade for replayability.

    Scale shape: per iteration ONE shuffle join of the label vector
    against the (node-partitioned) adjacency plus ONE (node, label)
    hash-agg with map-side combine plus ONE node-keyed window for the
    argmax — the Pregel-on-DataFrames layout, same as pagerank/trustrank.
    The adjacency is materialized once and reused; each label frame is
    pinned per round (it is referenced twice by the next one — vote join
    + carry-forward — so the subtree would double per iteration
    otherwise). Hub nodes make the (node, label) agg
    key skew-prone; the partial agg absorbs it (each map task emits one
    row per (node, label) it saw).

    Returns (node, label) — nodes sharing a label form one community.
    """
    from pyspark.sql import Window

    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    # (a=node, b=neighbor), both directions, simple graph — materialized:
    # referenced every iteration, and each reference would re-execute the
    # upstream edge parse (see pagerank)
    adj = (
        e.select("a", "b")
        .union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for it in range(iterations):
        votes = (
            adj.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        labels = labels.join(best, "node", "left").select(
            "node", F.coalesce(F.col("_new"), F.col("label")).alias("label")
        )
        if it + 1 < iterations:
            # each labels frame is referenced TWICE next round (the vote
            # join and the carry-forward join) — without a barrier the
            # subtree doubles per iteration; node-sized, cheap to pin
            labels = labels.localCheckpoint(eager=False)
    return labels


def degree_histogram(edges: DataFrame, node_col: str) -> DataFrame:
    """Degree distribution of the link graph: one row per distinct
    in-degree (n_nodes holding it) plus the log10 pair the power-law
    fit reads — the Broder et al. 2000 bow-tie-era crawl diagnostic
    (web in-degree follows a power law; a crawl whose exponent drifts
    batch-over-batch has a frontier or spam problem).

    Scale shape: TWO hash-aggs back to back — (node) count then
    (degree) count — both with map-side partial aggregation; the second
    agg's key space is tiny (distinct degree values), so the histogram
    relation is dashboard-sized no matter how many nodes the graph has.
    No windows, no Python."""
    deg = edges.groupBy(F.col(node_col).alias("node")).agg(
        F.count("*").alias("degree")
    )
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .select(
            F.col("degree").cast("long").alias("degree"),
            "n_nodes",
            F.round(F.log10(F.col("degree").cast("double")), 4).alias("log_degree"),
            F.round(F.log10(F.col("n_nodes").cast("double")), 4).alias("log_n_nodes"),
        )
    )
