"""Connected-components / dedup-cluster tests: path graphs (pointer-jump
convergence), multiple components, isolated nodes, canonical pick."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.operators import cc as CC


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_two_components_and_dup_edges(spark):
    # component {1,2,3,4} (with a duplicate + reversed edge) and {10,11}
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (2, 1), (1, 2), (10, 11)])
    got = {r["id"]: r["component"] for r in CC.connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_long_path_converges(spark):
    # 64-node path: plain neighbor propagation needs 63 rounds; pointer
    # jumping must finish well inside max_iter=10.
    e = _edges(spark, [(i, i + 1) for i in range(63)])
    got = CC.connected_components(e, max_iter=10)
    rows = got.collect()
    assert len(rows) == 64
    assert {r["component"] for r in rows} == {0}


def test_cc_self_loops_ignored(spark):
    e = _edges(spark, [(5, 5), (6, 7)])
    got = {r["id"]: r["component"] for r in CC.connected_components(e).collect()}
    # 5 only had a self-loop: it never enters the node set (no real edge),
    # which is fine — dedup_clusters backfills singletons from the corpus.
    assert got == {6: 6, 7: 6}


def test_dedup_clusters_canonical_by_quality(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (9, 0.1)],
        "doc_id long, quality double",
    )
    pairs = _edges(spark, [(1, 2), (2, 3)])
    out = CC.dedup_clusters(docs, pairs, "doc_id", prefer_col="quality")
    rows = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in out.collect()}
    # {1,2,3} one component labelled 1; doc 2 wins on quality; 9 is a
    # singleton component of itself and canonical by default.
    assert rows == {1: (1, False), 2: (1, True), 3: (1, False), 9: (9, True)}


def test_dedup_clusters_default_min_id(spark):
    docs = spark.createDataFrame([(7,), (8,)], "doc_id long")
    pairs = _edges(spark, [(7, 8)])
    out = CC.dedup_clusters(docs, pairs, "doc_id")
    rows = {r["doc_id"]: r["is_canonical"] for r in out.collect()}
    assert rows == {7: True, 8: False}


def test_dedup_clusters_rejects_output_column_clash(spark):
    import pytest

    docs = spark.createDataFrame([(7, 0)], "doc_id long, component int")
    pairs = _edges(spark, [(7, 7)])
    with pytest.raises(ValueError, match="component"):
        CC.dedup_clusters(docs, pairs, "doc_id")


def test_incremental_pairs_between(spark):
    import random
    from unified_ocr_pipeline_spark.operators import dedup as DD

    rng = random.Random(11)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    mk = lambda: " ".join(rng.choice(words) for _ in range(60))
    base = mk()
    corpus_rows = [(i, mk()) for i in range(20)] + [(100, base)]
    toks = base.split()
    toks[7] = "OMEGA"
    new_rows = [(101, base), (102, " ".join(toks)), (103, mk())]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    csigs = DD.minhash_signatures(corpus, "doc_id", "text", num_hashes=32)
    nsigs = DD.minhash_signatures(new, "doc_id", "text", num_hashes=32)
    pairs = DD.minhash_lsh_pairs_between(
        nsigs, csigs, num_hashes=32, num_bands=8, threshold=0.5
    )
    got = {(r["new_id"], r["corpus_id"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(101, 100)] == 1.0          # exact copy of a corpus doc
    assert all(c == 100 for _, c in got)   # fresh docs match nothing


def test_cc_string_ids(spark):
    # url-keyed corpora: ids are strings; component = lexicographic min
    docs = spark.createDataFrame(
        [("http://a/1",), ("http://b/2",), ("http://c/3",)], "url string"
    )
    pairs = spark.createDataFrame(
        [("http://b/2", "http://a/1")], "id_a string, id_b string"
    )
    out = CC.dedup_clusters(docs, pairs, "url")
    rows = {r["url"]: (r["component"], r["is_canonical"]) for r in out.collect()}
    assert rows == {
        "http://a/1": ("http://a/1", True),
        "http://b/2": ("http://a/1", False),
        "http://c/3": ("http://c/3", True),
    }


def test_cc_random_graphs_vs_union_find(spark):
    # Differential: 20 seeded random graphs vs a pure-Python union-find.
    import random

    def uf_components(n_nodes, edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical: min node id per component
        comp = {}
        for v in list(parent):
            comp[v] = find(v)
        # path-compress to true roots (roots map to themselves = min id,
        # because union always parents the larger root under the smaller)
        return {v: find(v) for v in parent}

    rng = random.Random(42)
    for trial in range(20):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        expected = uf_components(n, edges)
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["id"]: r["component"]
               for r in CC.connected_components(e, max_iter=12).collect()}
        assert got == expected, (trial, edges)
