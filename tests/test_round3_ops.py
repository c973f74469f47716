"""Round-3 final-batch operators: label propagation, HTML tables,
DOM-skeleton templates, prototypicality pruning."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

def test_lpa_two_triangles_bridge(spark):
    """Two triangles joined by one bridge edge converge to two
    communities, each labeled by its min member."""
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    e = spark.createDataFrame(tri1 + tri2 + [("c", "x")], "s string, d string")
    got = {
        r["node"]: r["label"]
        for r in LG.label_propagation(e, "s", "d", iterations=4).collect()
    }
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"]
    assert got["x"] != "a"


def test_lpa_isolated_self_loop_keeps_label(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    # self-loop only -> no neighbors after the a != b filter
    e = spark.createDataFrame([("s", "s"), ("p", "q")], "s string, d string")
    got = {
        r["node"]: r["label"]
        for r in LG.label_propagation(e, "s", "d", iterations=2).collect()
    }
    assert got["s"] == "s"
    # p<->q (undirected): each adopts the other's label, twice -> back home
    assert got["p"] == "p" and got["q"] == "q"


def test_lpa_tie_breaks_to_min_label(spark):
    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    # m has two neighbors with distinct labels (1 vote each) -> min wins
    e = spark.createDataFrame([("b", "m"), ("z", "m")], "s string, d string")
    got = {
        r["node"]: r["label"]
        for r in LG.label_propagation(e, "s", "d", iterations=1).collect()
    }
    assert got["m"] == "b"


def test_lpa_python_differential_random_graph(spark):
    """3 rounds on a seeded random graph vs a pure-Python replay."""
    import random

    from unified_ocr_pipeline_spark.operators import linkgraph as LG

    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = sorted({
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(50)
    })
    e = spark.createDataFrame(edges, "s string, d string")
    got = {
        r["node"]: r["label"]
        for r in LG.label_propagation(e, "s", "d", iterations=3).collect()
    }

    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    present = sorted({x for ab in edges for x in ab})
    lab = {v: v for v in present}
    for _ in range(3):
        new = {}
        for v in present:
            votes = {}
            for u in adj.get(v, ()):
                votes[lab[u]] = votes.get(lab[u], 0) + 1
            new[v] = (
                min(l for l, c in votes.items() if c == max(votes.values()))
                if votes
                else lab[v]
            )
        lab = new
    assert got == lab


# ---------------------------------------------------------------------------
# page_tables / skeleton_key / template_profile
# ---------------------------------------------------------------------------

def test_page_tables_basic_and_noise(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    html = (
        '<TABLE class="z"><TR><TH>h1</TH><TH>h2</TH></TR>'
        "<tr><td> a \n b </td><td><b>c</b>d</td></tr></TABLE>"
        "<p>between</p><table><tr><td>solo</td></tr></table>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    rows = {
        (r["table_idx"], r["row_idx"], r["col_idx"]): r["cell"]
        for r in MD.page_tables(pages).collect()
    }
    assert rows == {
        (0, 0, 0): "h1",
        (0, 0, 1): "h2",
        (0, 1, 0): "a b",
        (0, 1, 1): "c d",
        (1, 0, 0): "solo",
    }


def test_page_tables_no_table_yields_no_rows(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    pages = spark.createDataFrame(
        [("u", "<html><p>nothing</p></html>")], "url string, html string"
    )
    assert MD.page_tables(pages).count() == 0


def test_skeleton_key_ignores_text_attrs_case_and_closers(spark):
    from unified_ocr_pipeline_spark.functions import html as H

    df = spark.createDataFrame(
        [
            ("<html><body><p>aaa</p></body></html>",),
            ('<HTML lang="en"><BODY class="x"><P id="1">zzz</P></BODY></HTML>',),
            ("<html><body><p>bbb</p><p>ccc</p></body></html>",),
        ],
        "html string",
    )
    keys = [r["k"] for r in df.select(H.skeleton_key("html").alias("k")).collect()]
    assert keys[0] == keys[1]          # text/attrs/case don't matter
    assert keys[0] != keys[2]          # structure does


def test_template_profile_shares(spark):
    from unified_ocr_pipeline_spark.operators import metadata as MD

    mk = lambda host, i, body: (f"http://{host}/p{i}", body)  # noqa: E731
    rows = (
        [mk("a.com", i, "<html><p>x</p></html>") for i in range(3)]
        + [mk("a.com", 9, "<html><div>y</div></html>")]
        + [mk("b.com", 0, "<html><p>z</p></html>")]
    )
    pages = spark.createDataFrame(rows, "url string, html string")
    got = {
        (r["host"], r["n_pages"]): (r["host_pages"], r["template_share"])
        for r in MD.template_profile(pages).collect()
    }
    assert got[("a.com", 3)] == (4, 0.75)
    assert got[("a.com", 1)] == (4, 0.25)
    assert got[("b.com", 1)] == (1, 1.0)


# ---------------------------------------------------------------------------
# prototypicality_prune
# ---------------------------------------------------------------------------

def _vec(*xs):
    return [float(x) for x in xs]


def test_proto_prune_hard_keeps_least_prototypical(spark):
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    # two orthogonal centroids; per cell: one aligned (easy) vector,
    # two progressively rotated (hard) ones
    cents = [_vec(1, 0), _vec(0, 1)]
    rows = [
        (0, _vec(10, 0)),     # cell 0, sim 1.0
        (1, _vec(10, 4)),     # cell 0, harder
        (2, _vec(10, 9)),     # cell 0, hardest (still nearer c0)
        (3, _vec(0, 7)),      # cell 1, sim 1.0
        (4, _vec(2, 7)),      # cell 1, harder
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["id"]: r
        for r in IVF.prototypicality_prune(
            df, "vec_id", "embedding", cents, keep_frac=0.5, keep="hard"
        ).collect()
    }
    assert {i: out[i]["cell"] for i in range(5)} == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}
    # cell 0 (3 rows): ceil(1.5)=2 kept, hardest first = ids 2 then 1
    assert out[2]["rnk"] == 1 and out[2]["kept"]
    assert out[1]["rnk"] == 2 and out[1]["kept"]
    assert out[0]["rnk"] == 3 and not out[0]["kept"]
    # cell 1 (2 rows): ceil(1.0)=1 kept -> the rotated one
    assert out[4]["kept"] and not out[3]["kept"]
    assert out[3]["proto_sim"] == 1.0


def test_proto_prune_easy_inverts_order(spark):
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    cents = [_vec(1, 0)]
    rows = [(0, _vec(5, 0)), (1, _vec(5, 5))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["id"]: r
        for r in IVF.prototypicality_prune(
            df, "vec_id", "embedding", cents, keep_frac=0.5, keep="easy"
        ).collect()
    }
    assert out[0]["rnk"] == 1 and out[0]["kept"]
    assert out[1]["rnk"] == 2 and not out[1]["kept"]


def test_proto_prune_ceil_never_empties_cell(spark):
    from unified_ocr_pipeline_spark.operators import ivf as IVF

    cents = [_vec(1, 0)]
    df = spark.createDataFrame([(0, _vec(3, 1))], "vec_id long, embedding array<double>")
    out = IVF.prototypicality_prune(
        df, "vec_id", "embedding", cents, keep_frac=0.01, keep="hard"
    ).collect()
    assert len(out) == 1 and out[0]["kept"]


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------

def _plan_of(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_page_tables_plan_is_narrow(spark):
    """The table fan-out must stay on the scan partitions: three Generate
    nodes, ZERO exchanges, no Python — raw HTML never shuffles."""
    from unified_ocr_pipeline_spark.operators import metadata as MD

    pages = spark.createDataFrame(
        [("u", "<table><tr><td>x</td></tr></table>")], "url string, html string"
    )
    import re

    plan = _plan_of(MD.page_tables(pages))
    assert "Exchange" not in plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 3
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_template_profile_window_runs_on_aggregated_relation(spark):
    """skeleton_key must stay in codegen (no Python) and the host window
    must consume the ALREADY-aggregated (host, skeleton) relation — the
    agg sits BELOW the window in the tree (printed deeper/later), so the
    full page set never enters the window exchange."""
    from unified_ocr_pipeline_spark.operators import metadata as MD

    pages = spark.createDataFrame(
        [("http://a/x", "<p>t</p>")], "url string, html string"
    )
    plan = _plan_of(MD.template_profile(pages))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.index("Window") < plan.index("HashAggregate")
