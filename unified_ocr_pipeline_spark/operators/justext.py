"""jusText-style context-sensitive block classification.

The extraction kernel's per-block density gate (kernels/html_extract.py,
G4) decides each block in isolation. jusText (Pomikalek 2011, the
boilerplate remover behind many CC-derived corpora) adds the step that
matters on real pages: doubtful blocks (too short / mid-length) inherit
their verdict from the nearest CONTEXT — a short paragraph between two
good paragraphs is content (a heading, a one-line transition), the same
paragraph between two link farms is boilerplate.

This is the simplified two-pass variant (documented, frozen):

Context-free pass (per block, JVM CASE):
  - ``bad``       link_density > max_link_density, or inside a
                  nav/header/footer/aside container
  - ``short``     normalized text shorter than ``length_low`` chars
  - ``near_good`` shorter than ``length_high`` chars
  - ``good``      otherwise

Context-sensitive pass (per doc, two windows):
  - good/bad are "sure" and final.
  - ``near_good`` -> good if the nearest sure block on EITHER side is
    good, else bad.
  - ``short``     -> good only if the nearest sure blocks on BOTH sides
    are good, else bad (page edges count as bad, jusText's boundary
    rule).

Scale shape: the HTML parse is the sanctioned Arrow-batch kernel
pattern (one Python crossing per batch, on scan partitions — raw HTML
never shuffles; block rows leave the stage as short strings + ints).
Classification is a JVM CASE; the context pass is TWO window functions
over (doc, block_idx) — one exchange keyed by doc id, no iteration, no
self-joins. Per-doc block counts are bounded by page size, so the
window partition can't hot-spot.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernels.html_extract import segment_blocks


def page_blocks(pages: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Segment each page's HTML into block rows: (id, block_idx int,
    text string, n_chars int, link_density double, in_boiler boolean).
    block_idx is the emit order of non-empty blocks; n_chars measures
    the whitespace-normalized text; link_density = anchor chars /
    total chars (0.0 for charless blocks)."""
    id_type = dict(pages.dtypes)[id_col]
    schema = (
        f"id {id_type}, block_idx int, text string, n_chars int, "
        "link_density double, in_boiler boolean"
    )

    def gen(batches: Iterator["pd.DataFrame"]):  # noqa: F821
        import pandas as pd

        for b in batches:
            ids, idxs, texts, lens, dens, boil = [], [], [], [], [], []
            for pid, html in zip(b[id_col], b[html_col]):
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                for i, blk in enumerate(segment_blocks(html or "")):
                    ids.append(pid)
                    idxs.append(i)
                    texts.append(blk.text)
                    lens.append(len(blk.text))
                    dens.append(
                        blk.link_chars / blk.total_chars
                        if blk.total_chars
                        else 0.0
                    )
                    boil.append(blk.in_boiler)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "block_idx": idxs,
                    "text": texts,
                    "n_chars": lens,
                    "link_density": dens,
                    "in_boiler": boil,
                }
            )

    return pages.select(id_col, html_col).mapInPandas(gen, schema)


def justext_classify(
    blocks: DataFrame,
    id_col: str = "id",
    idx_col: str = "block_idx",
    max_link_density: float = 0.3,
    length_low: int = 20,
    length_high: int = 60,
) -> DataFrame:
    """Two-pass jusText classification over ``page_blocks`` rows.
    Returns the input columns plus ``class_cf`` (context-free) and
    ``class_final``."""
    cf = (
        F.when(
            (F.col("link_density") > max_link_density) | F.col("in_boiler"),
            F.lit("bad"),
        )
        .when(F.col("n_chars") < length_low, F.lit("short"))
        .when(F.col("n_chars") < length_high, F.lit("near_good"))
        .otherwise(F.lit("good"))
    )
    b = blocks.withColumn("class_cf", cf)
    sure = F.when(
        F.col("class_cf").isin("good", "bad"), F.col("class_cf")
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(id_col)
        .orderBy(idx_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    b = b.withColumn(
        "_prev", F.last(sure, ignorenulls=True).over(w_prev)
    ).withColumn("_next", F.first(sure, ignorenulls=True).over(w_next))
    prev_good = F.col("_prev") == "good"
    next_good = F.col("_next") == "good"
    final = (
        F.when(F.col("class_cf").isin("good", "bad"), F.col("class_cf"))
        .when(
            F.col("class_cf") == "near_good",
            F.when(prev_good | next_good, F.lit("good")).otherwise(F.lit("bad")),
        )
        .otherwise(  # short
            F.when(prev_good & next_good, F.lit("good")).otherwise(F.lit("bad"))
        )
    )
    return b.withColumn("class_final", final).drop("_prev", "_next")
