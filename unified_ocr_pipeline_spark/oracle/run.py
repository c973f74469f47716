"""Single-threaded reference-semantics oracle (SURVEY.md §7.1 layer 3).

Reads a pages parquet directory with pyarrow (no Spark), applies the SAME
kernels the Spark stage uses — the kernels themselves are unit-pinned to the
reference via differential tests (tests/test_fields.py) — in a plain
sequential loop, with the pipeline's dedup semantics (one row per url,
latest warc_ts wins). The result is the golden the distributed output must
match byte-for-byte per url.
"""

from __future__ import annotations

import glob
from typing import Dict

import pyarrow.parquet as pq

from ..kernels import document as D


def run_oracle(pages_path: str, max_bytes: int = D.DEFAULT_MAX_BYTES) -> Dict[str, D.DocumentResult]:
    """Return {url: DocumentResult} goldens for every url in the input."""
    latest: Dict[str, tuple] = {}
    files = sorted(glob.glob(f"{pages_path}/*.parquet")) or [pages_path]
    for f in files:
        table = pq.read_table(f, columns=["url", "warc_ts", "html", "text"])
        for row in table.to_pylist():
            url = row["url"]
            prev = latest.get(url)
            if prev is None or row["warc_ts"] > prev[0]:
                latest[url] = (row["warc_ts"], row["html"], row["text"])

    out: Dict[str, D.DocumentResult] = {}
    for url, (_, payload, text) in latest.items():
        out[url] = D.process_document(url, payload, text, max_bytes=max_bytes)
    return out
