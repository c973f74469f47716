"""Charset transcoding of raw crawl payloads to canonical utf-8 text.

Sits between WARC segmentation (``sources/warc.py``) and the extraction
stage: origin servers emit bytes in whatever encoding they like; every
downstream operator (tokenize, dedup, quality) assumes ONE canonical
text column.  Detection ladder lives in ``kernels/sniff.detect_charset``
(BOMs → strict utf-8 → latin-1 fallback); this module is the narrow
Arrow pass that applies it — no shuffle, payload bytes cross into
Python once per batch and leave as text + a charset label usable for
per-host encoding stats.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.sniff import detect_charset


def transcode_payloads(
    df: DataFrame,
    payload_col: str,
    id_col: str,
) -> DataFrame:
    """(id_col, charset string, text string) — one row per input row.

    ``charset`` ∈ {utf-16le, utf-16be, utf-8-sig, utf-8, ascii,
    latin-1, empty}; ``text`` is NULL only for ``empty``.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, charsets, texts = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                cs, text = detect_charset(
                    bytes(payload) if payload is not None else None
                )
                ids.append(i)
                charsets.append(cs)
                texts.append(text)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "charset": pd.Series(charsets, dtype="object"),
                    "text": pd.Series(texts, dtype="object"),
                }
            )

    return df.mapInPandas(
        gen, schema=f"{id_col} {id_type}, charset string, text string"
    )
