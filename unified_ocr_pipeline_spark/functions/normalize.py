"""Unicode text normalization for web corpora.

Crawled text mixes precomposed and combining-sequence encodings of the
same glyphs ("é" as U+00E9 vs "e"+U+0301); exact dedup, fingerprints, and
token statistics all silently fracture across the two forms unless text is
normalized first. NFC is the standard pick for corpus pipelines (it is
glyph-preserving, unlike NFKC's compatibility folding).

Spark has no built-in Unicode normalizer, so NFC runs as an Arrow-batched
pandas UDF over Python's ``unicodedata`` (C implementation, one call per
value, no per-row Python interpreter loop in the hot path beyond the
str-level normalize itself — the sanctioned kernel pattern). Everything
else in :func:`normalize_text` (case fold, whitespace squeeze, trim) stays
JVM-side. The DuckDB oracle replays the pipeline with ``nfc_normalize`` —
both implement UAX #15, so values hash-match exactly.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc(col: pd.Series) -> pd.Series:
    """Unicode NFC normalization, null-preserving."""
    return col.map(
        lambda s: unicodedata.normalize("NFC", s) if s is not None else None
    )


def normalize_text(col: Column, lowercase: bool = True) -> Column:
    """NFC → (optional) lowercase → collapse whitespace runs to one space
    → trim. The canonical text-cleanup applied before dedup/fingerprints."""
    out = nfc(col)
    if lowercase:
        out = F.lower(out)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# ---------------------------------------------------------------------------
# Mojibake repair (ftfy-lite): UTF-8 double-decoded as Latin-1 / cp1252
# ---------------------------------------------------------------------------
# The scalar kernel lives in kernels/mojibake.py (import-safe on executors:
# this module's pandas_udf decorators need an active session, so workers
# must never have to import it to unpickle a UDF).


@pandas_udf("string")
def fix_mojibake(col: pd.Series) -> pd.Series:
    """ftfy-lite mojibake repair, null-preserving, Arrow-batched."""
    from unified_ocr_pipeline_spark.kernels.mojibake import fix_mojibake_str

    return col.map(fix_mojibake_str)
