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


# ---------------------------------------------------------------------------
# Invisible characters and bidi controls (Trojan-Source hygiene)
# ---------------------------------------------------------------------------
# Zero-width and direction-override codepoints are invisible to humans
# but not to tokenizers or hash-based dedup: spam farms pad duplicates
# with U+200B to defeat exact dedup, and RTL overrides (Boucher &
# Anderson 2021, "Trojan Source") reorder what reviewers see. A
# training corpus wants them counted, flagged, and stripped. One char
# class each, Java∩RE2∩DuckDB (\x{...} escapes), codegen regexp ops.

# The bidi set covers the explicit overrides/embeddings (U+202A-E) and
# isolates (U+2066-69) AND the implicit directional marks LRM/RLM
# (U+200E/200F) + ALM (U+061C) — the marks also reorder rendered text
# and would otherwise survive the strip.
ZERO_WIDTH_REGEX = r"[\x{200B}-\x{200D}\x{FEFF}\x{00AD}]"
BIDI_CONTROL_REGEX = (
    r"[\x{202A}-\x{202E}\x{2066}-\x{2069}\x{200E}\x{200F}\x{061C}]"
)
INVISIBLE_REGEX = (
    r"[\x{200B}-\x{200D}\x{FEFF}\x{00AD}"
    r"\x{202A}-\x{202E}\x{2066}-\x{2069}\x{200E}\x{200F}\x{061C}]"
)


def invisible_counts(text: Column) -> tuple[Column, Column]:
    """(n_zero_width, n_bidi_controls) in the raw text."""
    return (
        F.regexp_count(text, F.lit(ZERO_WIDTH_REGEX)).cast("int"),
        F.regexp_count(text, F.lit(BIDI_CONTROL_REGEX)).cast("int"),
    )


def strip_invisible(text: Column) -> Column:
    """Remove zero-width chars and bidi controls (the dedup-evasion and
    display-spoofing set). Deliberately narrow: legitimate invisible
    whitespace (plain space, tab, newline) is untouched."""
    return F.regexp_replace(text, INVISIBLE_REGEX, "")
