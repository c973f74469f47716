"""OCR-quality grading and quality-gated extraction routing — exact
reference semantics (SURVEY.md §2 F21/U3/F23).

Pure-Python kernels mirror the reference bug-for-bug:

- :func:`assess_ocr_quality` — the FAILED/POOR/FAIR/GOOD/EXCELLENT CASE
  (/root/reference/scripts/unified_ocr_pipeline.py:797-821).
- :func:`overall_quality` — the per-page 2/1/0 scoring and the
  HIGH/MEDIUM/LOW average thresholds (:838-854).
- :func:`route_strategy` / :func:`quality_gated_extract` — the
  HIGH/MEDIUM→AI, LOW→regex-fallback routing (:858-865, 882-885), with the
  AI step an injectable callable (the deterministic contract never invokes
  a live model; see operators/llm.py for the stubbed seam).
- :func:`format_ai_data` — the deterministic AI-output post-formatter
  (:887-919): part-number dash→asterisk OP rewrite, MJO number isolation,
  quantity whole-number normalization.

Column variants (:func:`quality_grade_col`, :func:`route_col`) express the
same CASE logic as JVM-side expressions so the grading/routing surface is
usable in pure DataFrame plans (and checkable by the driver's SQL oracle)
without crossing into Python.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence

from .fields import fallback_regex_extraction, find_po_number, format_part_number

GRADE_FAILED = "FAILED"
GRADE_POOR = "POOR"
GRADE_FAIR = "FAIR"
GRADE_GOOD = "GOOD"
GRADE_EXCELLENT = "EXCELLENT"

QUALITY_HIGH = "HIGH"
QUALITY_MEDIUM = "MEDIUM"
QUALITY_LOW = "LOW"
QUALITY_UNKNOWN = "UNKNOWN"

# F21 keyword list, byte-identical to the reference (:806-807)
_PO_INDICATOR_KEYWORDS = ["purchase order", "po", "meggitt", "vendor", "date"]

# F23 MJO patterns (:901, :906)
_MJO_FROM_LABEL = re.compile(r"Production Order[:\s]*(\d+)", re.IGNORECASE)
_MJO_STANDALONE = re.compile(r"(\d{8,12})")


def assess_ocr_quality(text: str, confidence: float) -> str:
    """F21 (:797-821): grade OCR output from text characteristics and the
    engine-reported confidence. Thresholds, keyword set, and branch order
    are the reference's exactly."""
    if not text.strip():
        return GRADE_FAILED

    text_length = len(text.strip())
    lower = text.lower()
    has_po_indicators = any(k in lower for k in _PO_INDICATOR_KEYWORDS)
    has_numbers = any(ch.isdigit() for ch in text)
    has_meaningful_length = text_length > 50

    if confidence > 80 and has_po_indicators and has_meaningful_length:
        return GRADE_EXCELLENT
    elif confidence > 60 and (has_po_indicators or has_numbers) and text_length > 30:
        return GRADE_GOOD
    elif confidence > 40 and text_length > 20:
        return GRADE_FAIR
    elif confidence > 20 and text_length > 10:
        return GRADE_POOR
    return GRADE_FAILED


def page_quality_score(grade: str) -> int:
    """The 2/1/0 page score the reference accumulates (:839-844)."""
    if grade in (GRADE_EXCELLENT, GRADE_GOOD):
        return 2
    if grade == GRADE_FAIR:
        return 1
    return 0


def overall_quality(grades: Sequence[str]) -> str:
    """HIGH/MEDIUM/LOW from per-page grades (:846-854): avg score ≥ 1.5 →
    HIGH, ≥ 0.5 → MEDIUM, else LOW; no graded pages → UNKNOWN (:827)."""
    scores = [page_quality_score(g) for g in grades]
    if not scores:
        return QUALITY_UNKNOWN
    avg = sum(scores) / len(scores)
    if avg >= 1.5:
        return QUALITY_HIGH
    elif avg >= 0.5:
        return QUALITY_MEDIUM
    return QUALITY_LOW


def route_strategy(quality: str) -> str:
    """U3 (:862-865): LOW (or ungraded) OCR quality routes to the regex
    fallback; HIGH/MEDIUM routes to the AI extractor."""
    return "ai" if quality in (QUALITY_HIGH, QUALITY_MEDIUM) else "regex"


def format_ai_data(ai_data: Optional[Dict[str, object]]) -> Optional[Dict[str, object]]:
    """F23 (:887-919): deterministic post-formatting of an AI-extracted
    record. Pure — returns a new dict; the reference mutates in place but
    the key-by-key transforms are identical:

    - PART_NUMBER → dash-OP to asterisk-OP rewrite (via F16, :894);
    - MJO_NO (when truthy) → isolate the number from a 'Production Order:
      123456' phrase, else the first standalone 8-12 digit run, else keep
      the original text (:896-908);
    - QTY_SHIP → non-empty strings to whole numbers via int(float(x)),
      keeping the original on conversion failure (:910-917).
    """
    if not ai_data:
        return ai_data
    out = dict(ai_data)
    if "PART_NUMBER" in out:
        out["PART_NUMBER"] = format_part_number(out["PART_NUMBER"])
    if "MJO_NO" in out and out["MJO_NO"]:
        mjo_text = str(out["MJO_NO"])
        m = _MJO_FROM_LABEL.search(mjo_text)
        if m:
            out["MJO_NO"] = m.group(1)
        else:
            m = _MJO_STANDALONE.search(mjo_text)
            if m:
                out["MJO_NO"] = m.group(1)
    if "QTY_SHIP" in out:
        try:
            qty = out["QTY_SHIP"]
            if isinstance(qty, str) and qty:
                out["QTY_SHIP"] = str(int(float(qty)))
        except (ValueError, TypeError):
            pass
    return out


def quality_gated_extract(
    pages: Sequence[str],
    confidences: Sequence[float],
    ai_fn: Optional[Callable[[str], Dict[str, object]]] = None,
) -> Dict[str, object]:
    """U3 end-to-end (:823-885): grade the first two pages, compute overall
    quality, and route — HIGH/MEDIUM with an available AI callable goes to
    ``ai_fn`` (output post-formatted by F23), anything else (LOW quality,
    no text, no/failed AI) falls back to the deterministic regex record.

    The returned record carries ``_strategy`` ('ai' | 'regex') and
    ``_ocr_quality`` so routing decisions are observable downstream (the
    reference logs them, :856)."""
    graded: List[str] = []
    combined_parts: List[str] = []
    for i, text in enumerate(pages[:2]):
        if text:
            conf = confidences[i] if i < len(confidences) else 0.0
            graded.append(assess_ocr_quality(text, conf))
            combined_parts.append(text)
    quality = overall_quality(graded)
    combined = "\n".join(combined_parts)

    po = find_po_number(pages)
    po_final = po if po else "UNKNOWN_PO"

    strategy = route_strategy(quality)
    if strategy == "ai" and combined.strip() and ai_fn is not None:
        try:
            ai_out = ai_fn(combined)
            if ai_out:
                rec = dict(format_ai_data(ai_out))
                rec["_strategy"] = "ai"
                rec["_ocr_quality"] = quality
                return rec
        except Exception:
            pass  # reference: AI failure falls through to regex (:880-885)
    rec = dict(fallback_regex_extraction(pages, po_final))
    rec["_strategy"] = "regex"
    rec["_ocr_quality"] = quality
    return rec


# ---------------------------------------------------------------------------
# Column variants — the same CASE logic as JVM-side expressions
# ---------------------------------------------------------------------------

def quality_grade_col(text, confidence):
    """F21 as a Catalyst expression (whole-stage-codegen friendly): same
    thresholds/keywords as :func:`assess_ocr_quality`. ``text`` and
    ``confidence`` are Columns.

    Parity notes vs the Python kernel: ``str.strip()`` → a ``\\s`` regexp
    trim (F.trim strips only spaces, so a trailing newline would move a
    text across a length threshold); ``str.isdigit()`` → ``\\p{Nd}``
    (Unicode decimal digits — isdigit additionally accepts a handful of
    No-category characters like superscripts, accepted divergence)."""
    from pyspark.sql import functions as F

    trimmed_len = F.length(F.regexp_replace(text, r"^\s+|\s+$", ""))
    lower = F.lower(text)
    has_ind = None
    for k in _PO_INDICATOR_KEYWORDS:
        term = F.instr(lower, F.lit(k)) > 0
        has_ind = term if has_ind is None else (has_ind | term)
    has_num = text.rlike(r"\p{Nd}")
    return (
        F.when(trimmed_len == 0, GRADE_FAILED)
        .when(
            (confidence > 80) & has_ind & (trimmed_len > 50), GRADE_EXCELLENT
        )
        .when(
            (confidence > 60) & (has_ind | has_num) & (trimmed_len > 30),
            GRADE_GOOD,
        )
        .when((confidence > 40) & (trimmed_len > 20), GRADE_FAIR)
        .when((confidence > 20) & (trimmed_len > 10), GRADE_POOR)
        .otherwise(GRADE_FAILED)
    )


def route_col(grade):
    """U3 single-page routing as a Catalyst expression: the page's 2/1/0
    score IS the average for a one-page document, so EXCELLENT/GOOD → HIGH,
    FAIR → MEDIUM, else LOW; HIGH/MEDIUM → 'ai', LOW → 'regex'."""
    from pyspark.sql import functions as F

    overall = (
        F.when(grade.isin(GRADE_EXCELLENT, GRADE_GOOD), QUALITY_HIGH)
        .when(grade == GRADE_FAIR, QUALITY_MEDIUM)
        .otherwise(QUALITY_LOW)
    )
    return overall, F.when(
        overall.isin(QUALITY_HIGH, QUALITY_MEDIUM), "ai"
    ).otherwise("regex")
