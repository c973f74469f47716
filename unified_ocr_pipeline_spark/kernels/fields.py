"""Field-extraction cascades — exact reference semantics (SURVEY.md §2.8 F1-F19).

Every function here reimplements one extractor from
/root/reference/scripts/unified_ocr_pipeline.py with IDENTICAL regexes, flag
sets, cascade order, and first-match-wins page iteration, because the byte
-identity contract (BASELINE.json north_rule) requires bug-compatibility —
including the reference's known quirks, preserved deliberately:

- F18's ``[^\\n]`` literal-backslash character class (:613) — the class
  excludes backslash and the letter 'n', NOT newline.
- F2's confusion dict where the duplicate '8' key collapses to ``8→0`` (:767-772).
- F19's first findall pass overwrites across pages while the second pass is
  first-wins (:629-640).

All patterns are compiled once at module import (per Python worker), unlike
the reference which recompiles per call (:341, :360, ...) — the rebuild's
batch-level amortization (SURVEY.md §4 "vectorized extraction stage").

Input convention: ``pages`` is the ordered list of per-page text strings
(reference's ``results["pages"][i]["text"]``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

# ---------------------------------------------------------------------------
# Compiled patterns (pattern strings byte-identical to the reference)
# ---------------------------------------------------------------------------

_I = re.IGNORECASE
_ID = re.IGNORECASE | re.DOTALL

# F1 — PO number cascade (unified_ocr_pipeline.py:205-214)
_PO_CASCADE = [
    re.compile(r"Purchase\s*[Oo]rder\s*(\d{10})", _I),
    re.compile(r"PO\s*[:\-]?\s*(\d{10})", _I),
    re.compile(r"(45\d{8})"),
    re.compile(r"(\d{10})"),
]

# F2 — OCR confusion table (:767-772). The reference's dict literal repeats
# the key '8' ({'3':'8','8':'3'} then {'0':'8','8':'0'}); Python keeps the
# LAST value, so the effective mapping is 8→0 (never 8→3).
_CONFUSIONS = {"5": "6", "6": "5", "3": "8", "8": "0", "0": "8", "1": "7", "7": "1"}

# F4 — vendor (:343, :347, :351)
_VENDOR_ADDR = re.compile(r"Vendor address[^\n]*\n([^\n]+)", _I)
_VENDOR_LEADING_DIGITS = re.compile(r"^\d+\s")
_VENDOR_COMPANY = re.compile(
    r"([A-Z][A-Z\s,\.&]+(?:INC|LLC|CORP|COMPANY|CO|ENTERPRISES)[A-Z\s,\.]*)", _I
)

# F5 — order date (:362)
_ORDER_DATE = re.compile(r"Date[:\s]*(\d{1,2}[/\-]\d{1,2}[/\-]\d{4})", _I)

# F6 — amount cascade (:373-378)
_AMOUNT_CASCADE = [
    re.compile(r"Total amount[:\s]*([\d,]+\.?\d*)", _I),
    re.compile(r"Net value[:\s]*([\d,]+\.?\d*)", _I),
    re.compile(r"amount[:\s]*\$?([\d,]+\.?\d*)", _I),
    re.compile(r"\$[\s]*([\d,]+\.?\d*)", _I),
]

# F7 — delivery date cascade (:392, :397, :402)
_DELIVERY_DATE = re.compile(
    r"Delivery Date[^\n]*\n[^\n]*?(\d{1,2}/\d{1,2}/\d{4})", _ID
)
_DOCK_DATE = re.compile(r"Dockdate[:\s]*(\d{1,2}/\d{1,2}/\d{4})", _I)
_EA_DATE = re.compile(r"EA[^\n]*?(\d{1,2}/\d{1,2}/\d{4})", _I)

# F8 — vendor number (:412)
_VENDOR_NUMBER = re.compile(r"Vendor number[:\s]*(\d+)", _I)

# F9 — buyer name / phone / email (:422, :432, :442)
_BUYER_NAME = re.compile(r"Buyer/phone[:\s]*([^/]+)", _I)
_BUYER_PHONE = re.compile(r"Buyer/phone[:\s]*[^/]+/\s*(\d{3}-\d{3}-\d{4})", _I)
_BUYER_EMAIL = re.compile(r"Buyer E-mail[:\s]*([^\s]+@[^\s]+)", _I)

# F10 — part number (:453)
_PART_NUMBER = re.compile(r"(\d{6}-\d+[A-Z]*)")

# F11 — quantity (:464)
_QUANTITY = re.compile(r"Quantity[:\s]*(\d+\.?\d*)", _I)

# F12 — net-per price (:475)
_NET_PER = re.compile(
    r"Net Per[:\s]*UM[:\s]*Dockdate[:\s]*Net[:\s]*.*?(\d+,\d+\.\d+)", _ID
)

# F3 — strict FileMaker PO (:487)
_PO_STRICT = re.compile(r"(45\d{8})")

# F13 — production order / MJO cascade (:500, :505, :510)
_PROD_ORDER = re.compile(r"Production Order[:\s]*(\d+)", _I)
_MJO = re.compile(r"MJO[:\s#]*(\d+)", _I)
_STANDALONE_9_12 = re.compile(r"(\d{9,12})")

# F14 — quantity-shipped 9-pattern cascade (:525-544)
_QTY_SHIP_CASCADE = [
    re.compile(r"Delivery Date[^\n]*\n[^\n]*Quantity[^\n]*\n[^\n]*?(\d+\.?\d*)", _ID),
    re.compile(r"QTY[:\s]*(\d+\.?\d*)", _ID),
    re.compile(r"Quantity[:\s]*(\d+\.?\d*)", _ID),
    re.compile(r"(\d+\.?\d*)\s*EA", _ID),
    re.compile(r"Ship\s*Qty[:\s]*(\d+\.?\d*)", _ID),
    re.compile(r"Shipped[:\s]*(\d+\.?\d*)", _ID),
    re.compile(r"(\d+\.?\d*)\s*(?:EACH|EA)\b", _ID),
    re.compile(r"Delivery[^\n]*?(\d+\.?\d*)", _ID),
    re.compile(r"\b(\d{1,4})\b(?!\d)", _ID),
]

# F15 — part number with OP code (:563, :570)
_PART_OP = re.compile(r"(\d{6}-?\d*[A-Z]*)\s+(OP\d+)", _I)
_PART_ASSEMBLY = re.compile(
    r"(\d{6}-?\d*[A-Z]*)\s+(\w+\d+)\s+(?:ASSEMBLY|BODY ASSY)", _I
)

# F16 — part-number formatter (:589)
_DASH_OP = re.compile(r"-OP(\d+)$")

# F17 — DPAS rating (:599)
_DPAS = re.compile(r"DPAS[:\s]*([A-Z]\d+)", _I)

# F18 — payment terms (:613). The reference writes r"Payment terms[:\s]*([^\\n]+)"
# — inside a raw string ``\\n`` is backslash+n, so the negated class excludes
# the backslash character and the letter 'n' (newline IS allowed to match).
# Preserved bug-for-bug.
_PAYMENT_TERMS = re.compile(r"Payment terms[:\s]*([^\\n]+)", _I)

# F19 — quality clauses (:629, :636)
_QCLAUSE_DELIMITED = re.compile(
    r"(Q\d+)\s+([A-Z][A-Z\s,\[\]()]+?)(?=\s*Q\d+|\s*$|\n\n)", _ID
)
_QCLAUSE_STANDALONE = re.compile(r"(Q\d+)\s*([A-Z][A-Z\s,\[\]()]{10,50})", _I)
# cheap necessary-condition probe for both Q-clause patterns (a letter Q/q
# immediately followed by a digit) — skips the two expensive findalls on
# pages that cannot match
_QCLAUSE_PROBE = re.compile(r"[Qq]\d")


# ---------------------------------------------------------------------------
# F1 + F2 — inline PO extraction with OCR-error validation
# ---------------------------------------------------------------------------

def validate_po_number(po_number: str, full_text: str) -> bool:
    """OCR-error validation — reference semantics (:754-795).

    Accept if the candidate occurs ≥2 times; else reject when any
    single-digit confusion alternative occurs MORE often; else accept iff
    it starts with '45' and is all digits.
    """
    # candidates are all-digit strings (regex \d groups), so counting the
    # literal with str.count is exactly re.findall's non-overlapping
    # left-to-right count — without compiling a fresh pattern per call
    # (the reference compiles per call, :758; measured ~10% of kernel time)
    count = (
        full_text.count
        if po_number.isdigit()
        else (lambda s: len(re.findall(s, full_text)))
    )
    po_occurrences = count(po_number)
    if po_occurrences >= 2:
        return True
    for pos in range(len(po_number)):
        original = po_number[pos]
        alt = _CONFUSIONS.get(original)
        if alt is not None:
            alternative_po = po_number[:pos] + alt + po_number[pos + 1:]
            if count(alternative_po) > po_occurrences:
                return False
    return po_number.startswith("45") and po_number.isdigit()


def find_po_number(pages: Sequence[str]) -> Optional[str]:
    """F1 — 4-pattern cascade over the first 2 pages, first valid wins
    (:198-231). Returns None when no page yields a validated PO.
    """
    po_number: Optional[str] = None
    for page_num, text in enumerate(pages):
        if page_num >= 2:
            break
        if not text or po_number:
            continue
        match = None
        for pat in _PO_CASCADE:
            match = pat.search(text)
            if match:
                break
        if match:
            candidate = match.group(1)
            # Format gate (:220) then OCR-confusion validation (:223)
            if len(candidate) == 10 and candidate.startswith("45"):
                if validate_po_number(candidate, text):
                    po_number = candidate
    return po_number


# ---------------------------------------------------------------------------
# F3-F19 — the FileMaker fallback-regex field set
# Each loops pages in order; cascade order within a page matters (:367-384 etc.)
# ---------------------------------------------------------------------------

def extract_vendor(pages: Sequence[str]) -> str:
    """F4 (:337-354): vendor-address line, else company-suffix fallback.
    Literal prescreens (necessary conditions of each pattern — the address
    pattern needs its label, the company pattern one of its suffix
    literals) skip full-text scans that cannot match; 'co' subsumes
    CORP/COMPANY/CO."""
    for text in pages:
        lt = text.lower()
        if "vendor address" in lt:
            m = _VENDOR_ADDR.search(text)
            if m:
                vendor_name = m.group(1).strip()
                if vendor_name and not _VENDOR_LEADING_DIGITS.match(vendor_name):
                    return vendor_name
        if "inc" in lt or "llc" in lt or "co" in lt or "enterprises" in lt:
            m = _VENDOR_COMPANY.search(text)
            if m:
                return m.group(1).strip()
    return ""


def extract_date(pages: Sequence[str]) -> str:
    """F5 (:356-365). 'date' literal prescreen."""
    for text in pages:
        if "date" not in text.lower():
            continue
        m = _ORDER_DATE.search(text)
        if m:
            return m.group(1)
    return ""


# per-pattern necessary-condition literals for the F6 cascade (all-lowercase,
# checked against text.lower(); None = no cheap literal, always run)
_AMOUNT_PRESCREENS = ("total amount", "net value", "amount", "$")


def extract_amount(pages: Sequence[str]) -> str:
    """F6 (:367-384): 4-pattern cascade per page; value kept as string
    (commas preserved — byte-identity, SURVEY.md §1.2). Each pattern is
    anchored on a literal (label or '$'), so a page lacking that literal
    provably cannot match it — the scan is skipped, cascade order kept."""
    for text in pages:
        lt = text.lower()
        for lit, pat in zip(_AMOUNT_PRESCREENS, _AMOUNT_CASCADE):
            if lit not in lt:
                continue
            m = pat.search(text)
            if m:
                return m.group(1)
    return ""


def extract_delivery_date(pages: Sequence[str]) -> str:
    """F7 (:386-405): delivery-section, dockdate, then EA-line patterns.

    Literal prescreens: the two label-anchored patterns cannot match a
    page that lacks their (case-insensitive) label substring, so the
    expensive DOTALL scans are skipped on such pages — semantics
    unchanged (Hypothesis parity vs the live reference gates this)."""
    for text in pages:
        lt = text.lower()
        if "delivery date" in lt:
            m = _DELIVERY_DATE.search(text)
            if m:
                return m.group(1)
        if "dockdate" in lt:
            m = _DOCK_DATE.search(text)
            if m:
                return m.group(1)
        if "ea" in lt and "/" in text:
            m = _EA_DATE.search(text)
            if m:
                return m.group(1)
    return ""


def extract_vendor_number(pages: Sequence[str]) -> str:
    """F8 (:407-415). Label-literal prescreen."""
    for text in pages:
        if "vendor number" not in text.lower():
            continue
        m = _VENDOR_NUMBER.search(text)
        if m:
            return m.group(1)
    return ""


def extract_buyer_name(pages: Sequence[str]) -> str:
    """F9a (:417-425). 'buyer/phone' label prescreen."""
    for text in pages:
        if "buyer/phone" not in text.lower():
            continue
        m = _BUYER_NAME.search(text)
        if m:
            return m.group(1).strip()
    return ""


def extract_buyer_phone(pages: Sequence[str]) -> str:
    """F9b (:427-435). 'buyer/phone' label prescreen."""
    for text in pages:
        if "buyer/phone" not in text.lower():
            continue
        m = _BUYER_PHONE.search(text)
        if m:
            return m.group(1)
    return ""


def extract_buyer_email(pages: Sequence[str]) -> str:
    """F9c (:437-445). 'buyer e-mail' label prescreen."""
    for text in pages:
        if "buyer e-mail" not in text.lower():
            continue
        m = _BUYER_EMAIL.search(text)
        if m:
            return m.group(1)
    return ""


def extract_part_number(pages: Sequence[str]) -> str:
    """F10 (:447-456). The pattern requires a literal '-' (and digits);
    pages without a dash are skipped unscanned."""
    for text in pages:
        if "-" not in text:
            continue
        m = _PART_NUMBER.search(text)
        if m:
            return m.group(1)
    return ""


def extract_quantity(pages: Sequence[str]) -> str:
    """F11 (:458-467)."""
    for text in pages:
        if "quantity" not in text.lower():
            continue
        m = _QUANTITY.search(text)
        if m:
            return m.group(1)
    return ""


def extract_net_per_price(pages: Sequence[str]) -> str:
    """F12 (:469-478). 'net per' literal prescreen skips the DOTALL
    ``.*?`` scan on pages that cannot match."""
    for text in pages:
        if "net per" not in text.lower():
            continue
        m = _NET_PER.search(text)
        if m:
            return m.group(1)
    return ""


def extract_po_number_strict(pages: Sequence[str]) -> str:
    """F3 (:481-492): strict ``45\\d{8}`` scan over ALL pages ('45'
    literal prescreen — the pattern cannot match without it)."""
    for text in pages:
        if "45" not in text:
            continue
        m = _PO_STRICT.search(text)
        if m:
            po = m.group(1)
            if len(po) == 10 and po.startswith("45"):
                return po
    return ""


def extract_production_order(pages: Sequence[str]) -> str:
    """F13 (:494-516): Production Order → MJO → standalone 9-12 digits
    (excluding 45-prefixed PO numbers). Label-literal prescreens on the
    first two patterns (cannot match without their label substring)."""
    for text in pages:
        lt = text.lower()
        if "production order" in lt:
            m = _PROD_ORDER.search(text)
            if m:
                return m.group(1)
        if "mjo" in lt:
            m = _MJO.search(text)
            if m:
                return m.group(1)
        m = _STANDALONE_9_12.search(text)
        if m:
            num = m.group(1)
            if not num.startswith("45"):
                return num
    return ""


# per-pattern necessary-condition literal tuples for the F14 cascade (ALL
# listed literals must appear, lowercase, for the pattern to possibly match;
# () = no cheap literal, always run). Mirrors _QTY_SHIP_CASCADE's order.
_QTY_SHIP_PRESCREENS = (
    ("delivery date", "quantity"),
    ("qty",),
    ("quantity",),
    ("ea",),
    ("ship", "qty"),
    ("shipped",),
    ("ea",),          # EACH|EA — 'ea' is a prefix of 'each'
    ("delivery",),
    (),               # bare 1-4 digit token: no literal anchor
)


def extract_quantity_shipped(pages: Sequence[str]) -> str:
    """F14 (:518-555): 9-pattern cascade; first int-convertible match wins,
    normalized ``str(int(float(x)))``. Every pattern but the last is
    anchored on label literals — pages lacking them skip that scan
    (cascade order and the ValueError-continue semantics unchanged)."""
    for text in pages:
        lt = text.lower()
        for lits, pat in zip(_QTY_SHIP_PRESCREENS, _QTY_SHIP_CASCADE):
            if any(lit not in lt for lit in lits):
                continue
            m = pat.search(text)
            if m:
                qty = m.group(1)
                try:
                    return str(int(float(qty)))
                except ValueError:
                    continue
    return ""


def extract_part_number_with_op(pages: Sequence[str]) -> str:
    """F15 (:557-576): ``base OPxx`` → ``base*OPXX``; assembly fallback.
    Both patterns need the 'op'/'assembly' literals — prescreened."""
    for text in pages:
        lt = text.lower()
        if "op" in lt:
            m = _PART_OP.search(text)
            if m:
                return f"{m.group(1)}*{m.group(2).upper()}"
        if "assembly" not in lt and "body assy" not in lt:
            continue
        m = _PART_ASSEMBLY.search(text)
        if m:
            part_base = m.group(1)
            op_code = m.group(2).upper()
            if op_code.startswith("OP") or "OP" in op_code:
                return f"{part_base}*{op_code}"
    return ""


def format_part_number(part_number: str) -> str:
    """F16 (:578-590): ``-OPnn`` suffix → ``*OPnn``; idempotent on '*'."""
    if not part_number:
        return ""
    if "*" in part_number:
        return part_number
    return _DASH_OP.sub(r"*OP\1", part_number)


def extract_dpas_rating(pages: Sequence[str]) -> str:
    """F17 (:592-605): findall across ALL pages, comma-joined."""
    ratings: List[str] = []
    for text in pages:
        if "dpas" not in text.lower():
            continue
        ratings.extend(_DPAS.findall(text))
    if ratings:
        return ", ".join(ratings) if len(ratings) > 1 else ratings[0]
    return ""


def check_payment_terms(pages: Sequence[str]) -> str:
    """F18 (:607-620): STANDARD/NON_STANDARD flag. Pattern quirk preserved
    (see module docstring)."""
    for text in pages:
        if "payment terms" not in text.lower():
            continue
        m = _PAYMENT_TERMS.search(text)
        if m:
            terms = m.group(1).strip()
            if "30 Days" not in terms:
                return f"NON_STANDARD: {terms}"
            return "STANDARD: 30 Days"
    return ""


def extract_quality_clauses(pages: Sequence[str]) -> Dict[str, str]:
    """F19 (:622-641): two findall passes per page. Pass 1 assigns
    unconditionally (later pages overwrite); pass 2 is first-wins.
    Descriptions whitespace-normalized and truncated to 100 chars."""
    quality_clauses: Dict[str, str] = {}
    for text in pages:
        if not _QCLAUSE_PROBE.search(text):
            continue
        for q_code, description in _QCLAUSE_DELIMITED.findall(text):
            clean_desc = " ".join(description.strip().split())
            quality_clauses[q_code.upper()] = clean_desc[:100]
        for q_code, description in _QCLAUSE_STANDALONE.findall(text):
            if q_code.upper() not in quality_clauses:
                clean_desc = " ".join(description.strip().split())
                quality_clauses[q_code.upper()] = clean_desc[:100]
    return quality_clauses


# Field names in the reference's fallback record order (:1032-1049), minus the
# map-valued Quality_Clauses which is carried as its own column.
FIELD_NAMES = [
    "Whittaker_Shipper",
    "MJO_NO",
    "QTY_SHIP",
    "PART_NUMBER",
    "Promise_Delivery_Date",
    "DPAS_Rating",
    "Payment_Terms_Flag",
    "vendor",
    "vendor_number",
    "date",
    "amount",
    "buyer_name",
    "buyer_phone",
    "buyer_email",
]


def fallback_regex_extraction(pages: Sequence[str], po_number: str) -> Dict[str, object]:
    """The deterministic field record — reference's ``_fallback_regex_extraction``
    (:1027-1049). This is ALWAYS the rebuild's field path: in the reference,
    non-OCR'd documents score quality LOW (:830-854, ocr_quality defaults to
    UNKNOWN → 0) and are routed to this regex fallback (:862-865); the LLM is
    never reached on the deterministic contract (SURVEY.md §2.11 U2).
    """
    raw_part = extract_part_number_with_op(pages)
    return {
        "Whittaker_Shipper": po_number,
        "MJO_NO": extract_production_order(pages),
        "QTY_SHIP": extract_quantity_shipped(pages),
        "PART_NUMBER": format_part_number(raw_part),
        "Promise_Delivery_Date": extract_delivery_date(pages),
        "DPAS_Rating": extract_dpas_rating(pages),
        "Payment_Terms_Flag": check_payment_terms(pages),
        "Quality_Clauses": extract_quality_clauses(pages),
        "vendor": extract_vendor(pages),
        "vendor_number": extract_vendor_number(pages),
        "date": extract_date(pages),
        "amount": extract_amount(pages),
        "buyer_name": extract_buyer_name(pages),
        "buyer_phone": extract_buyer_phone(pages),
        "buyer_email": extract_buyer_email(pages),
    }


# ---------------------------------------------------------------------------
# F20 — config-driven generic extractor + U1 strategy seam
# ---------------------------------------------------------------------------

def generic_extract(text: str, spec: Dict[str, object]) -> Dict[str, Optional[str]]:
    """F20 (extractors.py:12-19): for each spec field, ``re.search(pattern,
    text, re.MULTILINE).group(1)`` else None. Spec values may be the bare
    pattern string or a ``{"regex": ..., "description": ...}`` mapping
    (the reference's extraction_config.yaml:2-26 shape). A spec entry
    without a (truthy) regex is skipped — absent from the result — matching
    the reference's ``props.get('regex')`` + ``if pattern`` guard
    (extractors.py:15-16)."""
    out: Dict[str, Optional[str]] = {}
    for field_name, value in spec.items():
        pattern = value.get("regex") if isinstance(value, dict) else value
        if not pattern:
            continue
        m = re.search(pattern, text, re.MULTILINE)
        out[field_name] = m.group(1) if m else None
    return out


def get_extractor(name: str, spec: Optional[Dict[str, object]] = None):
    """U1 (extractors.py:43-46): strategy selector returning a
    ``text -> dict`` callable. 'regex' is the deterministic F1-F19 record;
    'generic' is the config-driven F20 path. The reference's 'ai' strategy
    is deliberately absent from the deterministic contract (SURVEY.md U2 —
    the LLM path is non-deterministic and off the correctness surface)."""
    if name == "regex":
        def _regex(text: str) -> Dict[str, object]:
            pages = [text]
            po = find_po_number(pages)
            return fallback_regex_extraction(pages, po if po else "UNKNOWN_PO")
        return _regex
    if name == "generic":
        if spec is None:
            raise ValueError("generic extractor requires a spec")
        return lambda text: generic_extract(text, spec)
    if name == "quality_gated":
        # U3 (unified_ocr_pipeline.py:856-885): route on OCR quality —
        # HIGH/MEDIUM (with an AI callable supplied) → AI + F23 formatting,
        # LOW/ungraded → the deterministic regex record. Default confidence
        # 0 grades FAILED → LOW → regex, so the bare callable stays on the
        # deterministic contract.
        from . import quality as Q

        def _gated(text: str, confidence: float = 0.0, ai_fn=None):
            return Q.quality_gated_extract([text], [confidence], ai_fn)

        return _gated
    raise ValueError(f"unknown extractor strategy: {name!r}")
