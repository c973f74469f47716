"""PII detection/redaction Column builders for training-data curation.

Web-crawl text destined for model training gets scrubbed of emails, phone
numbers, and IP addresses before anything else touches it (standard
practice in published corpus pipelines, e.g. the BigScience/ROOTS and
FineWeb PII passes). These are pure JVM `regexp_*` Column compositions —
no Python on the hot path, one projection, no shuffle — so the pass is
I/O-bound at 100 TB. Exact DuckDB mirrors live in
``__spark_entry__.oracle_sql`` (patterns restricted to the Java∩RE2
dialect: no lookaround, no backrefs).

Redaction order matters and is fixed EMAIL → PHONE → IPV4: emails contain
dots and digits an IP pattern could partially match, and the placeholders
contain no digits so later passes can't re-match earlier rewrites.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Frozen so the DuckDB oracle embeds byte-identical patterns.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Phone family, ordered alternation (Java and RE2 both scan leftmost
# position first, then first alternative — same extent on both sides):
#   1. 22-333-444-5555      TPC-H c_phone / the reference's F9 buyer-phone
#   2. +1 (555) 123-4567    NANP with parenthesized area code
#   3. +1 555.123.4567      NANP dashed/dotted/spaced, optional +1/1
#   4. +44 20 7946 0958     international: +CC then 2-4 digit groups
# Word-boundary notes: \b never holds before '+' or '(' (non-word chars),
# so boundaries sit inside the alternatives, after any prefix group. This
# is a recall-oriented training-data scrub, not a validator — it will
# redact phone-shaped digit runs (that's the point); it is NOT a
# production-grade PII system (no E.164 validation, no context model).
PHONE_REGEX = (
    r"\b\d{2}-\d{3}-\d{3}-\d{4}\b"
    r"|(?:\+?1[ .-]?)?\(\d{3}\)[ .-]?\d{3}[ .-]\d{4}\b"
    r"|(?:\+?1[ .-])?\b\d{3}[ .-]\d{3}[ .-]\d{4}\b"
    r"|\+\d{1,3}(?:[ .-]\d{2,4}){2,4}\b"
)
IPV4_REGEX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

REDACTIONS = (
    (EMAIL_REGEX, "[EMAIL]"),
    (PHONE_REGEX, "[PHONE]"),
    (IPV4_REGEX, "[IP]"),
)


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in the raw text — count BEFORE
    redacting; the placeholders are designed not to re-match but counting
    first makes that a non-assumption."""
    return tuple(
        F.regexp_count(text, F.lit(pat)) for pat, _ in REDACTIONS
    )  # type: ignore[return-value]


def redact_pii(text: Column) -> Column:
    """Replace every email/phone/IPv4 occurrence with its placeholder."""
    out = text
    for pat, token in REDACTIONS:
        out = F.regexp_replace(out, pat, token)
    return out


# ---------------------------------------------------------------------------
# Payment-card detection with Luhn validation
# ---------------------------------------------------------------------------
# A bare 13-19-digit regex drowns in false positives (order ids, EANs,
# timestamps); production scrubs validate the ISO/IEC 7812 Luhn check
# digit before redacting. The checksum is pure integer arithmetic over
# the digit array — transform-with-index + aggregate, whole-stage
# codegen, replayable bit-for-bit in SQL.

CARD_REGEX = r"\b\d{13,19}\b"


def luhn_valid(candidate: Column) -> Column:
    """ISO/IEC 7812 Luhn check over a digit string: from the RIGHT,
    double every second digit, subtract 9 when that doubling exceeds 9,
    valid iff the sum is divisible by 10. NULL-safe: non-digit input
    yields false (ascii arithmetic never throws)."""
    chars = F.reverse(F.split(candidate, ""))
    # trailing '' Spark emits for the split of a non-empty string is
    # filtered with the digits check
    digits = F.filter(chars, lambda c: c.rlike("^[0-9]$"))
    terms = F.transform(
        digits,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(
                (F.ascii(c) - 48) * 2 > 9, (F.ascii(c) - 48) * 2 - 9
            ).otherwise((F.ascii(c) - 48) * 2),
        ).otherwise(F.ascii(c) - 48),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (F.size(digits) >= 13) & (total % 10 == 0)


def card_mentions(text: Column) -> tuple[Column, Column]:
    """(n_candidates, n_valid): 13-19-digit runs found, and how many
    survive Luhn — redact only the valid ones (see ``redact_cards``)."""
    cands = F.regexp_extract_all(text, F.lit(CARD_REGEX), F.lit(0))
    valid = F.filter(cands, luhn_valid)
    return F.size(cands).cast("int"), F.size(valid).cast("int")


def redact_cards(text: Column) -> Column:
    """Replace Luhn-VALID 13-19-digit runs with [CARD]; leave invalid
    runs (order ids, EAN barcodes) untouched. Array fold over the valid
    candidates; each rewrite is a word-bounded regexp (``\\b`` + digits
    + ``\\b``, candidates are pure digit strings so no quoting needed)
    so a valid number that ALSO appears as a substring of a longer
    digit run elsewhere — a >19-digit run was never a candidate — does
    not get that longer run partially mangled by a plain substring
    replace."""
    cands = F.regexp_extract_all(text, F.lit(CARD_REGEX), F.lit(0))
    valid = F.array_distinct(F.filter(cands, luhn_valid))
    return F.aggregate(
        valid,
        text,
        lambda acc, c: F.regexp_replace(
            acc,
            F.concat(F.lit(r"\b"), c, F.lit(r"\b")),
            F.lit("[CARD]"),
        ),
    )


# ---------------------------------------------------------------------------
# IBAN (ISO 13616) with mod-97 validation; SSN-shaped ids
# ---------------------------------------------------------------------------
# Same scope stamp as the rest of this module: recall-oriented
# training-data scrubs in the Java∩RE2 dialect (no lookaround, no
# backrefs), NOT production PII systems — no per-country BBAN length
# tables, no SSN issuance-history model. The IBAN check IS the real
# ISO 7064 mod-97 (pure integer fold, like the Luhn kernel); the SSN
# check applies the published structural exclusions (000/666/9xx area,
# 00 group, 0000 serial).
#
# Known false-positive classes (accepted by design — recall wins for a
# training-data scrub, and a stray redaction costs one token):
# - IBAN: any ≥15-char [A-Z]{2}\d{2}[A-Z0-9]+ code that happens to land
#   on mod-97 ≡ 1 (~1/97 of shape-matching SKUs / tracking / booking
#   codes). Shape-matching codes that FAIL mod-97 (the other ~96/97 —
#   EU VAT ids are too short to even match) are left untouched.
# - SSN: any issued-SHAPE ddd-dd-dddd identifier that is not actually
#   an SSN — 9-digit order/part numbers punctuated the same way WILL
#   redact. Only never-issued shapes (000/666/9xx area, 00 group, 0000
#   serial) and differently-punctuated runs (3-3-4 phone shapes, dates,
#   unhyphenated 9-digit runs) are exempt.
# tests/test_strand_luhn.py enumerates adversarial non-PII examples for
# both classes.

IBAN_REGEX = r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b"
SSN_REGEX = r"\b\d{3}-\d{2}-\d{4}\b"


def iban_valid(candidate: Column) -> Column:
    """ISO 7064 mod-97-10 over the rearranged IBAN (first 4 chars moved
    to the end, letters mapped A=10..Z=35): valid iff the resulting
    number ≡ 1 (mod 97). The fold keeps the accumulator < 97 at every
    step — acc·100 + 35 < 2^31, no overflow, ANSI-mode safe."""
    rearranged = F.concat(
        F.substring(candidate, 5, 34), F.substring(candidate, 1, 4)
    )
    chars = F.filter(F.split(rearranged, ""), lambda c: c != F.lit(""))
    acc = F.aggregate(
        chars,
        F.lit(0),
        lambda a, c: F.when(
            c.rlike("^[0-9]$"), (a * 10 + (F.ascii(c) - 48)) % 97
        ).otherwise((a * 100 + (F.ascii(c) - 55)) % 97),
    )
    return (F.length(candidate) >= 15) & (acc == 1)


def iban_mentions(text: Column) -> tuple[Column, Column]:
    """(n_candidates, n_valid): IBAN-shaped runs found, and how many
    pass mod-97 — redact only the valid ones."""
    cands = F.regexp_extract_all(text, F.lit(IBAN_REGEX), F.lit(0))
    valid = F.filter(cands, iban_valid)
    return F.size(cands).cast("int"), F.size(valid).cast("int")


def redact_ibans(text: Column) -> Column:
    """Replace mod-97-VALID IBAN-shaped runs with [IBAN]; leave invalid
    runs (product codes that happen to match the shape) untouched.
    Word-bounded per candidate, same discipline as ``redact_cards``
    (candidates are pure [A-Z0-9] so no regex quoting needed)."""
    cands = F.regexp_extract_all(text, F.lit(IBAN_REGEX), F.lit(0))
    valid = F.array_distinct(F.filter(cands, iban_valid))
    return F.aggregate(
        valid,
        text,
        lambda acc, c: F.regexp_replace(
            acc,
            F.concat(F.lit(r"\b"), c, F.lit(r"\b")),
            F.lit("[IBAN]"),
        ),
    )


def ssn_valid(candidate: Column) -> Column:
    """Structural SSN validity (SSA published rules): area not 000/666
    and below 900, group not 00, serial not 0000. Shape is already
    guaranteed by SSN_REGEX."""
    area = F.substring(candidate, 1, 3)
    group = F.substring(candidate, 5, 2)
    serial = F.substring(candidate, 8, 4)
    return (
        (area != "000") & (area != "666") & (area < "900")
        & (group != "00") & (serial != "0000")
    )


def ssn_mentions(text: Column) -> tuple[Column, Column]:
    """(n_candidates, n_valid) for SSN-shaped ddd-dd-dddd runs."""
    cands = F.regexp_extract_all(text, F.lit(SSN_REGEX), F.lit(0))
    valid = F.filter(cands, ssn_valid)
    return F.size(cands).cast("int"), F.size(valid).cast("int")


def redact_ssns(text: Column) -> Column:
    """Replace structurally-valid SSN-shaped runs with [SSN]; leave
    excluded shapes (000/666/9xx areas etc.) untouched — they are
    never issued, so they are props/examples, not PII."""
    cands = F.regexp_extract_all(text, F.lit(SSN_REGEX), F.lit(0))
    valid = F.array_distinct(F.filter(cands, ssn_valid))
    return F.aggregate(
        valid,
        text,
        lambda acc, c: F.regexp_replace(
            acc,
            F.concat(F.lit(r"\b"), c, F.lit(r"\b")),
            F.lit("[SSN]"),
        ),
    )
