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
