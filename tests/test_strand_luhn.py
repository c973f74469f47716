"""STRAND URL-pair bitext candidates and Luhn-validated card redaction."""

from pyspark.sql import functions as F

from unified_ocr_pipeline_spark.functions import pii as PII


# ---------------------------------------------------------------------------
# strand_url_pairs
# ---------------------------------------------------------------------------

def _pairs(spark, rows):
    from unified_ocr_pipeline_spark.operators import bitext as BT

    df = spark.createDataFrame(rows, "url string, lang string")
    return BT.strand_url_pairs(df, "url", "lang").collect()


def test_strand_pairs_language_mirror(spark):
    got = _pairs(
        spark,
        [
            ("http://h.com/en/about", "en"),
            ("http://h.com/fr/about", "fr"),
            ("http://h.com/de/about", "de"),
            ("http://h.com/en/only-english", "en"),
            ("http://other.com/fr/about", "fr"),  # different host: no pair
        ],
    )
    dst = {(r["dst_lang"], r["dst_url"]) for r in got}
    assert dst == {
        ("fr", "http://h.com/fr/about"),
        ("de", "http://h.com/de/about"),
    }
    assert all(r["src_url"] == "http://h.com/en/about" for r in got)
    assert all(r["generic_path"] == "/about" for r in got)


def test_strand_template_flood_collapses(spark):
    # 3 duplicate fr urls on the same key must yield ONE pair (min-url
    # collapse), not three
    rows = [("http://h.com/en/x", "en")] + [
        (f"http://h.com/fr/x?v={i}", "fr") for i in range(3)
    ]
    # query strings differ but path is the same after strip
    got = _pairs(spark, rows)
    assert len(got) == 1
    assert got[0]["dst_url"] == "http://h.com/fr/x?v=0"


def test_strand_no_lang_segment_no_false_pair(spark):
    # paths without a recognizable lang segment stay distinct keys
    got = _pairs(
        spark,
        [("http://h.com/press/2024", "en"), ("http://h.com/presse/2024", "fr")],
    )
    assert got == []


# ---------------------------------------------------------------------------
# Luhn
# ---------------------------------------------------------------------------

def _luhn(spark, values):
    from unified_ocr_pipeline_spark.functions.pii import luhn_valid

    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r["ok"] for r in df.select(luhn_valid(F.col("s")).alias("ok")).collect()]


def test_luhn_known_vectors(spark):
    # canonical test numbers: Visa/Mastercard/Amex test vectors are
    # Luhn-valid; flipping one digit breaks them
    assert _luhn(
        spark,
        ["4111111111111111", "5500005555555559", "378282246310005",
         "4111111111111112", "123456789012"],
    ) == [True, True, True, False, False]  # last: too short (12 digits)


def test_card_redaction_only_valid(spark):
    from unified_ocr_pipeline_spark.functions import pii as PII

    df = spark.createDataFrame(
        [(1, "pay 4111111111111111 now; order 4111111111111112 shipped")],
        "id int, t string",
    )
    n_cand, n_valid = PII.card_mentions(F.col("t"))
    r = df.select(
        n_cand.alias("nc"), n_valid.alias("nv"),
        PII.redact_cards(F.col("t")).alias("red"),
    ).first()
    assert (r["nc"], r["nv"]) == (2, 1)
    assert r["red"] == "pay [CARD] now; order 4111111111111112 shipped"


def test_card_no_candidates_text_unchanged(spark):
    from unified_ocr_pipeline_spark.functions import pii as PII

    df = spark.createDataFrame([(1, "no numbers at all")], "id int, t string")
    r = df.select(PII.redact_cards(F.col("t")).alias("red")).first()
    assert r["red"] == "no numbers at all"


def test_strand_generic_segment_not_stripped_as_language(spark):
    # /faq/, /api/, /www/ are 2-3-letter segments but NOT the page's
    # language — they must stay in the key, so sections can't collapse
    # onto one generic path and false-pair across languages
    got = _pairs(
        spark,
        [
            ("http://h.com/faq/billing", "en"),
            ("http://h.com/api/billing", "fr"),
            ("http://h.com/www/billing", "de"),
        ],
    )
    assert got == []


def test_strand_lang_segment_only_strips_when_it_matches_row_lang(spark):
    # /en/ on an en page strips; /en/ on a page the detector says is
    # French does not (mismatched claims are not reliable mirrors)
    got = _pairs(
        spark,
        [
            ("http://h.com/en/x", "en"),
            ("http://h.com/en/y", "fr"),
            ("http://h.com/fr/x", "fr"),
        ],
    )
    assert len(got) == 1
    assert got[0]["dst_url"] == "http://h.com/fr/x"


def test_redact_cards_leaves_longer_digit_runs_intact(spark):
    # a Luhn-valid card that ALSO occurs inside a >19-digit run must
    # only be redacted where it stands word-bounded on its own
    from unified_ocr_pipeline_spark.functions import pii as PII

    valid = "4111111111111111"  # classic Luhn-valid test number
    t = f"card {valid} ref 9{valid}115 end"
    df = spark.createDataFrame([(t,)], "t string")
    r = df.select(PII.redact_cards(F.col("t")).alias("red")).first()
    assert r["red"] == f"card [CARD] ref 9{valid}115 end"


# ---------------------------------------------------------------------------
# IBAN / SSN
# ---------------------------------------------------------------------------

def test_iban_mod97_validation_and_redaction(spark):
    t = ("send to DE89370400440532013000 or GB82WEST12345698765432 "
         "but not DE89370400440532013001 ok")
    df = spark.createDataFrame([(t,)], "t string")
    n_cand, n_valid = PII.iban_mentions(F.col("t"))
    r = df.select(
        n_cand.alias("c"), n_valid.alias("v"),
        PII.redact_ibans(F.col("t")).alias("red"),
    ).first()
    assert (r["c"], r["v"]) == (3, 2)
    assert r["red"] == ("send to [IBAN] or [IBAN] "
                        "but not DE89370400440532013001 ok")


def test_iban_not_matched_inside_longer_alnum_run(spark):
    # no word boundary inside an alnum run: an IBAN glued to more
    # alphanumerics is not a candidate
    t = "XXDE89370400440532013000YY"
    df = spark.createDataFrame([(t,)], "t string")
    n_cand, _ = PII.iban_mentions(F.col("t"))
    assert df.select(n_cand.alias("c")).first()["c"] == 0


def test_ssn_structural_exclusions(spark):
    t = ("real 219-09-9999 fake area 000-12-3456 and 666-12-3456 and "
         "987-65-4320 group 123-00-4567 serial 123-45-0000")
    df = spark.createDataFrame([(t,)], "t string")
    n_cand, n_valid = PII.ssn_mentions(F.col("t"))
    r = df.select(
        n_cand.alias("c"), n_valid.alias("v"),
        PII.redact_ssns(F.col("t")).alias("red"),
    ).first()
    # every 9xx area (including the 987-65-432x ad specimens) is
    # never issued -> excluded
    assert (r["c"], r["v"]) == (6, 1)
    assert "[SSN]" in r["red"]
    assert "666-12-3456" in r["red"] and "000-12-3456" in r["red"]
    assert "219-09-9999" not in r["red"] and "987-65-4320" in r["red"]


def test_ssn_9xx_area_excluded(spark):
    df = spark.createDataFrame([("id 923-45-6789 here",)], "t string")
    _, n_valid = PII.ssn_mentions(F.col("t"))
    assert df.select(n_valid.alias("v")).first()["v"] == 0


def test_iban_adversarial_non_pii_codes_untouched(spark):
    """The documented FP scope (functions/pii.py): shape-matching but
    mod-97-FAILING codes — SKUs, tracking ids, corrupted IBANs — must
    survive both counting (n_valid=0) and redaction unchanged."""
    adversarial = [
        "PO20250812ITEM0042",        # purchase-order/SKU code, 18 alnum
        "AB12TRACK99SHIP001",        # tracking-style code
        "DE89370400440532013001",    # real IBAN with one digit corrupted
        "GB82WEST12345698765431",    # ditto, other country shape
        "XY00A1B2C3D4E5F67",         # random booking-code shape
    ]
    t = "codes: " + " ".join(adversarial)
    df = spark.createDataFrame([(t,)], "t string")
    n_cand, n_valid = PII.iban_mentions(F.col("t"))
    r = df.select(
        n_cand.alias("c"), n_valid.alias("v"),
        PII.redact_ibans(F.col("t")).alias("red"),
    ).first()
    assert r["c"] == len(adversarial)  # all SHAPE-match (honest scope)
    assert r["v"] == 0                 # none mod-97-validate
    assert r["red"] == t               # and none is touched


def test_ssn_adversarial_non_pii_shapes_untouched(spark):
    """Non-SSN punctuation/shape classes the scrub must leave alone:
    3-3-4 phone shapes, ISO dates, unhyphenated 9-digit runs, and the
    never-issued structural exclusions."""
    adversarial = [
        "555-867-5309",   # phone-shaped 3-3-4: not a candidate
        "2026-08-21",     # ISO date: not a candidate
        "123456789",      # bare 9-digit order number: not a candidate
        "987-65-4320",    # 9xx advert specimen: candidate, never issued
        "123-00-4567",    # 00 group: candidate, never issued
    ]
    t = "refs: " + " ".join(adversarial)
    df = spark.createDataFrame([(t,)], "t string")
    n_cand, n_valid = PII.ssn_mentions(F.col("t"))
    r = df.select(
        n_cand.alias("c"), n_valid.alias("v"),
        PII.redact_ssns(F.col("t")).alias("red"),
    ).first()
    assert r["c"] == 2 and r["v"] == 0
    assert r["red"] == t


def test_ssn_valid_shape_order_number_redacts_by_documented_scope(spark):
    """The accepted FP class, pinned as a test so the trade-off stays
    visible: an issued-SHAPE ddd-dd-dddd order number DOES redact —
    recall-oriented scrub, a stray redaction costs one token."""
    df = spark.createDataFrame([("order 123-45-6789 shipped",)], "t string")
    r = df.select(PII.redact_ssns(F.col("t")).alias("red")).first()
    assert r["red"] == "order [SSN] shipped"
