"""F21/U3/F23 parity and behavior tests: OCR-quality grading, quality-gated
routing, and the AI-output normalizer, differentially checked against the
live reference implementation."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from unified_ocr_pipeline_spark.kernels import quality as Q

# Text soup biased toward the grade CASE's decision points: PO-indicator
# keywords, digits, and lengths straddling the 10/20/30/50 thresholds.
_SNIPPETS = st.sampled_from(
    [
        "purchase order", "PO", "Meggitt", "vendor", "date", "Date:",
        "4551234567", "12345", "x", "lorem ipsum dolor", "", " ", "\n",
        "a" * 8, "b" * 18, "c" * 28, "d" * 48, "e" * 60, "!!!", "9",
    ]
)
_TEXTS = st.lists(_SNIPPETS, min_size=0, max_size=6).map(" ".join)
_CONFS = st.one_of(
    st.floats(min_value=-5, max_value=105, allow_nan=False),
    st.sampled_from([0.0, 20.0, 20.0001, 40.0, 60.0, 80.0, 100.0]),
)


@settings(max_examples=200, deadline=None)
@given(text=_TEXTS, conf=_CONFS)
def test_grade_parity_with_reference(reference_pipeline, text, conf):
    assert Q.assess_ocr_quality(text, conf) == reference_pipeline._assess_ocr_quality(
        text, conf
    )


_AI_VALUES = st.one_of(
    st.none(),
    st.text(alphabet=string.printable, max_size=30),
    st.sampled_from(
        [
            "139038-2SA-OP20", "139038-2SA*OP20", "139038-2SA", "-OP7",
            "Production Order: 123456", "production order 99887766",
            "MJO 123456789012", "no digits", "12345678", "1234567",
            "12.0", "7", "0003.99", "three", "", "1e3", "nan", "inf",
        ]
    ),
    st.integers(min_value=-10, max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


# PART_NUMBER must be string/None: the reference's formatter does `'*' in x`
# unguarded (:585) and raises on numbers — bug-compatibly, so does ours
# (both call the same F16 logic); the parity domain is the reachable one.
_PART_VALUES = st.one_of(st.none(), st.text(alphabet=string.printable, max_size=30),
                         st.sampled_from(["139038-2SA-OP20", "139038-2SA*OP20", "-OP7", ""]))


@settings(max_examples=200, deadline=None)
@given(
    d=st.fixed_dictionaries(
        {},
        optional={
            "PART_NUMBER": _PART_VALUES,
            "MJO_NO": _AI_VALUES,
            "QTY_SHIP": _AI_VALUES,
            "VENDOR": _AI_VALUES,
            "other": _AI_VALUES,
        },
    )
)
def test_format_ai_data_parity_with_reference(reference_pipeline, d):
    # bug-compatible parity includes exception behavior: e.g. QTY_SHIP='inf'
    # raises OverflowError in the reference (only ValueError/TypeError are
    # caught, :916) and must do the same here
    def outcome(fn, arg):
        try:
            return ("ok", fn(arg))
        except Exception as exc:  # noqa: BLE001
            return ("err", type(exc).__name__)

    # the reference mutates in place — give each side its own copy
    theirs = outcome(reference_pipeline._format_ai_data_for_filemaker, dict(d))
    mine = outcome(Q.format_ai_data, dict(d))
    assert mine == theirs


def test_format_ai_data_empty_passthrough(reference_pipeline):
    for empty in (None, {}):
        assert Q.format_ai_data(empty) == reference_pipeline._format_ai_data_for_filemaker(
            empty
        )


def test_overall_quality_thresholds():
    # :846-854 — avg >= 1.5 HIGH, >= 0.5 MEDIUM, else LOW; ungraded UNKNOWN
    assert Q.overall_quality([]) == Q.QUALITY_UNKNOWN
    assert Q.overall_quality(["EXCELLENT", "GOOD"]) == Q.QUALITY_HIGH
    assert Q.overall_quality(["GOOD", "FAIR"]) == Q.QUALITY_HIGH  # avg 1.5
    assert Q.overall_quality(["FAIR", "FAIR"]) == Q.QUALITY_MEDIUM
    assert Q.overall_quality(["FAIR", "FAILED"]) == Q.QUALITY_MEDIUM  # avg 0.5
    assert Q.overall_quality(["FAILED", "POOR"]) == Q.QUALITY_LOW
    assert Q.route_strategy(Q.QUALITY_HIGH) == "ai"
    assert Q.route_strategy(Q.QUALITY_MEDIUM) == "ai"
    assert Q.route_strategy(Q.QUALITY_LOW) == "regex"
    assert Q.route_strategy(Q.QUALITY_UNKNOWN) == "regex"


def test_quality_gated_extract_routes_low_to_regex():
    pages = ["Purchase Order 4551234567 vendor stuff " + "x" * 60]
    # confidence 10 → POOR/FAILED → LOW → regex even with an AI fn supplied
    rec = Q.quality_gated_extract(pages, [10.0], ai_fn=lambda t: {"VENDOR": "AI"})
    assert rec["_strategy"] == "regex"
    assert rec["_ocr_quality"] == Q.QUALITY_LOW
    assert rec["Whittaker_Shipper"] == "4551234567"


def test_quality_gated_extract_routes_high_to_ai_with_f23():
    pages = ["Purchase Order 4551234567 vendor date stuff " + "x" * 60]
    rec = Q.quality_gated_extract(
        pages,
        [95.0],
        ai_fn=lambda t: {"PART_NUMBER": "139038-2SA-OP20", "QTY_SHIP": "12.0"},
    )
    assert rec["_strategy"] == "ai"
    assert rec["_ocr_quality"] == Q.QUALITY_HIGH
    assert rec["PART_NUMBER"] == "139038-2SA*OP20"  # F23 dash→asterisk
    assert rec["QTY_SHIP"] == "12"                  # F23 whole number


def test_quality_gated_extract_ai_failure_falls_back():
    pages = ["Purchase Order 4551234567 vendor date stuff " + "x" * 60]

    def boom(t):
        raise RuntimeError("model down")

    rec = Q.quality_gated_extract(pages, [95.0], ai_fn=boom)
    assert rec["_strategy"] == "regex"
    # no AI callable at all → regex too (the deterministic default)
    rec2 = Q.quality_gated_extract(pages, [95.0], ai_fn=None)
    assert rec2["_strategy"] == "regex"


def test_get_extractor_quality_gated_seam():
    from unified_ocr_pipeline_spark.kernels.fields import get_extractor

    gated = get_extractor("quality_gated")
    rec = gated("Purchase Order 4551234567 etc")
    assert rec["_strategy"] == "regex"  # default confidence 0 → LOW
    rec_ai = gated(
        "Purchase Order 4551234567 vendor date " + "x" * 60,
        confidence=90.0,
        ai_fn=lambda t: {"MJO_NO": "Production Order: 445566778"},
    )
    assert rec_ai["_strategy"] == "ai" and rec_ai["MJO_NO"] == "445566778"


def test_quality_grade_col_boundary_grid(spark):
    """Column variant vs Python kernel on the full boundary cross-product:
    every confidence threshold edge × every length edge × indicator/digit
    presence — one DataFrame, one comparison pass."""
    from pyspark.sql import functions as F

    confs = [0.0, 20.0, 20.5, 40.0, 40.5, 60.0, 60.5, 80.0, 80.5, 100.0]
    bodies = {
        "plain": "x",             # no indicator, no digit
        "digit": "7q",            # digit only
        "indicator": "vendor a",  # keyword only
        "both": "vendor 7",
    }
    lengths = [0, 5, 12, 22, 32, 52]
    rows = []
    rid = 0
    for conf in confs:
        for kind, stem in bodies.items():
            for ln in lengths:
                text = (stem + " ") * 50  # long enough, then cut
                text = text[:ln] if ln else ""
                rows.append((rid, text, conf))
                rid += 1
    df = spark.createDataFrame(rows, "id long, text string, conf double")
    got = {
        r["id"]: r["grade"]
        for r in df.select(
            "id", Q.quality_grade_col(F.col("text"), F.col("conf")).alias("grade")
        ).collect()
    }
    for i, text, conf in rows:
        assert got[i] == Q.assess_ocr_quality(text, conf), (i, text, conf)


def test_quality_grade_col_on_spark(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "purchase order with plenty of meaningful text " + "x" * 30, 95.0),
        (2, "numbers 123 present here and some more padding!", 70.0),
        (3, "short but okay text here now", 50.0),
        (4, "tiny txt here", 30.0),
        (5, "", 99.0),
        (6, "anything", 5.0),
    ]
    df = spark.createDataFrame(rows, "id long, text string, conf double")
    out = {
        r["id"]: r["grade"]
        for r in df.select(
            "id", Q.quality_grade_col(F.col("text"), F.col("conf")).alias("grade")
        ).collect()
    }
    for i, text, conf in rows:
        assert out[i] == Q.assess_ocr_quality(text, conf), (i, out[i])


def test_grade_col_matches_kernel_on_whitespace_padding(spark):
    """F.trim strips only spaces — the Column grade must use a \\s trim so
    newline-padded text lands in the same length bucket as the Python
    kernel (str.strip)."""
    from pyspark.sql import functions as F
    from unified_ocr_pipeline_spark.kernels import quality as Q

    rows = [
        (1, "x" * 20 + "\n" * 10, 50.0),   # strip len 20 → POOR, not FAIR
        (2, "\t" + "y" * 25 + "  \n", 50.0),
        (3, "vendor 123 " * 6, 70.0),
    ]
    df = spark.createDataFrame(rows, "i long, text string, conf double")
    got = {
        r["i"]: r["g"]
        for r in df.select(
            "i", Q.quality_grade_col(F.col("text"), F.col("conf")).alias("g")
        ).collect()
    }
    for i, text, conf in rows:
        assert got[i] == Q.assess_ocr_quality(text, conf), (i, got[i])


# ---------------------------------------------------------------------------
# duplicate-line / duplicate-paragraph fractions (round-3)
# ---------------------------------------------------------------------------


def test_dup_segment_fractions(spark):
    from pyspark.sql import functions as F

    from unified_ocr_pipeline_spark.functions import text as TX

    t = (
        "NAV\nbody one\nbody two\nNAV\n"  # 4 lines, NAV duplicated
        "\n\npara A\n\npara A\n\npara B"  # paras: [all-lines-block?]...
    )
    df = spark.createDataFrame([(t,)], "text string")
    row = df.select(
        TX.dup_line_fraction(F.col("text")).alias("lf"),
        TX.dup_para_fraction(F.col("text")).alias("pf"),
    ).first()
    # lines: NAV, body one, body two, NAV, para A, para A, para B → 7 total, 5 distinct
    assert row["lf"] == round(1 - 5 / 7, 4)
    # paragraphs (split on blank lines): [NAV..NAV block], para A, para A, para B
    # → 4 total, 3 distinct
    assert row["pf"] == 0.25


def test_dup_segment_empty_and_single(spark):
    from pyspark.sql import functions as F

    from unified_ocr_pipeline_spark.functions import text as TX

    df = spark.createDataFrame([("",), ("only line",), ("  \n  \n ",)], "text string")
    rows = df.select(
        TX.dup_line_fraction(F.col("text")).alias("lf"),
        TX.dup_para_fraction(F.col("text")).alias("pf"),
    ).collect()
    assert all(r["lf"] == 0.0 and r["pf"] == 0.0 for r in rows)


def test_block_signals_shapes(spark):
    from pyspark.sql import functions as F

    from unified_ocr_pipeline_spark.functions import text as TX

    rows = [
        ("http://h.com/casino/1", "clean text here"),          # url hit
        ("http://h.com/p", "casino jackpot casino win"),       # density
        ("http://h.com/p", "a single casino word in ten tokens pad pad pad"),
        ("http://h.com/p", "nothing wrong at all"),
        ("http://h.com/p", ""),                                # empty text
        ("http://h.com/XXX-zone", "fine"),                     # case-folded url
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = df.select(*TX.block_signals(F.col("url"), F.col("text"))).collect()
    assert [r["is_blocked"] for r in got] == [True, True, False, False, False, True]
    assert got[1]["n_block_tokens"] == 3
    assert got[2]["n_block_tokens"] == 1   # below the 2-hit floor
    assert got[4]["block_token_ratio"] == 0.0
    # token matching is exact, not substring: "scunthorpe" never trips
    clean = spark.createDataFrame(
        [("http://h.com/p", "scunthorpe problem casinos")],
        "url string, text string",
    ).select(*TX.block_signals(F.col("url"), F.col("text"))).first()
    assert clean["n_block_tokens"] == 0 and clean["is_blocked"] is False


def test_block_signals_null_inputs_are_not_block_signals(spark):
    """NULL url / NULL text must yield is_blocked=false, not NULL — a
    NULL verdict makes where(~is_blocked) silently drop the document."""
    from pyspark.sql import functions as F

    from unified_ocr_pipeline_spark.functions import text as TX

    rows = [
        (None, "clean text here"),
        ("http://h.com/p", None),
        (None, None),
        (None, "casino jackpot casino"),  # token density still fires
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = df.select(*TX.block_signals(F.col("url"), F.col("text"))).collect()
    assert [r["is_blocked"] for r in got] == [False, False, False, True]
    assert all(r["url_block"] is False for r in got)
    assert got[1]["n_block_tokens"] == 0
    assert got[1]["block_token_ratio"] == 0.0
    kept = df.select(
        "url", *TX.block_signals(F.col("url"), F.col("text"))
    ).where(~F.col("is_blocked"))
    assert kept.count() == 3
