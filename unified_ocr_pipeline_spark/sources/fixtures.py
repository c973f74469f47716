"""Deterministic seeded generator for the `pages` input table.

Schema is exactly BASELINE.json `input_hint`:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Document classes and shares follow FIXTURES.md §1; the content template is
the reference's own golden fixture /root/reference/scripts/test_po.txt.
Seeded (seed=42 convention per TESTDATA.md), no external data, written with
pyarrow (no Spark needed to generate).

The host distribution is deliberately skewed: one heavy host carries ≥30%
of rows, so salted repartitioning is actually exercised (SURVEY.md §7.4
risk 4).
"""

from __future__ import annotations

import datetime as dt
import random
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels import pdf_layout

HEAVY_HOST = "heavy.example.com"
N_LIGHT_HOSTS = 47
_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# (class_name, weight) — shares per FIXTURES.md §1
CLASS_WEIGHTS = [
    ("po-clean", 22),
    ("po-ocr-noise", 5),
    ("po-anchor-late", 5),
    ("po-unknown", 5),
    ("po-nonstandard-terms", 5),
    ("html-article", 33),
    ("html-empty-main", 10),
    ("pdf-layout", 7),
    ("text-only", 5),
    ("oversize", 2),
    ("dup-url", 1),
]

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat"
).split()

_LANGS = ["en"] * 8 + ["de", "fr"]


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _po_number(rng: random.Random) -> str:
    return "45" + "".join(rng.choice("0123456789") for _ in range(8))


def _po_pages(
    rng: random.Random, variant: str, scale: int = 1
) -> Tuple[List[str], str]:
    """Multi-page PO text modeled on scripts/test_po.txt. Returns (pages, po).
    ``scale`` multiplies router-page count/size (content_scale knob)."""
    po = _po_number(rng)
    mjo = str(rng.randint(100000000, 999999999))
    qty = rng.randint(1, 999)
    part = f"{rng.randint(100000, 999999)}-{rng.randint(1, 9)}SA"
    op = f"OP{rng.randint(1, 9)}0"
    month, day = rng.randint(1, 12), rng.randint(1, 28)
    dpas = f"{rng.choice('ABCD')}{rng.randint(1, 9)}"
    terms = "Net 45" if variant == "po-nonstandard-terms" else "Net 30 Days"
    qcodes = rng.sample([8, 10, 43, 5, 11], k=3)

    header = f"PURCHASE ORDER {po}"
    if variant == "po-unknown":
        header = "PURCHASE REQUEST (number pending)"
        po = ""
    elif variant == "po-ocr-noise":
        # inject a digit-confusion variant once, plus the correct PO again so
        # the ≥2-occurrences rule (F2) accepts the real one
        pos = rng.randrange(2, 10)
        conf = {"5": "6", "6": "5", "3": "8", "8": "0", "0": "8", "1": "7", "7": "1"}
        d = po[pos]
        noisy = po[:pos] + conf.get(d, d) + po[pos + 1:]
        header = f"PURCHASE ORDER {po}\nConfirmation of Purchase Order {po}\nRef {noisy}"

    page1 = (
        f"{header}\n"
        f"Vendor address:\nTEK ENTERPRISES, INC.\n"
        f"Vendor number: {rng.randint(10000, 99999)}\n"
        f"Date: {month}/{day}/2024\n"
        f"Buyer/phone: {rng.choice(['J. SMITH', 'A. JONES', 'M. LEE'])} / "
        f"555-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}\n"
        f"Buyer E-mail: buyer{rng.randint(1, 99)}@example.com\n"
        f"Production Order: {mjo}\n"
        f"QTY SHIP: {qty} EA\n"
        f"PART NUMBER: {part} {op}\n"
        f"Promise Delivery Date: {month}/{day}/2024\n"
        f"DPAS Rating: {dpas}\n"
        f"Payment terms: {terms}\n"
        f"Total amount: {rng.randint(1, 99)},{rng.randint(100, 999)}.{rng.randint(10, 99)}"
    )
    page2 = (
        f"CONTINUATION PAGE\n"
        f"Quality Clauses: "
        + ", ".join(f"Q{q}" for q in qcodes)
        + "\n"
        + "\n".join(
            f"Q{q} {rng.choice(['INSPECTION REQUIRED', 'MATERIAL CERTS NEEDED', 'SPECIAL PACKAGING'])}"
            for q in qcodes
        )
        + f"\n{_sentence(rng, 12)}"
    )
    router_pages = [
        (
            "ROUTER SECTION\n"
            + "\n".join(
                f"Operation {i * 10}: {_sentence(rng, 4 * scale)}"
                for i in range(1, rng.randint(2, 5) * scale)
            )
        )
        for _ in range(rng.randint(1, 3) * scale)
    ]
    if variant == "po-anchor-late":
        router_pages.append(
            f"APPENDIX\nsee the original purchase order for details\n{_sentence(rng, 8)}"
        )
    pages = [page1, page2] + router_pages
    return pages, po


def _pages_to_pdf_syn(rng: random.Random, pages: List[str]) -> bytes:
    """Encode page texts as PDF-SYN blocks in SHUFFLED physical order.

    Each page's lines are chunked into blocks at successive y positions;
    shuffling exercises the reading-order sort without changing the parsed
    text (blocks restore to the same order by coordinates).
    """
    encoded = []
    images: List[List[Tuple[int, int, int]]] = []
    for pg_no, text in enumerate(pages):
        lines = text.split("\n")
        blocks: List[Tuple[int, int, str]] = []
        y = 10
        i = 0
        while i < len(lines):
            k = rng.randint(1, 3)
            chunk = "\n".join(lines[i : i + k])
            blocks.append((y, 0, chunk))
            y += 20 * k
            i += k
        rng.shuffle(blocks)
        encoded.append(blocks)
        # P2/A2: embedded-image records, derived from page content rather
        # than rng so adding them did not perturb the existing seeded draws
        # (cached fixtures and goldens regenerate identically modulo the
        # new records)
        n_img = (len(text) + pg_no) % 3
        images.append([(5 + 7 * j, 3, 1000 + 37 * j) for j in range(n_img)])
    return pdf_layout.render_pages(encoded, images)


def _html_article(rng: random.Random, scale: int = 1) -> bytes:
    nav = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(_WORDS, k=6)
    )
    side = " ".join(
        f'<a href="/p/{i}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>'
        for i in range(8)
    )
    paras = "\n".join(
        f"<p>{_sentence(rng, rng.randint(15, 40))}.</p>"
        for _ in range(rng.randint(2, 6) * scale)
    )
    title = _sentence(rng, 5)
    footer = f"Copyright 2024 {_sentence(rng, 6)}"
    html = (
        "<!DOCTYPE html>\n<html><head><title>"
        + title
        + "</title><script>var t=1;</script><style>p{margin:0}</style></head>\n"
        + f"<body>\n<nav>{nav}</nav>\n<div class='sidebar'>{side}</div>\n"
        + f"<article>\n<h1>{title} headline words extra</h1>\n{paras}\n</article>\n"
        + f"<footer>{footer}</footer>\n</body></html>"
    )
    return html.encode("utf-8")


def _html_empty_main(rng: random.Random) -> bytes:
    nav = " ".join(f'<a href="/{w}">{w}</a>' for w in rng.sample(_WORDS, k=8))
    html = (
        f"<!DOCTYPE html>\n<html><body><nav>{nav}</nav>"
        f"<header>{_sentence(rng, 10)}</header>"
        f"<footer>{_sentence(rng, 10)}</footer></body></html>"
    )
    return html.encode("utf-8")


def generate_pages_rows(
    n_rows: int,
    seed: int = 42,
    max_bytes: int = 8 * 1024 * 1024,
    content_scale: int = 1,
) -> List[dict]:
    """Generate deterministic pages rows (python dicts). ``content_scale``
    multiplies per-document content volume (realistic crawl pages are tens
    of KB; scale 1 keeps unit-test fixtures small)."""
    rng = random.Random(seed)
    classes = [c for c, _ in CLASS_WEIGHTS]
    weights = [w for _, w in CLASS_WEIGHTS]
    rows: List[dict] = []
    dup_pool: List[dict] = []

    for i in range(n_rows):
        cls = rng.choices(classes, weights=weights, k=1)[0]
        # skewed host distribution: heavy host ≥30%
        if rng.random() < 0.32:
            host = HEAVY_HOST
        else:
            host = f"site{rng.randrange(N_LIGHT_HOSTS):02d}.example.org"
        lang = rng.choice(_LANGS)
        ts = _EPOCH + dt.timedelta(seconds=i * 37 + (i % 7))
        url = f"https://{host}/{cls}/{i:08d}"
        html: Optional[bytes] = None
        text = ""

        if cls == "dup-url" and dup_pool:
            src = rng.choice(dup_pool)
            row = dict(src)
            row["warc_ts"] = ts  # re-crawled later; identical payload & url
            rows.append(row)
            continue

        if cls.startswith("po-") or cls == "dup-url":
            pages, _ = _po_pages(rng, cls, scale=content_scale)
            html = _pages_to_pdf_syn(rng, pages)
        elif cls == "pdf-layout":
            pages = [
                "\n".join(_sentence(rng, 6) for _ in range(rng.randint(3, 8)))
                for _ in range(rng.randint(1, 4) * content_scale)
            ]
            html = _pages_to_pdf_syn(rng, pages)
        elif cls == "html-article":
            html = _html_article(rng, scale=content_scale)
            text = _sentence(rng, 40)  # crawl's own (noisy) text layer
        elif cls == "html-empty-main":
            html = _html_empty_main(rng)
        elif cls == "text-only":
            html = None
            text = f"PO: {_po_number(rng)}\n{_sentence(rng, 30)}"
        elif cls == "oversize":
            html = b"%PDF-SYN1\n" + b"X" * (max_bytes + 1024)

        row = {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": lang,
        }
        rows.append(row)
        if cls == "po-clean":
            dup_pool.append(row)

    return rows


PAGES_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def write_pages_parquet(
    path: str,
    n_rows: int,
    seed: int = 42,
    max_bytes: int = 8 * 1024 * 1024,
    n_files: int = 8,
    content_scale: int = 1,
) -> int:
    """Write the pages fixture as a multi-file parquet directory (so Spark
    gets real input splits even at small scale). Returns row count."""
    import os

    rows = generate_pages_rows(
        n_rows, seed=seed, max_bytes=max_bytes, content_scale=content_scale
    )
    os.makedirs(path, exist_ok=True)
    per = max(1, (len(rows) + n_files - 1) // n_files)
    for f_idx in range(0, len(rows), per):
        chunk = rows[f_idx : f_idx + per]
        table = pa.Table.from_pylist(chunk, schema=PAGES_ARROW_SCHEMA)
        pq.write_table(table, f"{path}/part-{f_idx // per:05d}.parquet")
    return len(rows)
