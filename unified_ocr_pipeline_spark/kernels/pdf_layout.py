"""Layout-aware parsing of PDF-style paged documents (PDF-SYN format).

The reference reads real PDFs with PyMuPDF/pdfplumber and OCRs image-only
pages (/root/reference/scripts/unified_ocr_pipeline.py:122-196, 643-752);
neither library nor Tesseract is available (or deterministic) here, so —
per the north star — the OCR-zone heuristics are reimplemented as a
deterministic layout kernel: page segmentation into positioned text blocks
with a reading-order sort (top-to-bottom line bands, left-to-right within a
band). This mirrors the reference's *described* layout-analysis splitter
design (NAS_DEPLOYMENT_GUIDE.md:120-133, SURVEY.md §2.9 G1-G4).

PDF-SYN is this repo's deterministic mini-format carried in the ``html``
binary column (FIXTURES.md §1 'pdf-layout' class). It shares the ``%PDF``
magic prefix so the sniff kernel routes it like the reference routes *.pdf:

    %PDF-SYN1\n
    P <page_no>\n
    B <y> <x>\n
    <text line>\n
    ...
    E\n
    ...per block / per page...

Blocks may be PHYSICALLY stored in any order (the fixture shuffles them);
the parser restores reading order. A page's text is its block texts in
reading order joined with "\n"; lines within a block keep their order.
"""

from __future__ import annotations

from typing import List, Tuple

MAGIC = b"%PDF-SYN1"
LINE_BAND = 16  # y-coordinates within the same 16-unit band = same visual line


def is_pdf_syn(payload: bytes) -> bool:
    return payload.startswith(MAGIC)


def parse_pages_with_images(payload: bytes) -> Tuple[List[str], List[int]]:
    """Decode a PDF-SYN payload into ordered per-page text strings plus the
    per-page image-record count (P2/A2: the reference's per-page
    ``images_found`` / doc ``total_images``, unified_ocr_pipeline.py:158-170).

    Reading order: blocks sorted by (y // LINE_BAND, x, y) — the band
    quantization makes side-by-side blocks read left-to-right even when
    their y origins differ by a few units (the reference's OCR zones analog).
    ``I <y> <x> <n_bytes>`` records mark embedded images; they carry no
    text and are counted, not decoded (codec-free, like the multimodal
    metadata stub).
    """
    text = payload.decode("utf-8")
    lines = text.split("\n")
    if not lines or not lines[0].startswith("%PDF-SYN1"):
        raise ValueError("not a PDF-SYN payload")

    # pages: page_no -> list of (y, x, block_lines)
    pages: dict[int, List[Tuple[int, int, List[str]]]] = {}
    images: dict[int, int] = {}
    cur_page: int | None = None
    cur_block: List[str] | None = None
    cur_yx: Tuple[int, int] = (0, 0)

    # in-block fast path first: text lines (the overwhelming majority) take
    # one None-check + one "E" comparison instead of a startswith chain
    for line in lines[1:]:
        if cur_block is not None:
            if line == "E":
                if cur_page is not None:
                    pages[cur_page].append((cur_yx[0], cur_yx[1], cur_block))
                cur_block = None
            else:
                cur_block.append(line)
            continue
        head = line[:2]
        if head == "P ":
            cur_page = int(line[2:])
            pages.setdefault(cur_page, [])
            images.setdefault(cur_page, 0)
        elif head == "B ":
            if cur_page is None:
                raise ValueError("block record outside any page")
            parts = line[2:].split()
            cur_yx = (int(parts[0]), int(parts[1]))
            cur_block = []
        elif head == "I ":
            if cur_page is None:
                raise ValueError("image record outside any page")
            parts = line[2:].split()
            int(parts[0]), int(parts[1]), int(parts[2])  # validate shape
            images[cur_page] += 1
        # stray non-structural lines outside any block are ignored

    if cur_block is not None:
        # a truncated payload (crash mid-write, corruption) must FAIL the
        # strict parse so parse_with_backend engages the lenient fallback —
        # silently dropping the unterminated block would emit STATUS_OK
        # with the tail text lost
        raise ValueError("unterminated block at end of payload")

    out: List[str] = []
    counts: List[int] = []
    for page_no in sorted(pages):
        blocks = pages[page_no]
        blocks.sort(key=lambda b: (b[0] // LINE_BAND, b[1], b[0]))
        page_text = "\n".join("\n".join(blk) for _, _, blk in blocks)
        out.append(page_text)
        counts.append(images.get(page_no, 0))
    return out, counts


def parse_pages(payload: bytes) -> List[str]:
    """Text-only strict parse (see :func:`parse_pages_with_images`)."""
    return parse_pages_with_images(payload)[0]


def _is_image_record(line: str) -> bool:
    parts = line[2:].split()
    if len(parts) != 3:
        return False
    try:
        [int(p) for p in parts]
        return True
    except ValueError:
        return False


def parse_pages_lenient_with_images(payload: bytes) -> Tuple[List[str], List[int]]:
    """S4 fallback parser — the pdfplumber analog (reference
    unified_ocr_pipeline.py:1051-1093): a tolerant line-scan that recovers
    whatever text a malformed PDF-SYN payload still carries.

    Differences from the strict parser, mirroring a degraded-mode text
    extractor: undecodable bytes are replaced (never raised), malformed
    ``P``/``B`` headers are tolerated (bad page numbers start a new page
    anyway; bad coordinates default to (0,0)), a missing ``E`` terminator
    closes the block at the next structural line, and blocks keep PHYSICAL
    order — no reading-order restoration (the fallback backend "extracts
    text" but does not do layout analysis, exactly the pymupdf→pdfplumber
    capability drop)."""
    text = payload.decode("utf-8", errors="replace")
    lines = text.split("\n")
    pages: List[List[str]] = []
    counts: List[int] = []
    cur_lines: List[str] | None = None
    in_block = False
    for line in lines:
        if line.startswith("%PDF"):
            continue
        if line.startswith("P ") or line == "P":
            pages.append([])
            counts.append(0)
            cur_lines = pages[-1]
            in_block = False
        elif line.startswith("B ") or line == "B":
            in_block = True
        elif line.startswith("I ") and _is_image_record(line):
            # a structural record closes an unterminated block (documented
            # degraded-mode rule) — an I line inside a block missing its E
            # is counted, not swallowed into the block's text
            in_block = False
            if counts:
                counts[-1] += 1
        elif line == "E":
            in_block = False
        elif in_block and cur_lines is not None:
            cur_lines.append(line)
    return ["\n".join(p) for p in pages], counts


def parse_pages_lenient(payload: bytes) -> List[str]:
    """Text-only lenient parse (see :func:`parse_pages_lenient_with_images`)."""
    return parse_pages_lenient_with_images(payload)[0]


def probe_backends() -> List[str]:
    """S4 backend probe (reference :42-61): which parse backends this
    worker can offer, preferred first. Both are in-process kernels here —
    the probe shape (try primary, fall back, report) is what the reference
    health check consumes."""
    return ["syn-strict", "syn-lenient"]


def parse_with_backend(payload: bytes) -> Tuple[List[str], List[int], str]:
    """Parse with the primary (layout-aware) backend, falling back to the
    lenient line-scan on malformed input — the reference's
    pymupdf→pdfplumber cascade (:46-61 probe, :1051-1093 fallback
    processing). Returns (pages, per_page_image_counts, backend_used)."""
    try:
        pages, images = parse_pages_with_images(payload)
        return pages, images, "syn-strict"
    except (ValueError, UnicodeDecodeError, IndexError):
        pages, images = parse_pages_lenient_with_images(payload)
        return pages, images, "syn-lenient"


def render_pages(
    pages: List[List[Tuple[int, int, str]]],
    images: List[List[Tuple[int, int, int]]] | None = None,
) -> bytes:
    """Encode pages of (y, x, block_text) into a PDF-SYN payload;
    ``images[i]`` optionally adds (y, x, n_bytes) image records to page i.

    Used only by the fixture generator (blocks are emitted in the order
    given — callers shuffle them to exercise the reading-order sort).

    The line format has no escaping: a text line spelled exactly ``E`` (or
    shaped like a ``B``/``P``/``I`` record) would parse as structure and
    silently corrupt the round-trip — refuse to render it rather than
    emit a payload whose parse differs from the input.
    """
    lines: List[str] = [MAGIC.decode()]
    for i, blocks in enumerate(pages, start=1):
        lines.append(f"P {i}")
        for y, x, block_text in blocks:
            lines.append(f"B {y} {x}")
            for text_line in block_text.split("\n"):
                if text_line == "E" or text_line[:2] in ("B ", "P ", "I "):
                    raise ValueError(
                        f"text line collides with a structural record: "
                        f"{text_line!r}"
                    )
                lines.append(text_line)
            lines.append("E")
        if images and i - 1 < len(images):
            for y, x, n_bytes in images[i - 1]:
                lines.append(f"I {y} {x} {n_bytes}")
    return "\n".join(lines).encode("utf-8")
