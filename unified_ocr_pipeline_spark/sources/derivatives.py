"""WET/WAT-style derivation: WARC responses → text + link metadata.

The Common Crawl ecosystem ships three artifacts per crawl: the raw WARC
(full HTTP messages), WET (extracted plain text per url) and WAT
(structured metadata — title, outlinks, headers — per url).  The
reference pipeline's analog is its per-document text + JSON record pair
(``scripts/unified_ocr_pipeline.py:300-329``: ``Misc/*.txt`` = WET,
``<po>_data.json`` = WAT); this module is that derivation rebuilt over
the engine's container layer at crawl scale.

Composition — every stage already exists, this wires them in scan
order so raw bytes NEVER cross an exchange:

    parse_warc_records (sources/warc.py, one Arrow pass per blob)
      → parse_http_response (functions/http.py, pure JVM projection)
        → wet_wat_records (this module, ONE Arrow pass per record:
          charset-detect + main-text extract + title/outlink collect)

Scale shape: all three stages are narrow (no shuffle anywhere — the
output is still partitioned exactly like the input blobs), the HTTP
split is whole-stage codegen, and the single Python crossing does all
per-record kernel work (``kernels/sniff.detect_charset``,
``kernels/html_extract``) on one batch pass, so a 100 TB crawl pays one
scan + one Arrow round trip and writes WET and WAT from the same
DataFrame without re-reading the archive.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.http import parse_http_response
from ..kernels.html_extract import (
    extract_links,
    extract_main_text,
    extract_page_meta,
)
from ..kernels.sniff import detect_charset
from .warc import parse_warc_records

# mime → treated as text payload (everything else is 'binary')
_TEXT_MIMES = ("text/",)


def _kind(status, mime) -> str:
    if status is None:
        return "malformed"
    if 300 <= status < 400:
        return "redirect"
    if status == 200 and mime is not None and mime.startswith(_TEXT_MIMES):
        return "text"
    return "binary"


def wet_wat_records(
    resp: DataFrame,
    id_cols: list[str],
    status_col: str = "status",
    mime_col: str = "mime",
    body_col: str = "body",
) -> DataFrame:
    """One Arrow pass per response record → WET + WAT columns.

    Input: ``id_cols`` (passed through untouched) + ``status_col`` int,
    ``mime_col`` string, ``body_col`` binary (all three consumed).

    Output: ``id_cols`` + ``(kind string, charset string, text string,
    title string, n_links int)``:

    - ``kind``: 'text' (200 + text/* mime), 'redirect' (3xx),
      'malformed' (no parsed status), 'binary' (everything else).
      Only 'text' rows get charset/text; only text/html rows get
      title/n_links (a text/plain body has neither).
    - ``charset``: the detection-ladder label (BOM → strict utf-8 →
      latin-1; ``kernels/sniff.detect_charset``) — latin-1 is total, so
      a 'text' row's ``text`` is never NULL unless the body is empty.
    - ``text``: WET payload — decoded body for text/plain; main-content
      extraction (``kernels/html_extract.extract_main_text``, the
      text-density + link-density block scorer) for text/html.
    - ``title`` / ``n_links``: WAT payload — <head> title and absolute
      outlink count, document order (``extract_page_meta`` /
      ``extract_links``).

    The redirect Location (WAT's other half) is already a plain column
    from ``parse_http_response`` — keep it in ``id_cols``.
    """
    id_schema = ", ".join(
        f"{c} {resp.schema[c].dataType.simpleString()}" for c in id_cols
    )
    out_schema = (
        id_schema + ", kind string, charset string, text string, "
        "title string, n_links int"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c] for c in id_cols}
            kinds, charsets, texts, titles, nlinks = [], [], [], [], []
            for status, mime, body in zip(
                pdf[status_col], pdf[mime_col], pdf[body_col]
            ):
                status = None if pd.isna(status) else int(status)
                kind = _kind(status, mime)
                charset = text = title = links = None
                if kind == "text":
                    charset, decoded = detect_charset(
                        bytes(body) if body is not None else None
                    )
                    if mime == "text/html":
                        html = decoded or ""
                        text = extract_main_text(html)[0]
                        title = extract_page_meta(html)[0]
                        links = len(extract_links(html))
                    else:
                        text = decoded
                kinds.append(kind)
                charsets.append(charset)
                texts.append(text)
                titles.append(title)
                nlinks.append(links)
            out["kind"] = pd.Series(kinds, dtype="object")
            out["charset"] = pd.Series(charsets, dtype="object")
            out["text"] = pd.Series(texts, dtype="object")
            out["title"] = pd.Series(titles, dtype="object")
            out["n_links"] = pd.Series(nlinks, dtype="object")
            yield pd.DataFrame(out)

    extra = [c for c in (status_col, mime_col, body_col) if c not in id_cols]
    narrow = resp.select(*id_cols, *extra)
    return narrow.mapInPandas(gen, schema=out_schema)


def derive_wet_wat(
    blobs: DataFrame, blob_col: str, file_col: str
) -> DataFrame:
    """WARC blobs → one WET/WAT row per response record.

    Returns ``(file_col, rec_idx, target_uri, status, mime_header →
    mime, location, kind, charset, text, title, n_links)`` — select the
    text columns for a WET sink, the metadata columns for a WAT sink;
    both come from the same single-scan DataFrame.
    """
    recs = parse_warc_records(blobs, blob_col, file_col).where(
        F.col("warc_type") == "response"
    )
    resp = recs.select(
        file_col,
        "rec_idx",
        "target_uri",
        *parse_http_response(F.col("payload")),
    )
    return wet_wat_records(
        resp,
        id_cols=[file_col, "rec_idx", "target_uri", "status", "mime",
                 "location"],
    ).select(
        file_col, "rec_idx", "target_uri", "status", "mime", "location",
        "kind", "charset", "text", "title", "n_links",
    )
