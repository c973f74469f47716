"""U2 — LLM-as-UDF seam (SURVEY.md §2.11), deliberately OFF the
deterministic correctness path.

Reference analog: ``_query_ollama_for_extraction``
(/root/reference/scripts/unified_ocr_pipeline.py:921-1005) — an HTTP call
per document with an input-size cap (:867-871), availability probe, and
regex fallback on failure. A live model is non-deterministic, so (like the
multimodal codec stub) this module ships REAL Spark plumbing — Arrow-batched
``mapInPandas``, one client per Python worker (the connection-pool seam),
input truncation, bounded retries — around an injectable client. The
default :func:`stub_client` is a deterministic stand-in that derives the
"AI" record from the regex kernels, so the plumbing is testable end-to-end.

Scale posture: the model call dominates, so the interesting properties are
(a) one client/connection per worker, created once per partition iterator,
not per row; (b) truncation BEFORE the call bounds request size; (c) row
outcomes carry (ok, attempts, error) so a downstream filter can quarantine
failures without killing the job — at 10^12 documents some calls WILL fail.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_CHARS = 6000  # reference OLLAMA_MAX_CHARS default (:868)

# a client is a callable prompt -> dict (the parsed model JSON)
ClientFactory = Callable[[], Callable[[str], Dict[str, object]]]


def stub_client() -> Callable[[str], Dict[str, object]]:
    """Deterministic stand-in 'model': extracts the F1-F19 record with the
    regex kernels and post-formats it like an AI response would be
    (kernels/quality.py:format_ai_data). Plug a real HTTP client (the
    reference's Ollama POST, :940-1005) into ``client_factory`` instead on
    a cluster with a model endpoint."""
    from ..kernels.fields import fallback_regex_extraction, find_po_number
    from ..kernels.quality import format_ai_data

    def _call(prompt: str) -> Dict[str, object]:
        pages = [prompt]
        po = find_po_number(pages)
        rec = fallback_regex_extraction(pages, po if po else "UNKNOWN_PO")
        rec.pop("Quality_Clauses", None)
        return format_ai_data({k: str(v) for k, v in rec.items()})

    return _call


def http_client(
    base_url: str,
    model: str = "llama3.2:1b",
    timeout: float = 120.0,
    probe: bool = True,
    prompt_format: Optional[str] = "json",
) -> Callable[[str], Dict[str, object]]:
    """REAL Ollama-protocol HTTP client over ONE persistent connection
    (the per-worker connection pool ``llm_extract``'s factory seam
    exists for). Mirrors the reference's call contract
    (/root/reference/scripts/unified_ocr_pipeline.py:929-1005):

    - availability probe ``GET /api/tags`` at construction (:931-938) —
      fail fast on a dead endpoint instead of per-row timeouts;
    - ``POST /api/generate`` with ``{model, prompt, stream: false,
      format: "json"}`` (:988-996);
    - on a 5xx, ONE in-call retry without the ``format`` hint (:997-1005
      — "often fixes 500s");
    - the endpoint's ``response`` field (a string of model output) is
      parsed as JSON and returned as the record dict.

    ``http.client.HTTPConnection`` (or ``HTTPSConnection`` for an
    ``https://`` url — the TLS-terminated reverse-proxy deployment) with
    keep-alive: the TCP connection is reused across every row the worker
    processes (reconnect-once on a stale socket); per-request urllib
    would re-handshake per document — at 10^12 calls the handshakes
    alone would dominate.  Stale-socket recovery auto-replays GETs only:
    a POST that may have reached the server before the drop is NOT
    blindly re-sent (a generate would run — and bill — twice); the
    error surfaces to ``llm_extract``'s row-level retry, which owns
    bounded re-attempts and quarantine.
    """
    import http.client
    from urllib.parse import urlsplit

    parts = urlsplit(base_url)
    if parts.scheme not in ("http", "https") or not parts.hostname:
        raise ValueError(
            f"http_client needs an http(s)://host[:port][/prefix] url, "
            f"got {base_url!r}"
        )
    host = parts.hostname
    tls = parts.scheme == "https"
    port = parts.port or (443 if tls else 11434)
    # a reverse-proxied endpoint mounts the API under a path prefix —
    # keep it (the reference concatenates f"{ollama_url}/api/...", same
    # behavior)
    prefix = parts.path.rstrip("/")
    conn_cls = http.client.HTTPSConnection if tls else http.client.HTTPConnection
    conn = conn_cls(host, port, timeout=timeout)

    def _request(method: str, path: str, body: Optional[bytes]) -> tuple[int, bytes]:
        path = prefix + path
        headers = {"Content-Type": "application/json"} if body else {}
        try:
            conn.request(method, path, body=body, headers=headers)
            r = conn.getresponse()
            return r.status, r.read()
        except (http.client.HTTPException, ConnectionError, OSError):
            # Stale keep-alive socket: reconnect, then replay ONLY if the
            # request was idempotent (GET). A non-idempotent POST may
            # already have executed server-side; re-raise and let
            # llm_extract's per-row retry decide whether to re-attempt.
            conn.close()
            if method != "GET":
                raise
            conn.request(method, path, body=body, headers=headers)
            r = conn.getresponse()
            return r.status, r.read()

    if probe:
        status, _ = _request("GET", "/api/tags", None)
        if status != 200:
            raise ConnectionError(
                f"LLM endpoint probe failed: GET /api/tags -> {status}"
            )

    def _generate(prompt: str, fmt: Optional[str]) -> tuple[int, bytes]:
        payload: Dict[str, object] = {
            "model": model, "prompt": prompt, "stream": False,
        }
        if fmt:
            payload["format"] = fmt
        return _request(
            "POST", "/api/generate", json.dumps(payload).encode("utf-8")
        )

    def _call(prompt: str) -> Dict[str, object]:
        status, body = _generate(prompt, prompt_format)
        if 500 <= status <= 599 and prompt_format:
            status, body = _generate(
                prompt + "\n\nReturn only valid JSON.", None
            )
        if status != 200:
            raise ConnectionError(f"/api/generate -> {status}")
        outer = json.loads(body.decode("utf-8"))
        return json.loads(outer["response"])

    return _call


def llm_extract(
    df: DataFrame,
    id_col: str,
    text_col: str,
    client_factory: Optional[ClientFactory] = None,
    max_chars: int = DEFAULT_MAX_CHARS,
    max_retries: int = 2,
) -> DataFrame:
    """(id, response string(JSON), ok boolean, attempts int, error string).

    Column-pruned before the Python stage; the client is constructed once
    per partition iterator (per-worker connection pool seam); each row gets
    ``max_retries + 1`` attempts; failures yield ok=false rows instead of
    failing the task (quarantine-don't-crash, like the pipeline's status
    column)."""
    import pandas as pd

    factory = client_factory or stub_client
    in_df = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = factory()  # once per partition — the connection-pool seam
        for pdf in batches:
            out = {"id": [], "response": [], "ok": [], "attempts": [], "error": []}
            for rid, text in zip(pdf["id"], pdf["text"]):
                prompt = (text or "")[:max_chars]  # cap request size (:867-871)
                resp, ok, err = None, False, None
                attempts = 0
                while attempts <= max_retries:
                    attempts += 1
                    try:
                        resp = client(prompt)
                        ok = True
                        break
                    except Exception as exc:  # noqa: BLE001
                        err = f"{type(exc).__name__}: {exc}"
                out["id"].append(rid)
                out["response"].append(json.dumps(resp, sort_keys=True) if ok else None)
                out["ok"].append(ok)
                out["attempts"].append(attempts)
                out["error"].append(None if ok else err)
            yield pd.DataFrame(out)

    id_type = in_df.schema["id"].dataType.simpleString()
    return in_df.mapInPandas(
        gen,
        schema=(
            f"id {id_type}, response string, ok boolean, "
            "attempts int, error string"
        ),
    )
