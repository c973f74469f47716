"""ftfy-lite mojibake repair — pure-Python scalar kernel, zero Spark
imports (safe to import on executors; the Arrow-batched UDF wrapper lives
in functions/normalize.py).

Repairs the single most common crawl encoding accident: UTF-8 bytes
decoded as Latin-1/cp1252 ("é" shown as "Ã©", "’" as "â€™"). The inverse
transform — re-encode as Latin-1 (cp1252 fallback for the 0x80-0x9F gap),
then decode as UTF-8 — is attempted up to 2 times (double-mojibake exists
in real crawls) and each step is kept only when it round-trips cleanly AND
strictly shrinks the string: real mojibake always shrinks because a
multibyte UTF-8 sequence collapses to one code point. Plain ASCII and
already-clean non-Latin text either re-encode to themselves or fail the
encode, so the repair is a no-op for clean input — the property the unit
tests pin.
"""

from __future__ import annotations


def fix_mojibake_str(s: str | None) -> str | None:
    if s is None:
        return None
    out = s
    for _ in range(2):
        try:
            raw = out.encode("latin-1")
        except UnicodeEncodeError:
            try:
                raw = out.encode("cp1252")
            except UnicodeEncodeError:
                break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if len(fixed) >= len(out):
            break
        out = fixed
    return out
