"""Text extraction / normalization / tokenization — the single source of truth.

Both the pure-Python oracle (``replicheck_spark.oracle``) and the vectorized
pandas UDFs (``replicheck_spark.functions.udfs``) import THESE functions, so the
"byte-identical extracted text per url" invariant (BASELINE.json input_hint)
holds by construction: the UDF applies the same function the oracle applies.

Reference parity: the reference tokenizes content into an ordered token list
(/root/reference/replicheck/parser.py:181-188) and keys duplication on the
exact token sequence (/root/reference/replicheck/tools/Duplication/
Duplication.py:36-41). For web text the analogous projection is
normalize -> whitespace tokenize.
"""

from __future__ import annotations

import html as _htmlmod
import re
import unicodedata

# Any run of unicode whitespace collapses to one ASCII space.
_WS_RE = re.compile(r"\s+", re.UNICODE)
# <script>/<style> blocks vanish entirely; all other tags become separators.
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def normalize_text(text: str | None) -> str:
    """Canonical text form: NFC, lowercase, whitespace runs -> single space.

    Deterministic, locale-independent. Empty/None -> "".
    """
    if not text:
        return ""
    t = unicodedata.normalize("NFC", text)
    t = t.lower()
    t = _WS_RE.sub(" ", t).strip()
    return t


def tokenize(norm_text: str) -> list[str]:
    """Ordered word tokens of an already-normalized text."""
    if not norm_text:
        return []
    return norm_text.split(" ")


def extract_text(html_bytes: bytes | None, text: str | None) -> str:
    """Extracted page text: trust ``text`` when present, else strip ``html``.

    The reference reads file content directly (parser.py:28-29); our input
    tables usually carry pre-extracted ``text``. When only ``html`` exists we
    do a deterministic tag-strip + entity-unescape (NOT a browser-grade
    extractor — the invariant is determinism and oracle parity, both sides run
    this exact code).
    """
    if text is not None and text != "":
        return text
    if not html_bytes:
        return ""
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    raw = _SCRIPT_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    raw = _htmlmod.unescape(raw)
    return _WS_RE.sub(" ", raw).strip()


def shingle_strings(tokens: list[str], k: int) -> set[str]:
    """Distinct k-shingles as joined strings (oracle-side truth; hash-free)."""
    n = len(tokens)
    if n == 0:
        return set()
    if n < k:
        return {" ".join(tokens)}
    return {" ".join(tokens[i : i + k]) for i in range(n - k + 1)}


def host_of(url: str | None) -> str:
    """Host component of a url (cross_host analog of the reference's
    cross_file flag, Duplication.py:48-49)."""
    if not url:
        return ""
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/]+)", url, re.IGNORECASE)
    return m.group(1).lower() if m else ""
