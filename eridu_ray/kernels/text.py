"""Text kernels: extraction, normalization, language-ID, quality, tokens.

``extract_text`` is the trafilatura-style main-content extractor of the
flagship pipeline.  Contract (BASELINE.md): for every url,
``extract_text(html) == text`` byte-for-byte, where html/text come from the
deterministic page generator (eridu_ray/sources/synth.py) — the generator
and extractor share the same markup convention, and the unit tests assert
the round trip per url.

Normalization mirrors the reference's name-normalization role
(eridu/etl/disco.py:81 basename stripping; eridu/etl/acronyms.py:16-32):
for web pages the analog is unicode NFC + casefold + whitespace collapse
before shingling.
"""

from __future__ import annotations

import html as _htmllib
import re
import unicodedata

import numpy as np

# --- extraction -----------------------------------------------------------

_MAIN_RE = re.compile(rb"<main>(.*?)</main>", re.DOTALL)


def render_html(text: str, title: str = "", boiler: str = "") -> bytes:
    """Deterministic page markup wrapping ``text`` (generator side)."""
    body = _htmllib.escape(text, quote=False)
    return (
        "<html><head><title>{}</title></head><body>"
        "<nav class=\"chrome\">{}</nav><main>{}</main>"
        "<footer>{}</footer></body></html>"
    ).format(_htmllib.escape(title, quote=False), boiler, body, boiler).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Main-content extraction; inverse of :func:`render_html` per url."""
    m = _MAIN_RE.search(html_bytes)
    if m is None:
        return ""
    return _htmllib.unescape(m.group(1).decode("utf-8", errors="replace"))


# --- normalization --------------------------------------------------------

_WS_RE = re.compile(r"\s+")


def normalize_text(text: str) -> str:
    """NFC + casefold + whitespace collapse; canonical form for shingling."""
    t = unicodedata.normalize("NFC", text).casefold()
    return _WS_RE.sub(" ", t).strip()


# --- language ID (n-gram/script heuristic; no external models) ------------

# tiny per-language stopword profiles (latin scripts) + script ranges
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu",
           "für"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
}
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def detect_language(text: str, max_chars: int = 2000) -> str:
    """Heuristic language ID: script detection, then stopword profiles.

    Returns an ISO-639-1 code or "und".  Covers the scripts/langs present
    in the synthetic corpora (en/de/es/fr latin + ru cyrillic + zh han),
    mirroring the reference's lang-pair reporting (eridu/etl/report.py:68-71).
    """
    sample = text[:max_chars]
    if not sample:
        return "und"
    cyr = han = 0
    for ch in sample:
        o = ord(ch)
        if 0x0400 <= o <= 0x04FF:
            cyr += 1
        elif 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
            han += 1
    n = len(sample)
    # integer-exact thresholds (han/n > 5%, cyr/n > 25%): float
    # `han > 0.05 * n` differs at representation boundaries, and the
    # DuckDB oracle twin (relational.ORACLE_SQL["lang_id"]) must agree
    # bit-for-bit on every input
    if han * 20 > n:
        return "zh"
    if cyr * 4 > n:
        return "ru"
    words = [w.lower() for w in _WORD_RE.findall(sample)]
    if not words:
        return "und"
    best, best_score = "und", 0.0
    for lang, stops in _STOPWORDS.items():
        score = sum(1 for w in words if w in stops) / len(words)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0.0 else "und"


# --- quality scoring ------------------------------------------------------

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword split: letter runs, digit runs, single punctuation marks
_BPE_RE = re.compile(r"[^\W\d_]+|\d+|[^\w\s]", re.UNICODE)


def token_count(text: str) -> int:
    """Whitespace token count."""
    return len(_TOKEN_RE.findall(text))


def bpe_token_count(text: str) -> int:
    """BPE-ish token count (letter runs / digit runs / punct marks)."""
    return len(_BPE_RE.findall(text))


def quality_features(text: str) -> dict:
    """Document quality features: lengths, punctuation and stopword ratios.

    Mirrors classic web-corpus quality filters; per-feature semantics are
    SQL-expressible so the DuckDB oracle can verify n_chars/n_tokens/ratios.
    """
    n_chars = len(text)
    toks = _TOKEN_RE.findall(text)
    n_tokens = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    words = [w.lower() for w in _WORD_RE.findall(text)]
    n_stop = sum(1 for w in words if w in _STOPWORDS["en"])
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop / len(words)) if words else 0.0,
        "mean_token_len": mean_tok,
    }


# --- fingerprinting -------------------------------------------------------

def content_md5(text: str) -> str:
    """Hex MD5 of the utf-8 text — matches DuckDB ``md5(text)``."""
    import hashlib

    return hashlib.md5(text.encode("utf-8")).hexdigest()


# --- url canonicalization + fuzzy similarity (north-star clause:
# "title/url fuzzy matching for multilingual pages" in the borderline
# refinement).  All-RE2 column kernels — no per-row Python. -----------------

def canonicalize_urls(col):
    """Vectorized URL canonicalization over an Arrow string column.

    lowercase; strip scheme, leading ``www.``, fragment, common tracking
    params (utm_*/fbclid/gclid) and a trailing slash — the variations a
    re-crawl / mirror introduces without changing the page.  Every step is
    one ``pc.replace_substring_regex`` (RE2) over the whole column.
    """
    import pyarrow.compute as pc

    s = pc.utf8_lower(col)
    for pat, rep in ((r"^[a-z][a-z0-9+.-]*://", ""),
                     (r"^www\.", ""),
                     (r"#.*$", ""),
                     (r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", ""),
                     (r"[?&]+$", ""),
                     (r"/$", "")):
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return s


def string_trigram_sets(arr) -> tuple[np.ndarray, np.ndarray]:
    """Per-row DISTINCT char-3-gram (byte-window) sets, fully vectorized.

    Returns ``(cat, sizes)``: the concatenation of each row's sorted
    unique trigram codes (uint32: three bytes packed big-endian) and the
    per-row set sizes — the exact input shape of
    ``verify._tagged_intersections``, so per-pair trigram Jaccard costs
    one searchsorted pass per batch.  The whole kernel is zero-copy off
    the Arrow string buffers: one gather builds every window, one sort +
    run mask dedups per row (row id tagged in the high 32 bits).
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint32), np.zeros(0, np.int64)
    arr = arr.cast(pa.string())
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    counts = np.maximum(offs[1:] - offs[:-1] - 2, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.uint32), np.zeros(n, np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])
    idx = (np.repeat(offs[:-1], counts)
           + (np.arange(total) - np.repeat(cum[:-1], counts)))
    tri = ((data[idx].astype(np.uint32) << 16)
           | (data[idx + 1].astype(np.uint32) << 8)
           | data[idx + 2])
    row = np.repeat(np.arange(n, dtype=np.uint64), counts)
    keys = np.sort((row << np.uint64(32)) | tri.astype(np.uint64))
    keep = np.ones(keys.size, bool)
    keep[1:] = keys[1:] != keys[:-1]
    keys = keys[keep]
    sizes = np.bincount((keys >> np.uint64(32)).astype(np.int64),
                        minlength=n).astype(np.int64)
    return (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32), sizes
