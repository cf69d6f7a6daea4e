"""Character k-gram shingling and winnowing fingerprints.

Shingles: the set of hashed char-5-grams of the normalized text
(BASELINE.md signature config).  Vectorized: text -> uint32 codepoints ->
sliding windows -> wrapping polynomial hash -> splitmix64 finalize ->
np.unique.  Never a Python loop over characters.

Winnowing (Schleimer, Wilkerson, Aiken — SIGMOD'03 "Winnowing: Local
Algorithms for Document Fingerprinting"): selects the minimum shingle hash
in every sliding window of ``w`` consecutive shingle positions, which
guarantees any shared substring of length >= w + k - 1 chars between two
documents produces at least one shared fingerprint.  This is the candidate
generator for the long-shared-span (substring dedup) stage — the scalable
replacement for a corpus-wide suffix array.
"""

from __future__ import annotations

import numpy as np

from eridu_ray.kernels.hashing import splitmix64

_POLY_A = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def _codepoints(text: str) -> np.ndarray:
    """Text -> uint32 codepoint array (zero-copy-ish via utf-32 encode)."""
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def shingle_hashes(text: str, k: int = 5, seed: int = 0) -> np.ndarray:
    """All (positional) hashed char k-grams of ``text``, dtype uint64.

    Returns one hash per position (len(text)-k+1 values, unsorted, with
    duplicates).  Use :func:`shingle_set` for the deduplicated set.
    """
    cp = _codepoints(text).astype(np.uint64)
    n = cp.shape[0]
    if n < k:
        return np.empty(0, dtype=np.uint64)
    # polynomial hash of each window: sum(c[i+j] * A**(k-1-j)) (wrapping)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc * _POLY_A + cp[j : n - k + 1 + j]
    return splitmix64(acc ^ np.uint64(seed))


def shingle_set(text: str, k: int = 5, seed: int = 0) -> np.ndarray:
    """Sorted unique shingle hashes (the shingle *set*) of ``text``."""
    return np.unique(shingle_hashes(text, k=k, seed=seed))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two sorted-unique uint64 shingle sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


def winnow_fingerprints(text: str, k: int = 5, window: int = 64,
                        seed: int = 0) -> np.ndarray:
    """Winnowing fingerprint set: min shingle hash per sliding window.

    Guarantee: two texts sharing a substring of length >= window + k - 1
    share at least one fingerprint value.  Returns sorted unique uint64.
    Vectorized with a sliding-window-view minimum (no Python loop).
    """
    h = shingle_hashes(text, k=k, seed=seed)
    if h.size == 0:
        return np.empty(0, dtype=np.uint64)
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(wins.min(axis=1))


def longest_common_substring_len(a: str, b: str) -> int:
    """Length of the longest common substring of two strings.

    Per-pair verification for winnowing candidates.  Uses difflib's
    C-accelerated matcher (quadratic worst case but linear-ish in practice;
    called only on the small verified-candidate set, never corpus-wide).
    """
    import difflib

    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    m = sm.find_longest_match(0, len(a), 0, len(b))
    return m.size
