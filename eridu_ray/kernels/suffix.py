"""Suffix-array substring kernels (exact longest-shared-span + offsets).

The north-star pipeline names a suffix-array substring-dedup stage for
long shared spans.  The scalable candidate generator stays winnowing
(kernels/shingle.py — corpus-wide suffix arrays don't shuffle), but the
per-pair *verifier* here is a true generalized suffix array:

- :func:`suffix_array_ranks` — prefix-doubling SA over a uint32
  codepoint array.  Each round is one ``np.lexsort`` (O(n log n)), and
  there are ceil(log2 n) rounds; no Python loop over characters.  The
  per-round rank arrays are retained for LCP queries.
- :func:`lcp_for_pairs` — LCP of arbitrary suffix pairs via binary
  lifting over the retained rank arrays, vectorized across all queried
  pairs at once (O(log n) numpy passes, no per-pair loop).
- :func:`pair_longest_span` — exact longest common substring of two
  texts WITH offsets: generalized SA of ``a + SEP + b`` (SEP = U+110000,
  above the Unicode range, so matches can never cross it), answer =
  max LCP over SA-adjacent suffixes originating in different docs
  (the classic two-string LCS theorem).  Unlike the rolling-hash
  verifier (kernels/shingle.shared_run_length) this is collision-free
  AND returns where the span lives in each text — which substring-cut
  (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better", arXiv:2107.06499 — they likewise use suffix arrays to locate
  and excise duplicated spans) needs and a length-only check cannot give.

Reference parity: eridu has no substring stage; this implements the
BASELINE.json north-star requirement directly.
"""

from __future__ import annotations

import numpy as np

#: separator codepoint for generalized suffix arrays — one past the top
#: of the Unicode range (max legal codepoint U+10FFFF), so it can never
#: occur in real text and a common prefix can never extend across it.
SEP = np.uint32(0x110000)


def _codepoints(text: str) -> np.ndarray:
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def suffix_array_ranks(codes: np.ndarray):
    """Prefix-doubling suffix array of ``codes`` (uint32/uint64 array).

    Returns ``(sa, ranks)`` where ``sa`` is the suffix array (int64) and
    ``ranks[t][p]`` is the sort rank of the length-``2**t`` prefix of the
    suffix starting at ``p`` (capped at the string end).  ``ranks`` is
    what :func:`lcp_for_pairs` lifts over.
    """
    n = int(codes.size)
    if n == 0:
        return np.empty(0, np.int64), [np.empty(0, np.int64)]
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    ranks = [rank]
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while rank[sa[-1]] != n - 1:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        sa = np.lexsort((key2, rank)).astype(np.int64)
        r_s, k_s = rank[sa], key2[sa]
        diff = np.empty(n, dtype=bool)
        diff[0] = True
        diff[1:] = (r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])
        new = np.empty(n, dtype=np.int64)
        new[sa] = np.cumsum(diff) - 1
        rank = new
        ranks.append(rank)
        k *= 2
    return sa, ranks


def lcp_for_pairs(ranks, n: int, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """LCP of suffix pairs ``(i[p], j[p])`` — vectorized binary lifting.

    Distinct suffixes of one string are distinct strings, so equal rank
    at level ``t`` implies the first ``2**t`` characters match; descend
    from the top level advancing both cursors wherever ranks agree.
    O(len(ranks)) numpy passes over all pairs at once.
    """
    i = i.astype(np.int64, copy=True)
    j = j.astype(np.int64, copy=True)
    lcp = np.zeros(i.shape[0], dtype=np.int64)
    for t in range(len(ranks) - 1, -1, -1):
        step = np.int64(1) << t
        r = ranks[t]
        ok = (i < n) & (j < n)
        adv = np.zeros(i.shape[0], dtype=bool)
        if ok.any():
            adv[ok] = r[i[ok]] == r[j[ok]]
        lcp[adv] += step
        i[adv] += step
        j[adv] += step
    return lcp


def pair_longest_span(a: str, b: str, min_len: int = 1):
    """Exact longest common substring of ``a`` and ``b`` with offsets.

    Returns ``(length, pos_a, pos_b)`` — character offsets of one
    maximal shared span — or ``(0, -1, -1)`` when the longest shared
    run is shorter than ``min_len``.  Collision-free (true generalized
    suffix array), unlike the rolling-hash length-only verifier.
    """
    ca = _codepoints(a)
    cb = _codepoints(b)
    if min(ca.size, cb.size) < max(min_len, 1):
        return 0, -1, -1
    codes = np.concatenate([ca, np.array([SEP], np.uint32), cb])
    sa, ranks = suffix_array_ranks(codes)
    n = int(codes.size)
    # doc-of-origin per SA slot; the SEP suffix (start == ca.size) has
    # LCP 0 with everything (SEP is unique), so it never wins and needs
    # no special-casing beyond its arbitrary side assignment.
    from_b = sa > ca.size
    boundary = from_b[1:] != from_b[:-1]
    if not boundary.any():
        return 0, -1, -1
    i = sa[:-1][boundary]
    j = sa[1:][boundary]
    lcps = lcp_for_pairs(ranks, n, i, j)
    m = int(np.argmax(lcps))
    length = int(lcps[m])
    if length < min_len:
        return 0, -1, -1
    x, y = int(i[m]), int(j[m])
    if x > y:
        x, y = y, x
    return length, x, y - int(ca.size) - 1


def longest_span_batch(texts_a, texts_b, min_len: int = 1):
    """Vectorized-per-pair batch wrapper: three int64 arrays
    ``(span_len, pos_a, pos_b)`` for aligned lists of texts."""
    n = len(texts_a)
    out_len = np.zeros(n, dtype=np.int64)
    out_a = np.full(n, -1, dtype=np.int64)
    out_b = np.full(n, -1, dtype=np.int64)
    for p, (a, b) in enumerate(zip(texts_a, texts_b)):
        ln, xa, xb = pair_longest_span(a, b, min_len=min_len)
        out_len[p], out_a[p], out_b[p] = ln, xa, xb
    return out_len, out_a, out_b
