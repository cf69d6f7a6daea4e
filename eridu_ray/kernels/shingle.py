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


def winnow_select(positional_hashes: np.ndarray,
                  window: int = 64) -> np.ndarray:
    """Winnowing selection sequence: min hash per sliding window, with
    consecutive duplicates collapsed, in positional order."""
    return winnow_select_runs(positional_hashes, window=window)[0]


def winnow_select_runs(positional_hashes: np.ndarray,
                       window: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """(values, runs): the collapsed winnowing selection sequence plus,
    per selection, how many consecutive windows it stayed the minimum.

    A single occurrence of a hash can be the window minimum for at most
    ``window`` consecutive windows (then it falls out of the window), so
    ``runs > window`` proves the value re-occurs within the text — the
    signature of a REPETITIVE region (see :func:`repetition_marker_fps`).
    """
    h = positional_hashes
    if h.size == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    if h.size <= window:
        return h.min(keepdims=True), np.ones(1, dtype=np.int64)
    mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
    keep = np.empty(mins.size, dtype=bool)
    keep[0] = True
    np.not_equal(mins[1:], mins[:-1], out=keep[1:])
    starts = np.nonzero(keep)[0]
    runs = np.diff(np.concatenate([starts, [mins.size]]))
    return mins[starts], runs


_REP1 = np.uint64(0x9E3779B97F4A7C15)
_REP2 = np.uint64(0xC2B2AE3D27D4EB4F)


def repetition_marker_fps(values: np.ndarray, runs: np.ndarray,
                          window: int) -> np.ndarray:
    """Marker fingerprints for repetitive regions (two per repeated value).

    Plain winnow bigrams collapse a span that repeats a short motif
    ("résumé résumé ...") to <2 distinct fingerprints — consecutive
    duplicate minima are collapsed, so two documents sharing only a long
    REPETITIVE span would fall below the winnow_min_hits junk-pair guard
    and the true substring edge would be silently dropped (ADVICE r2).
    A selection whose run exceeds ``window`` windows must re-occur in the
    text (repetition); emitting TWO derived markers for it gives any pair
    sharing that repetitive region >= 2 shared fingerprints — content-
    defined, offset-independent, identical in both documents.  Regions
    shorter than ~2*window never trigger (run <= window), and a false
    candidate this creates still faces the exact rolling-hash span verify.
    """
    rep = values[runs > window]
    if rep.size == 0:
        return np.empty(0, dtype=np.uint64)
    m = splitmix64(rep)
    return np.concatenate([splitmix64(m ^ _REP1), splitmix64(m ^ _REP2)])


def _winnow_bigram_fps(sel: np.ndarray) -> np.ndarray:
    """Selection sequence -> bigram fingerprint values (unsorted)."""
    if sel.size == 0:
        return np.empty(0, dtype=np.uint64)
    if sel.size == 1:
        return splitmix64(sel)
    return splitmix64(splitmix64(sel[:-1]) ^ sel[1:])


def winnow_fingerprints(text: str, k: int = 5, window: int = 64,
                        seed: int = 0) -> np.ndarray:
    """Winnowing fingerprint BIGRAMS + repetition markers.

    Plain winnowing (Schleimer et al. SIGMOD'03) guarantees one shared
    selection per shared span >= window + k - 1, but selections are global
    minima of the hash space, so a corpus with shared vocabulary collides
    every document containing one low-hash common k-gram (measured: 135k
    junk candidate pairs on an 881-page corpus).  Pairing CONSECUTIVE
    selections keeps span detection — two texts sharing a span of length
    >= 2*window + k - 1 share at least one full (fp_i, fp_{i+1}) bigram —
    while a collision now requires two adjacent minima to agree, which
    only happens inside genuinely shared text.  Repetitive spans (which
    collapse to <2 distinct bigrams) are covered by the markers of
    :func:`repetition_marker_fps`.  Returns sorted unique uint64 hashes.
    """
    sel, runs = winnow_select_runs(shingle_hashes(text, k=k, seed=seed),
                                   window=window)
    return np.unique(np.concatenate([
        _winnow_bigram_fps(sel), repetition_marker_fps(sel, runs, window)]))


def cdc_fingerprints(text: str, positional_hashes: np.ndarray,
                     mean_chunk: int = 64, min_chunk: int = 48,
                     seed: int = 0) -> np.ndarray:
    """Content-defined-chunking fingerprints (rsync/LBFS-style).

    Breakpoints at positions whose k-gram hash is 0 mod ``mean_chunk``
    (content-defined, so two documents sharing a span place identical
    interior breakpoints regardless of offset); each chunk's fingerprint
    hashes the chunk's ENTIRE text, so a collision means the chunk text is
    byte-identical — immune to the common-vocabulary junk that plagues
    single-gram fingerprints.  Chunks shorter than ``min_chunk`` chars are
    dropped (judged per-chunk: offset-independent).

    min_chunk=48 deliberately exceeds the near-dup corpus's typical
    shared-run length between distinct documents (measured: min_chunk=16
    tagged every ~36-char shared run between near-identical docs — 600k
    LCS verifications).  A shared span >= ~3*mean_chunk survives with
    P(<2 breakpoints) ~ e^-3*(1+3) ≈ 15% at L=200; the winnowing-bigram
    family covers that tail, and vice versa.
    """
    import hashlib

    h = positional_hashes
    if h.size == 0:
        return np.empty(0, dtype=np.uint64)
    mask = np.uint64(mean_chunk - 1)
    bp = np.nonzero((h & mask) == np.uint64(0))[0]
    bounds = np.concatenate(([0], bp, [len(text)]))
    key = seed.to_bytes(8, "little", signed=False)
    out = []
    blake = hashlib.blake2b
    for i in range(bounds.size - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi - lo < min_chunk:
            continue
        d = blake(text[lo:hi].encode("utf-8"), digest_size=8,
                  key=key).digest()
        out.append(int.from_bytes(d, "little"))
    return np.unique(np.array(out, dtype=np.uint64))


def longest_common_substring_len(a: str, b: str) -> int:
    """Length of the longest common substring of two strings (exact).

    difflib's C matcher; quadratic-ish — used by tests and the ground-truth
    generator only.  The pipeline's per-pair span verification uses
    :func:`shared_run_length` (rolling-hash binary search, ~100x faster).
    """
    import difflib

    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    m = sm.find_longest_match(0, len(a), 0, len(b))
    return m.size


_RH_BASE = np.uint64(0x100000001B3)
# multiplicative inverse of _RH_BASE mod 2^64 (base is odd -> invertible)
_RH_BASE_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _inv_weighted_prefix(cp: np.ndarray):
    """(T, b_pows): T[i] = sum_{j<i} c[j]*Binv^j (mod 2^64), plus the
    FORWARD power table B^l used to re-anchor windows — all built with
    wrapping accumulate (no Python loop)."""
    n = cp.size
    binv_pows = np.full(n, _RH_BASE_INV, dtype=np.uint64)
    binv_pows[0] = np.uint64(1)
    np.multiply.accumulate(binv_pows, out=binv_pows)
    b_pows = np.full(n, _RH_BASE, dtype=np.uint64)
    b_pows[0] = np.uint64(1)
    np.multiply.accumulate(b_pows, out=b_pows)
    T = np.zeros(n + 1, dtype=np.uint64)
    np.add.accumulate(cp * binv_pows, out=T[1:])
    return T, b_pows


def shared_run_length(a: str, b: str, min_len: int = 1) -> int:
    """Length of the longest shared substring, via binary search on
    "do a and b share any L-length window?" checked with vectorized
    64-bit rolling hashes (O((|a|+|b|) log) — the pipeline's span
    verifier; difflib LCS at ~ms/pair was the span stage's bottleneck).

    Window hash: W_L[l] = (T[l+L]-T[l]) * B^l = sum_j c[l+j]*Binv^j —
    position-independent.  Hash collisions could overstate the length
    with probability ~2^-64 per window pair — acceptable for spans.
    Returns 0 if the longest shared run is < min_len.
    """
    ca = _codepoints(a).astype(np.uint64)
    cb = _codepoints(b).astype(np.uint64)
    if ca.size == 0 or cb.size == 0 or min_len > min(ca.size, cb.size):
        return 0
    Ta, Pa = _inv_weighted_prefix(ca)
    Tb, Pb = _inv_weighted_prefix(cb)

    def share(L: int) -> bool:
        wa = (Ta[L:] - Ta[:-L]) * Pa[: ca.size - L + 1]
        wb = (Tb[L:] - Tb[:-L]) * Pb[: cb.size - L + 1]
        return np.intersect1d(wa, wb).size > 0

    if not share(min_len):
        return 0
    lo, hi = min_len, min(ca.size, cb.size)  # invariant: share(lo)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if share(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def to_verify_set32(set64: np.ndarray) -> np.ndarray:
    """Project a sorted-unique uint64 shingle set to the 32-bit VERIFY set.

    The exact-Jaccard verify stage ships one shingle set per candidate
    pair side; 32-bit elements halve that traffic (the measured verify-
    shuffle bottleneck) at a deterministic, shared cost model: within-doc
    collisions merge ~n^2/2^33 elements (<0.001 for 3k-shingle docs) and
    the ground-truth generator uses the SAME projection, so pipeline and
    oracle Jaccard values stay bit-identical.  MinHash/SimHash/winnowing
    keep the full 64-bit hashes.
    """
    return np.unique((set64 >> np.uint64(32)).astype(np.uint32))


def shingle_set32(text: str, k: int = 5, seed: int = 0) -> np.ndarray:
    """Sorted unique 32-bit verify set of ``text`` (truth-side twin of
    the signature stage's retained blob)."""
    return to_verify_set32(shingle_set(text, k=k, seed=seed))


def jaccard32(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint32 verify sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


# --- fixed-window rolling gram hashes (substring tier-0 gate) -------------

_GRAM_B = 0x100000001B3          # FNV prime, odd -> invertible mod 2^64
_GRAM_BINV = pow(_GRAM_B, -1, 1 << 64)


def gram_hashes(text: str, w: int) -> np.ndarray:
    """Rolling polynomial hash of EVERY w-character window of ``text``
    (uint64, one per start position, unsorted).

    Purpose: the substring family's tier-0 pair gate.  A true shared
    span of >= w chars implies both docs contain an identical w-char
    window, hence a common hash value — the gate never misses; a 2^-64
    collision can only falsely CONFIRM, and confirmed pairs proceed to
    the collision-free suffix-array tier.  Fully vectorized via the
    prefix-sum closed form H[i] = (P[i+w] - P[i]) * B^(w-1+i) with
    P[i] = sum_{t<i} c[t] * B^-t, all mod 2^64 (numpy uint64
    wraparound); windows are CHARACTER-based (utf-32 code points) to
    match the suffix-array tier's character offsets.
    """
    cp = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(
        np.uint64)
    n = cp.size
    if n < w:
        return np.empty(0, np.uint64)
    binv = np.uint64(_GRAM_BINV)
    b = np.uint64(_GRAM_B)
    powinv = np.empty(n, np.uint64)
    powinv[0] = 1
    if n > 1:
        powinv[1:] = np.multiply.accumulate(
            np.full(n - 1, binv, np.uint64))
    pref = np.empty(n + 1, np.uint64)
    pref[0] = 0
    np.cumsum(cp * powinv, out=pref[1:])
    diff = pref[w:] - pref[:n - w + 1]
    m = n - w + 1
    bp = np.empty(m, np.uint64)
    bp[0] = np.uint64(pow(_GRAM_B, w - 1, 1 << 64))
    if m > 1:
        bp[1:] = bp[0] * np.multiply.accumulate(
            np.full(m - 1, b, np.uint64))
    return diff * bp
