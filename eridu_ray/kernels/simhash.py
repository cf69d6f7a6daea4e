"""64-bit SimHash over shingle hash sets + Hamming utilities.

SimHash (Charikar, STOC'02) is the near-exact fallback required by
BASELINE.md: tiny edits flip few bits, so candidate pairs are found by
exact match on one of ``nchunks`` bit-chunks (pigeonhole: hamming <= d
guarantees an exact chunk match when nchunks >= d + 1).
"""

from __future__ import annotations

import numpy as np

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_ONE = np.uint64(1)


def simhash_from_shingles(shingles: np.ndarray) -> int:
    """64-bit SimHash of one shingle hash set (unweighted)."""
    if shingles.size == 0:
        return 0
    bits = ((shingles[:, None] >> _BIT_SHIFTS) & _ONE).sum(axis=0)
    word = ((bits * 2 > shingles.size).astype(np.uint64) << _BIT_SHIFTS).sum(
        dtype=np.uint64)
    return int(word)


def simhash_batch(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """SimHash for a batch of shingle sets -> (ndocs,) uint64.

    Vectorized via unpackbits + add.reduceat over the concatenation.
    """
    ndocs = len(shingle_sets)
    sizes = np.array([s.size for s in shingle_sets], dtype=np.int64)
    out = np.zeros(ndocs, dtype=np.uint64)
    nonempty = np.nonzero(sizes > 0)[0]
    if nonempty.size == 0:
        return out
    # cache-blocked per doc: a doc's (n, 64) uint8 bit matrix is tens of
    # KB and stays in L2 (batch-wide unpackbits streamed ~100MB+ per
    # batch and was memory-bandwidth-bound under multi-worker load)
    for d in nonempty:
        s = shingle_sets[d]
        bits = np.unpackbits(s.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little")
        sums = bits.sum(axis=0, dtype=np.int64)  # (64,)
        majority = (sums * 2 > s.size).astype(np.uint64)
        out[d] = (majority << _BIT_SHIFTS).sum(dtype=np.uint64)
    return out


def hamming_u64(a, b):
    """Vectorized Hamming distance between uint64 arrays (or scalars)."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64),
                       np.asarray(b, dtype=np.uint64))
    flat = np.atleast_1d(x)
    counts = np.unpackbits(flat.view(np.uint8).reshape(flat.size, 8),
                           axis=1).sum(axis=1)
    return int(counts[0]) if x.ndim == 0 else counts.reshape(x.shape)


def simhash_chunks(values: np.ndarray, nchunks: int = 4) -> np.ndarray:
    """Split 64-bit simhashes into (n, nchunks) uint64 chunk values."""
    width = 64 // nchunks
    mask = np.uint64((1 << width) - 1)
    out = np.empty((values.size, nchunks), dtype=np.uint64)
    for c in range(nchunks):
        out[:, c] = (values >> np.uint64(c * width)) & mask
    return out
