"""128-permutation MinHash signatures (vectorized, batch-oriented).

Implements the signature semantics required by BASELINE.md (128-perm
MinHash over char-5-gram shingle sets, LSH b=16 x r=8).  The permutation
family is h_i(x) = mix(a_i * x + b_i) over uint64 with wrapping arithmetic;
(a_i, b_i) derive from the single config seed (a_i forced odd).

Batch path: concatenate all documents' shingle sets and use
``np.minimum.reduceat`` per permutation over document boundaries — one
vectorized pass per permutation, no per-document Python loop.
"""

from __future__ import annotations

import numpy as np

from eridu_ray.kernels.hashing import rng_u64, splitmix64, combine_rows_u64

_EMPTY_FILL = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)


def minhash_params(seed: int, num_perms: int = 128):
    """(a, b) uint64 parameter arrays for the permutation family."""
    a = rng_u64(seed, num_perms, "minhash-a") | _ONE  # odd multipliers
    b = rng_u64(seed, num_perms, "minhash-b")
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """Signature of one shingle set -> (num_perms,) uint64."""
    if shingles.size == 0:
        return np.full(a.shape[0], _EMPTY_FILL, dtype=np.uint64)
    # (P, n) would be large for big docs; loop permutations, vector inner.
    sig = np.empty(a.shape[0], dtype=np.uint64)
    for i in range(a.shape[0]):
        sig[i] = (shingles * a[i] + b[i]).min()
    return splitmix64(sig)


def minhash_signatures_batch(shingle_sets: list[np.ndarray], a: np.ndarray,
                             b: np.ndarray) -> np.ndarray:
    """Signatures for a batch of shingle sets -> (ndocs, num_perms) uint64.

    Cache-blocked per document: the (num_perms, set_size) temp for a
    typical doc is ~100s of KB and stays in L2.  The previous
    per-permutation reduceat over the whole batch streamed ~GBs of temp
    arrays per batch — memory-bandwidth-bound, which collapsed multi-core
    scaling (measured 8-9x slowdown with 16 concurrent workers).
    Empty sets get all-max signatures (empty docs never enter LSH; the
    exact content-hash path covers them).
    """
    ndocs = len(shingle_sets)
    out = np.full((ndocs, a.shape[0]), _EMPTY_FILL, dtype=np.uint64)
    a_col = a[:, None]
    b_col = b[:, None]
    for d, s in enumerate(shingle_sets):
        if s.size:
            out[d] = (s[None, :] * a_col + b_col).min(axis=1)
            # very large docs: the temp above is (P, n); for n beyond L2
            # capacity numpy still only streams it once per doc
    nonempty = np.nonzero(
        np.array([s.size for s in shingle_sets], dtype=np.int64) > 0)[0]
    if nonempty.size:
        out[nonempty] = splitmix64(out[nonempty])
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """MinHash Jaccard estimate = fraction of agreeing signature slots."""
    return float(np.mean(sig_a == sig_b))


def band_keys(sigs: np.ndarray, bands: int, rows: int,
              seed: int = 0) -> np.ndarray:
    """LSH band keys for a (ndocs, num_perms) signature matrix.

    Returns (ndocs, bands) uint64 where entry [d, b] is the combined hash
    of band b's ``rows`` signature values, salted by the band index so
    identical row-slices in different bands never collide.
    """
    ndocs = sigs.shape[0]
    out = np.empty((ndocs, bands), dtype=np.uint64)
    for bi in range(bands):
        sl = sigs[:, bi * rows : (bi + 1) * rows]
        out[:, bi] = combine_rows_u64(sl, seed=seed ^ (0xB00 + bi))
    return out
