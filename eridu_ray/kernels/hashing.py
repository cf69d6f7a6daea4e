"""Stable 64-bit hashing primitives.

All hashes are process-independent (no Python ``hash()``, no
``PYTHONHASHSEED`` dependence) so that distributed runs at any parallelism
produce identical keys — the reference leans on fixed global seeds for
reproducibility (eridu/train/fine_tune_sbert.py:54-58); here every hashed
quantity is a pure function of (seed, payload).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_SH30 = np.uint64(30)
_SH27 = np.uint64(27)
_SH31 = np.uint64(31)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wrapping mul)."""
    z = (x + _SM_GAMMA).astype(np.uint64)
    z = (z ^ (z >> _SH30)) * _SM_M1
    z = (z ^ (z >> _SH27)) * _SM_M2
    return z ^ (z >> _SH31)


def hash_bytes_u64(data: bytes, seed: int = 0) -> int:
    """Stable 64-bit hash of a bytes payload (blake2b, keyed by seed)."""
    h = hashlib.blake2b(data, digest_size=8,
                        key=seed.to_bytes(8, "little", signed=False))
    return int.from_bytes(h.digest(), "little")


def hash_str_u64(s: str, seed: int = 0) -> int:
    return hash_bytes_u64(s.encode("utf-8"), seed)


def hash_strings_u64(strings, seed: int = 0) -> np.ndarray:
    """Hash an iterable of strings to uint64 (C-speed blake2b per string)."""
    key = seed.to_bytes(8, "little", signed=False)
    blake = hashlib.blake2b
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            blake(s.encode("utf-8"), digest_size=8, key=key).digest(), "little")
    return out


def combine_rows_u64(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash each ROW of a (n, m) uint64 matrix to one uint64.

    Used for LSH band keys: a band key is the combined hash of the band's
    r=8 signature values (SURVEY.md §7.1).  Vectorized polynomial mix with a
    splitmix64 finalizer per accumulation step.
    """
    acc = np.full(mat.shape[0], np.uint64(seed) ^ _SM_GAMMA, dtype=np.uint64)
    for j in range(mat.shape[1]):
        acc = splitmix64(acc ^ mat[:, j])
    return acc


def rng_u64(seed: int, n: int, stream: str) -> np.ndarray:
    """n deterministic uint64 values for a named stream (e.g. minhash a/b)."""
    root = hash_str_u64(stream, seed)
    idx = np.arange(n, dtype=np.uint64) + np.uint64(root)
    return splitmix64(idx)
