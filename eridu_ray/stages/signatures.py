"""Extraction + signature stage (stateless map_batches over Arrow).

One pass over the pages table produces everything downstream stages need:
extracted text (trafilatura-style, byte-identical per url — the BASELINE.md
contract), content hash for exact dedup, shingle set, 128-perm MinHash
signature, and 64-bit SimHash.  The reference computes its per-record
features with pandas/Spark UDFs (eridu/etl/augment.py:20-31,
eridu/etl/disco.py:81); here it is one vectorized Arrow batch transform.

Emitted schema:
  url: string, node_id: int64 (63-bit stable hash of url),
  chash: int64 (63-bit hash of extracted text; exact-dup key),
  text: string (extracted), n_shingles: int32,
  minhash: list<uint64>[128], simhash: int64 (bit-reinterpreted uint64),
  shingles: list<uint64> (sorted unique; retained for exact-Jaccard verify)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.hashing import hash_bytes_u64, hash_strings_u64
from eridu_ray.kernels.minhash import minhash_params, minhash_signatures_batch
from eridu_ray.kernels.shingle import shingle_hashes
from eridu_ray.kernels.simhash import simhash_batch
from eridu_ray.kernels.text import extract_text, normalize_text
from eridu_ray.kernels.mem import ensure_malloc_pool

ensure_malloc_pool()

_ONE = np.uint64(1)


def _span_fingerprints(text_norm: str, positional: np.ndarray,
                       window: int, seed: int) -> np.ndarray:
    """Substring-stage candidate fingerprints: winnow bigrams ∪ repetition
    markers ∪ CDC chunk hashes (see kernels.shingle docstrings for the
    per-family guarantees — the union covers each family's miss case:
    CDC catches short-winnow tails, markers catch repetitive spans that
    collapse to <2 bigrams and would die at the junk-pair guard)."""
    from eridu_ray.kernels.shingle import (_winnow_bigram_fps,
                                           cdc_fingerprints,
                                           repetition_marker_fps,
                                           winnow_select_runs)

    sel, runs = winnow_select_runs(positional, window=window)
    bigrams = _winnow_bigram_fps(sel)
    markers = repetition_marker_fps(sel, runs, window)
    cdc = cdc_fingerprints(text_norm, positional, seed=seed)
    return np.unique(np.concatenate([bigrams, markers, cdc]))


def _as_i63(u: np.ndarray) -> np.ndarray:
    """uint64 -> non-negative int64 (drop one bit) for Arrow-friendly keys."""
    return (u >> _ONE).astype(np.int64)


class SignatureStage:
    """Callable class for ``map_batches`` — minhash params built once.

    Cheap enough for stateless tasks, but as a callable class Ray runs it as
    an actor pool and the permutation arrays + compiled regexes are
    constructed once per worker (reference analog: model/pattern loaded once
    per process, eridu/etl/compare.py:32-61).
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 winnow_only: bool = False):
        # winnow_only: compute just node ids + text + winnow span
        # fingerprints — the standalone substring family's needs.  The
        # full stage spends most of its wall on the 128-perm minhash
        # matrix, simhash and the 32-bit verify blobs, none of which
        # the span candidates or the SA verify consume (VERDICT r4
        # next #6: substring_cut re-signed the corpus at full cost).
        # Winnow fps are IDENTICAL between modes (same positional
        # shingle hashes; gated in tests/test_substring.py).
        self.cfg = cfg or PipelineConfig()
        self.winnow_only = winnow_only
        if not winnow_only:
            self.a, self.b = minhash_params(self.cfg.seed,
                                            self.cfg.num_perms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch["url"].to_pylist()
        if "html" in batch.column_names:
            texts = [extract_text(h) for h in batch["html"].to_pylist()]
        else:  # pre-extracted text input (e.g. the documents table)
            texts = batch["text"].to_pylist()
        norm = [normalize_text(t) for t in texts]
        # positional shingle hashes computed once, reused for the shingle
        # set, and for the winnowing fingerprints of the substring stage
        positional = [shingle_hashes(t, k=cfg.shingle_k, seed=cfg.seed)
                      for t in norm]
        winnows = [_span_fingerprints(t, p, cfg.winnow_window, cfg.seed)
                   for t, p in zip(norm, positional)]

        if self.winnow_only:
            node_id = _as_i63(hash_strings_u64(urls, seed=cfg.seed))
            win_sizes = np.array([w.size for w in winnows], dtype=np.int32)
            win_values = (np.concatenate(winnows)
                          if winnows and win_sizes.sum()
                          else np.empty(0, dtype=np.uint64))
            win_offsets = np.zeros(len(winnows) + 1, dtype=np.int32)
            np.cumsum(win_sizes, out=win_offsets[1:])
            # n_shingles here is the POSITIONAL count (full mode: unique
            # count) — downstream the substring family uses it only as
            # the > 0 emptiness gate, where the two agree exactly
            # (both > 0 iff len(normalized text) >= k)
            n_pos = np.array([p.size for p in positional], dtype=np.int32)
            return pa.table({
                "url": pa.array(urls, pa.string()),
                "node_id": pa.array(node_id),
                "text": pa.array(texts, pa.string()),
                "n_shingles": pa.array(n_pos),
                "winnow": pa.ListArray.from_arrays(
                    pa.array(win_offsets), pa.array(win_values)),
            })

        sets = [np.unique(p) for p in positional]

        sigs = minhash_signatures_batch(sets, self.a, self.b)  # (n, P) u64
        simh = simhash_batch(sets)  # (n,) u64

        node_id = _as_i63(hash_strings_u64(urls, seed=cfg.seed))
        # two independent 64-bit content hashes = a 128-bit exact-dup key:
        # expected silent collisions at 10^12 docs ~ 10^24 pairs * 2^-128
        # ~ 3e-15 — the exact path needs no byte comparison (and thus the
        # exact-group shuffle never ships text)
        enc = [t.encode("utf-8") for t in texts]
        chash = np.fromiter(
            (hash_bytes_u64(t, seed=cfg.seed) >> 1 for t in enc),
            dtype=np.int64, count=len(texts))
        chash2 = np.fromiter(
            (hash_bytes_u64(t, seed=cfg.seed ^ 0x5EED5EED) >> 1
             for t in enc),
            dtype=np.int64, count=len(texts))
        sizes = np.array([s.size for s in sets], dtype=np.int32)

        # retained VERIFY sets: 32-bit projection (kernels.shingle
        # .to_verify_set32 — halves the verify-shuffle blob traffic;
        # minhash/simhash/winnow above keep the 64-bit hashes)
        from eridu_ray.kernels.shingle import to_verify_set32

        sets32 = [to_verify_set32(s) for s in sets]
        sizes32 = np.array([s.size for s in sets32], dtype=np.int32)
        shingle_values = (np.concatenate(sets32) if sets32 and sizes32.sum()
                          else np.empty(0, dtype=np.uint32))
        shingle_offsets = np.zeros(len(sets32) + 1, dtype=np.int64)
        np.cumsum(sizes32, out=shingle_offsets[1:])

        win_sizes = np.array([w.size for w in winnows], dtype=np.int32)
        win_values = (np.concatenate(winnows) if winnows and win_sizes.sum()
                      else np.empty(0, dtype=np.uint64))
        win_offsets = np.zeros(len(winnows) + 1, dtype=np.int32)
        np.cumsum(win_sizes, out=win_offsets[1:])

        return pa.table({
            "url": pa.array(urls, pa.string()),
            "node_id": pa.array(node_id),
            "chash": pa.array(chash),
            "chash2": pa.array(chash2),
            "text": pa.array(texts, pa.string()),
            "n_shingles": pa.array(sizes),
            "minhash": pa.ListArray.from_arrays(
                pa.array(np.arange(0, (len(sets) + 1) * cfg.num_perms,
                                   cfg.num_perms, dtype=np.int32)),
                pa.array(sigs.reshape(-1))),
            "simhash": pa.array(simh.view(np.int64)),
            # verify set as uint32-LE blob: Acero joins reject list
            # payloads, so this is the join-ready wire format from the
            # start (decode with verify.blob_to_u32)
            "shingles": pa.array(
                [shingle_values[shingle_offsets[i]:
                                shingle_offsets[i + 1]].tobytes()
                 for i in range(len(sets32))], pa.binary()),
            "winnow": pa.ListArray.from_arrays(
                pa.array(win_offsets), pa.array(win_values)),
        })


def list_col_to_matrix(col: pa.ChunkedArray | pa.Array,
                       width: int) -> np.ndarray:
    """list<uint64> column with fixed-length lists -> (n, width) uint64."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.uint64, copy=False)
    return flat.reshape(-1, width)


def list_col_to_arrays(col) -> tuple[np.ndarray, np.ndarray]:
    """list<uint64> column -> (flat_values_u64, offsets_i64)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.uint64, copy=False)
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offsets
