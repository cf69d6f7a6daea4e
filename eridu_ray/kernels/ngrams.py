"""Vectorized word-level n-gram kernels over Arrow token lists.

Shared by the decontamination operator (``pipelines/decontaminate.py``)
and the per-document repetition quality signals
(``pipelines/textstats.q_repetition_quality``).  Everything here runs on
a whole batch at once: one ``pc.split_pattern`` per batch, numpy
sliding-window views over the flat token stream, lexsort run detection —
no per-row Python in any hot path.

Two key spaces, chosen per use:

- **batch-local exact codes** (``pandas.factorize`` token ids combined
  into 64-bit composite keys): collision-FREE, valid only within one
  batch — used for per-doc repetition counting, where every count is
  batch-local (one doc = one row).
- **global stable hashes** (blake2b token hashes rolled through a
  splitmix64 chain, ``combine_rows_u64``): stable across batches,
  workers and processes — used for cross-set membership (benchmark
  n-gram sets).  64-bit: the chance a corpus n-gram falsely collides
  into a benchmark set of m n-grams is m/2^64 per lookup (~1e-13 at
  m=1e6); a 10^12-document run should widen to 128-bit keys the same
  way the exact-dedup stage does (stages/signatures.py chash/chash2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from eridu_ray.kernels.hashing import combine_rows_u64, hash_strings_u64


def flat_tokens_with_docs(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-split every text; return (flat token array, doc index
    per token).  Empty-string tokens are kept OUT (matches the SQL
    ``WHERE t <> ''`` convention used across the textstats oracles is
    NOT applied here — n-gram semantics use raw split positions so both
    engines see identical windows; the testdata has no repeated spaces)."""
    toks = pc.split_pattern(texts, " ")
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten().to_numpy(zero_copy_only=False)
    offsets = la.offsets.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(la), dtype=np.int64),
                        np.diff(offsets))
    return flat, doc_idx


def rolling_ngram_hashes(tok_h: np.ndarray, doc_idx: np.ndarray,
                         n: int) -> tuple[np.ndarray, np.ndarray]:
    """Stable 64-bit hash of every length-n token window that lies fully
    inside one document.  Returns (ngram hashes, doc index per n-gram).

    tok_h: uint64 per-token hashes (global, stable); doc_idx: int64.
    Fully vectorized: one sliding_window_view + combine_rows_u64 call."""
    m = len(tok_h) - n + 1
    if m <= 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    win = np.lib.stride_tricks.sliding_window_view(tok_h, n)
    valid = doc_idx[:m] == doc_idx[n - 1:]
    return combine_rows_u64(np.ascontiguousarray(win[valid])), \
        doc_idx[:m][valid]


def per_doc_distinct(keys: np.ndarray,
                     doc_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (doc, key) pairs via one lexsort + run mask."""
    if len(keys) == 0:
        return keys, doc_idx
    order = np.lexsort((keys, doc_idx))
    k, d = keys[order], doc_idx[order]
    first = np.r_[True, (k[1:] != k[:-1]) | (d[1:] != d[:-1])]
    return k[first], d[first]


def doc_ngram_stats(texts, n_docs: int, bench_sorted: np.ndarray,
                    n: int, seed: int = 0
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Per-document (n_overlap, n_ngrams) against a SORTED benchmark
    n-gram hash set: distinct doc n-grams, one searchsorted membership
    test, one bincount per output column.  Docs with fewer than n tokens
    report (0, 0)."""
    flat, doc_idx = flat_tokens_with_docs(texts)
    tok_h = hash_strings_u64(list(flat), seed=seed)
    ng, ng_doc = rolling_ngram_hashes(tok_h, doc_idx, n)
    ng, ng_doc = per_doc_distinct(ng, ng_doc)
    n_ngrams = np.bincount(ng_doc, minlength=n_docs).astype(np.int64)
    if len(ng) and len(bench_sorted):
        pos = np.searchsorted(bench_sorted, ng)
        pos[pos == len(bench_sorted)] = 0
        hit = bench_sorted[pos] == ng
        n_overlap = np.bincount(ng_doc[hit], minlength=n_docs).astype(
            np.int64)
    else:
        n_overlap = np.zeros(n_docs, np.int64)
    return n_overlap, n_ngrams


def _segment_counts(keys: np.ndarray, doc_idx: np.ndarray, n_docs: int
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For composite (doc, key) streams: per-doc total occurrences,
    per-doc distinct keys, and per-doc MAX single-key count — one
    lexsort, run-length arithmetic after it."""
    total = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    if len(keys) == 0:
        z = np.zeros(n_docs, np.int64)
        return total, z, z
    order = np.lexsort((keys, doc_idx))
    k, d = keys[order], doc_idx[order]
    starts = np.flatnonzero(np.r_[True, (k[1:] != k[:-1]) |
                                  (d[1:] != d[:-1])])
    run_len = np.diff(np.r_[starts, len(k)])
    run_doc = d[starts]
    distinct = np.bincount(run_doc, minlength=n_docs).astype(np.int64)
    top = np.zeros(n_docs, np.int64)
    np.maximum.at(top, run_doc, run_len)
    return total, distinct, top


def repetition_stats(texts) -> dict[str, np.ndarray]:
    """Gopher-style per-document repetition signals, exact and
    collision-free (batch-local ``factorize`` codes packed into 64-bit
    composite keys — a bigram key is (code_a << 32) | code_b, safe
    because a batch holds far fewer than 2^32 distinct tokens):

    - ``top_bigram_n`` / ``n_bigrams``: occurrences of the most frequent
      adjacent bigram vs all bigram occurrences (top-2-gram fraction).
    - ``dup_trigram_n`` / ``n_trigrams``: trigram occurrences beyond the
      first of each distinct trigram (duplicated-3-gram fraction).
    """
    import pandas as pd

    flat, doc_idx = flat_tokens_with_docs(texts)
    n_docs = len(texts)
    codes, uniq = pd.factorize(flat)
    assert len(uniq) < (1 << 31), "batch token vocabulary overflows key"
    codes = codes.astype(np.int64)
    out = {}
    # adjacent bigrams: positions i where doc[i] == doc[i+1]
    if len(codes) >= 2:
        vb = doc_idx[:-1] == doc_idx[1:]
        bg = ((codes[:-1] << 32) | codes[1:])[vb]
        bg_doc = doc_idx[:-1][vb]
    else:
        bg = np.empty(0, np.int64)
        bg_doc = np.empty(0, np.int64)
    n_bg, _, top_bg = _segment_counts(bg, bg_doc, n_docs)
    out["top_bigram_n"], out["n_bigrams"] = top_bg, n_bg
    # trigrams: re-factorize bigram keys so the composite stays in 64 bits
    if len(codes) >= 3:
        vt = doc_idx[:-2] == doc_idx[2:]
        bg_all = (codes[:-1] << 32) | codes[1:]
        bg_codes = pd.factorize(bg_all)[0].astype(np.int64)
        tg = ((bg_codes[:-1] << 32) | codes[2:])[vt]
        tg_doc = doc_idx[:-2][vt]
    else:
        tg = np.empty(0, np.int64)
        tg_doc = np.empty(0, np.int64)
    n_tg, distinct_tg, _ = _segment_counts(tg, tg_doc, n_docs)
    out["dup_trigram_n"] = n_tg - distinct_tg
    out["n_trigrams"] = n_tg
    return out
