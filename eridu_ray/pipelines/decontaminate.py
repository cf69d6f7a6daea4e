"""Benchmark decontamination — drop training docs that leak an eval set.

A first-class LLM-training-data operator (beyond the reference's own
surface, which stops at intra-corpus dedup — eridu/etl/filter.py
deduplicates within the pairs corpus): given a (small) benchmark /
eval-set table, flag every corpus document that either

- **exactly matches** a benchmark text (128-bit content hash, the same
  collision posture as the exact-dedup stage, stages/signatures.py), or
- **overlaps heavily in word n-grams** — the GPT-3/Pile-style n-gram
  decontamination rule: a document whose distinct word-``n``-grams are
  ≥ 50% contained in the benchmark n-gram set is contaminated (catches
  near-verbatim inclusions and partial quotes that exact hashing
  misses).

Scale shape (the part that must survive 100 TB):

- The benchmark side is an EVAL SET — bounded by construction (thousands
  to low millions of rows, e.g. every public LM benchmark combined is
  ≪ 1 GB of n-grams).  It is collected once on the driver, indexed into
  two sorted uint64 arrays, and **broadcast via ray.put** — each scoring
  actor ``ray.get``s it once in ``__init__``, never per batch.
- The corpus side STREAMS: one ``map_batches`` actor pool, per-batch
  vectorized n-gram hashing (kernels/ngrams.py), one searchsorted per
  batch against the broadcast set.  No shuffle at all — decontamination
  is embarrassingly parallel once the small side is broadcast.
- If a benchmark ever exceeded worker heap, the fallback is the same
  token-keyed equality join the rarest-term operator documents
  (pipelines/textstats.py) — exchange proportional to corpus n-grams;
  not implemented because the premise (an eval set too big to
  broadcast) does not occur in practice.

Verdict columns are exact integers (hash-gate friendly): ``n_overlap`` /
``n_ngrams`` are distinct-n-gram counts, ``exact_hit`` / ``keep`` are
0/1 BIGINTs; the keep rule ``n_overlap * 2 < n_ngrams`` is evaluated in
integer cross-multiplication so both engines agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.kernels.hashing import hash_strings_u64
from eridu_ray.kernels.ngrams import doc_ngram_stats

#: word-n-gram order for the overlap rule (GPT-3 used 13-gram document
#: level; the synthetic corpus' ~60-token docs need a shorter window to
#: be meaningful — the operator takes it as a parameter)
NGRAM_N = 5

#: contamination threshold: drop when distinct-n-gram overlap ≥ 1/2
OVERLAP_NUM, OVERLAP_DEN = 1, 2


def build_benchmark_index(texts: list[str], n: int = NGRAM_N,
                          seed: int = 0) -> dict:
    """Index a benchmark text list: sorted exact-hash pair arrays
    (128-bit as two aligned uint64 columns sorted by the first) plus the
    sorted distinct n-gram hash set.  Driver-side, small by contract."""
    h1 = hash_strings_u64(texts, seed=seed + 1)
    h2 = hash_strings_u64(texts, seed=seed + 2)
    order = np.argsort(h1, kind="stable")
    h1, h2 = h1[order], h2[order]
    # the h1-searchsorted + h2-verify probe below assumes benchmark h1
    # values are unique; duplicate TEXTS share (h1, h2) so only a true
    # 64-bit collision between distinct texts can break it (~m^2/2^64)
    dup = h1[1:] == h1[:-1]
    if dup.any():
        if not (h2[1:][dup] == h2[:-1][dup]).all():
            raise RuntimeError(
                "64-bit h1 collision between distinct benchmark texts — "
                "widen the exact key (impossible in practice at eval-set "
                "sizes)")
        keep_mask = np.r_[True, ~dup]  # first of each duplicate-text run
        h1, h2 = h1[keep_mask], h2[keep_mask]
    arr = pa.array(texts, pa.string())
    from eridu_ray.kernels.ngrams import (flat_tokens_with_docs,
                                          rolling_ngram_hashes)

    flat, doc_idx = flat_tokens_with_docs(arr)
    tok_h = hash_strings_u64(list(flat), seed=seed)
    ng, _ = rolling_ngram_hashes(tok_h, doc_idx, n)
    return {"exact_h1": h1, "exact_h2": h2,
            "ngrams": np.unique(ng), "n": n, "seed": seed}


class DecontaminationScorer:
    """Actor-pool stage: per-batch contamination verdicts against the
    broadcast benchmark index (``ray.get`` once per actor)."""

    def __init__(self, index_ref):
        import ray

        idx = ray.get(index_ref) if not isinstance(index_ref, dict) \
            else index_ref
        self.h1 = idx["exact_h1"]
        self.h2 = idx["exact_h2"]
        self.ngrams = idx["ngrams"]
        self.n = idx["n"]
        self.seed = idx["seed"]

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b["text"]
        n_docs = b.num_rows
        tl = texts.to_pylist()
        t1 = hash_strings_u64(tl, seed=self.seed + 1)
        t2 = hash_strings_u64(tl, seed=self.seed + 2)
        if len(self.h1):
            pos = np.searchsorted(self.h1, t1)
            pos[pos == len(self.h1)] = 0
            exact = (self.h1[pos] == t1) & (self.h2[pos] == t2)
        else:
            exact = np.zeros(n_docs, bool)
        n_overlap, n_ngrams = doc_ngram_stats(
            texts, n_docs, self.ngrams, self.n, seed=self.seed)
        # integer cross-multiplication: overlap/ngrams < NUM/DEN exactly
        keep = (~exact) & ((n_ngrams == 0) |
                           (n_overlap * OVERLAP_DEN <
                            n_ngrams * OVERLAP_NUM))
        return pa.table({
            "doc_id": b["doc_id"],
            "exact_hit": pa.array(exact.astype(np.int64)),
            "n_overlap": pa.array(n_overlap),
            "n_ngrams": pa.array(n_ngrams),
            "keep": pa.array(keep.astype(np.int64)),
        })


def decontaminate(ds, benchmark_texts: list[str], n: int = NGRAM_N,
                  seed: int = 0, concurrency=None, batch_size: int = 1024):
    """Verdict table for every row of ``ds`` (needs doc_id + text
    columns) against the benchmark list.  Broadcast once, stream the
    corpus; filter ``keep = 1`` downstream to materialize the clean
    corpus."""
    import ray

    if concurrency is None:
        from eridu_ray.config import DEFAULT_CONFIG

        concurrency = DEFAULT_CONFIG.scorer_concurrency
    index_ref = ray.put(build_benchmark_index(benchmark_texts, n, seed))
    return ds.map_batches(
        DecontaminationScorer, fn_constructor_kwargs={
            "index_ref": index_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


#: deterministic benchmark selector for the driver query — stands in for
#: the external eval set (no external data allowed): every 11th doc
BENCH_MOD, BENCH_REM = 11, 3


def q_decontaminate(sf_dir: str):
    """queries() entry: decontaminate the documents table against the
    deterministic pseudo-benchmark (doc_id % 11 == 3).  The benchmark
    side is read column-pruned and collected (small by construction);
    the corpus side streams through the actor pool."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def pick_bench(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % BENCH_MOD == BENCH_REM))

    bench = docs.map_batches(pick_bench, batch_format="pyarrow").take_all()
    bench_texts = [r["text"] for r in bench]
    return decontaminate(docs, bench_texts)


DECONTAMINATE_SQL = f"""
WITH bench AS (
  SELECT text, string_split(text, ' ') AS toks FROM documents
  WHERE doc_id % {BENCH_MOD} = {BENCH_REM}
), bench_ng AS (
  SELECT DISTINCT unnest(list_transform(
      range(1, greatest(len(toks) - {NGRAM_N - 2}, 1)),
      i -> {" || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]"
                               for j in range(NGRAM_N))})) AS ng
  FROM bench
), cng AS (
  SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(toks) - {NGRAM_N - 2}, 1)),
      i -> {" || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]"
                               for j in range(NGRAM_N))})) AS ng
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), cdist AS (
  SELECT DISTINCT doc_id, ng FROM cng
), hits AS (
  SELECT c.doc_id, count(*) AS n_ngrams,
         count(*) FILTER (WHERE b.ng IS NOT NULL) AS n_overlap
  FROM cdist c LEFT JOIN bench_ng b ON c.ng = b.ng
  GROUP BY 1
)
SELECT d.doc_id,
       (d.text IN (SELECT text FROM bench))::BIGINT AS exact_hit,
       COALESCE(h.n_overlap, 0)::BIGINT AS n_overlap,
       COALESCE(h.n_ngrams, 0)::BIGINT AS n_ngrams,
       (NOT (d.text IN (SELECT text FROM bench))
        AND (COALESCE(h.n_ngrams, 0) = 0
             OR COALESCE(h.n_overlap, 0) * {OVERLAP_DEN}
                < COALESCE(h.n_ngrams, 0) * {OVERLAP_NUM}))::BIGINT AS keep
FROM documents d LEFT JOIN hits h USING (doc_id)
"""
