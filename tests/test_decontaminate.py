"""Benchmark-decontamination operator tests (pipelines/decontaminate.py)
plus the shared word-n-gram kernels (kernels/ngrams.py): DuckDB oracle
parity at sf0.001, a brute-force Python oracle on a hand-built corpus,
and edge fixtures (zero-ngram docs, duplicate benchmark texts, doc
boundaries)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from eridu_ray.kernels.hashing import hash_strings_u64
from eridu_ray.kernels.ngrams import (flat_tokens_with_docs,
                                      repetition_stats,
                                      rolling_ngram_hashes)
from eridu_ray.pipelines.decontaminate import (DECONTAMINATE_SQL, NGRAM_N,
                                               DecontaminationScorer,
                                               build_benchmark_index,
                                               decontaminate,
                                               q_decontaminate)

SF = "/root/testdata/sf0.001"


def _brute_ngrams(text: str, n: int) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_oracle_parity_sf0001(ray_session):
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            f"read_parquet('{SF}/documents.parquet')")
    got = q_decontaminate(SF).to_pandas()
    want = con.sql(DECONTAMINATE_SQL).df()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
    pd.testing.assert_frame_equal(a, b)
    # non-vacuous: the pseudo-benchmark exists and near-dups are caught
    assert got["exact_hit"].sum() > 0
    assert (got["keep"] == 0).sum() >= got["exact_hit"].sum()


def test_brute_force_semantics(ray_session):
    """Exact-match, heavy-overlap, light-overlap and zero-ngram docs
    against a hand-built benchmark — verdicts must match a per-doc
    Python set computation."""
    import ray.data as rd

    bench = ["alpha beta gamma delta epsilon zeta eta theta",
             "one two three four five six seven eight nine"]
    corpus = [
        bench[0],                                   # exact hit
        "alpha beta gamma delta epsilon zeta eta X",  # heavy overlap
        "alpha beta gamma X Y Z W V U T",             # light overlap
        "totally different words with no overlap at all here",
        "tiny doc",                                  # < n tokens: no ngrams
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(corpus)), pa.int64()),
        "text": pa.array(corpus, pa.string())}))
    got = decontaminate(ds, bench).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    bench_ng = set().union(*[_brute_ngrams(t, NGRAM_N) for t in bench])
    for i, text in enumerate(corpus):
        ng = _brute_ngrams(text, NGRAM_N)
        exact = text in bench
        overlap = len(ng & bench_ng)
        keep = (not exact) and (len(ng) == 0 or overlap * 2 < len(ng))
        row = got.iloc[i]
        assert row["exact_hit"] == int(exact), text
        assert row["n_ngrams"] == len(ng), text
        assert row["n_overlap"] == overlap, text
        assert row["keep"] == int(keep), text
    # the zero-ngram doc is KEPT (the r4 edge both engines honor)
    assert got.iloc[4]["keep"] == 1 and got.iloc[4]["n_ngrams"] == 0


def test_duplicate_benchmark_texts_deduped():
    idx = build_benchmark_index(["same text here okay fine",
                                 "same text here okay fine",
                                 "another benchmark entry entirely new"])
    assert len(idx["exact_h1"]) == 2
    assert (np.diff(idx["exact_h1"].astype(np.int64)) != 0).all()
    scorer = DecontaminationScorer(idx)
    out = scorer(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["same text here okay fine"], pa.string())}))
    assert out["exact_hit"].to_pylist() == [1]


def test_rolling_ngrams_respect_doc_boundaries():
    texts = pa.array(["a b c d", "e f g h"], pa.string())
    flat, doc = flat_tokens_with_docs(texts)
    th = hash_strings_u64(list(flat))
    ng, ng_doc = rolling_ngram_hashes(th, doc, 3)
    # 2 windows per doc, none spanning the boundary
    assert ng_doc.tolist() == [0, 0, 1, 1]
    # 'c d e' (cross-doc) must not appear: its hash differs from all 4
    cross = hash_strings_u64(["c", "d", "e"])
    from eridu_ray.kernels.hashing import combine_rows_u64

    cross_h = combine_rows_u64(cross.reshape(1, 3))[0]
    assert cross_h not in set(ng.tolist())


def test_repetition_stats_brute_force():
    """top-bigram and duplicated-trigram counts vs collections.Counter."""
    from collections import Counter

    texts = ["a b a b a b c", "x y z", "q q q q", "lone", ""]
    got = repetition_stats(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        toks = t.split(" ")
        bgs = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        tgs = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        assert got["n_bigrams"][i] == len(bgs), t
        assert got["top_bigram_n"][i] == (
            max(Counter(bgs).values()) if bgs else 0), t
        assert got["n_trigrams"][i] == len(tgs), t
        assert got["dup_trigram_n"][i] == len(tgs) - len(set(tgs)), t


def test_scorer_empty_benchmark():
    scorer = DecontaminationScorer(build_benchmark_index([]))
    out = scorer(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["anything goes here fine now yes"], pa.string())}))
    assert out["keep"].to_pylist() == [1]
    assert out["n_overlap"].to_pylist() == [0]
    assert out["n_ngrams"].to_pylist() == [2]
