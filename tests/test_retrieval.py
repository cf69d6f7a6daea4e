"""BM25 retrieval: brute-force reference implementation + determinism.

The driver-facing oracle gate (DuckDB SQL) lives in
test_relational_oracle.py via the registry; these tests pin the BM25
semantics themselves against an independent pure-Python scorer and the
tie-break/stability contract.
"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eridu_ray.pipelines.retrieval import (B, K1, QUERY_TERMS, TF_SCALE,
                                           TOPK, q_bm25_topk)

SF_DIR = "/root/testdata/sf0.001"


def _brute_bm25(texts):
    """Row-at-a-time BM25 over split-on-space tokens ('' dropped)."""
    docs = [[t for t in s.split(" ") if t != ""] for s in texts]
    n = float(len(docs))
    sum_dl = float(sum(len(d) for d in docs))
    avgdl = sum_dl / n
    scores = []
    for d in docs:
        dl = float(len(d))
        s = 0.0
        for term in QUERY_TERMS:
            tf = float(d.count(term))
            df = float(sum(1 for dd in docs if term in dd))
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s = s + idf * ((tf * TF_SCALE)
                           / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl)))
        scores.append(s)
    return scores


@pytest.fixture(scope="module")
def ray_result():
    return q_bm25_topk(SF_DIR).to_pandas()


def test_bm25_matches_bruteforce(ray_result):
    tab = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"])
    doc_ids = tab["doc_id"].to_numpy(zero_copy_only=False)
    scores = np.array(_brute_bm25(tab["text"].to_pylist()))
    micro = np.floor(scores * 1_000_000.0).astype(np.int64)
    keep = micro > 0
    order = np.lexsort((doc_ids[keep], -micro[keep]))[:TOPK]
    want_ids = doc_ids[keep][order]
    want_micro = micro[keep][order]
    assert list(ray_result["doc_id"]) == list(want_ids)
    assert list(ray_result["score_micro"]) == list(want_micro)


def test_bm25_topk_shape_and_order(ray_result):
    assert len(ray_result) == TOPK
    m = ray_result["score_micro"].to_numpy()
    assert (np.diff(m) <= 0).all()  # descending scores
    # within equal scores, ascending doc_id
    d = ray_result["doc_id"].to_numpy()
    same = m[1:] == m[:-1]
    assert (d[1:][same] > d[:-1][same]).all()
    assert (m > 0).all()


def test_bm25_rare_term_docs_rank_first(ray_result):
    """'dup' has df=25 of 500 at sf0.001 — its idf dwarfs the
    near-ubiquitous terms', so every top-scored doc must contain it."""
    tab = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"])
    has_dup = {i for i, t in zip(tab["doc_id"].to_pylist(),
                                 tab["text"].to_pylist())
               if "dup" in t.split(" ")}
    top = list(ray_result["doc_id"][:5])
    assert all(i in has_dup for i in top), top


def test_bm25_empty_corpus(tmp_path):
    """The n_docs == 0 guard: schema-stable empty result, no div-by-zero."""
    import ray.data as rd

    tab = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tab, str(d / "documents.parquet"))
    out = q_bm25_topk(str(d))
    # a schema-stable 0-row DATASET (ADVICE r4): the CLI search command
    # calls .take_all(), which a bare pyarrow Table lacks
    assert hasattr(out, "take_all")
    assert out.take_all() == []
    assert out.schema().names == ["doc_id", "score_micro"]


def test_bm25_absent_terms(tmp_path):
    """Query terms absent from the corpus: every score is 0 -> no hits
    (the score_micro > 0 filter), not a crash."""
    tab = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["alpha beta", "beta gamma"],
                                     pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tab, str(d / "documents.parquet"))
    out = q_bm25_topk(str(d), terms=("zzz",)).to_pandas()
    assert len(out) == 0
