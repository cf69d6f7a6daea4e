"""Suffix-array kernel + substring-cut pipeline tests.

Kernel: generalized-SA longest common substring vs difflib (exact
oracle) with offset validity.  Pipeline: planted shared spans in a tmp
documents.parquet must be found at their exact lengths/offsets and
excised exactly once per character (overlapping spans merged).
"""

import difflib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.shingle import shared_run_length
from eridu_ray.kernels.suffix import (pair_longest_span,
                                      suffix_array_ranks)


def _lcs_oracle(a: str, b: str):
    m = difflib.SequenceMatcher(None, a, b, autojunk=False)
    r = m.find_longest_match(0, len(a), 0, len(b))
    return r.size


def test_suffix_array_banana():
    codes = np.frombuffer("banana".encode("utf-32-le"), dtype=np.uint32)
    sa, _ = suffix_array_ranks(codes)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]


def test_pair_longest_span_matches_difflib_and_hash():
    rng = np.random.default_rng(17)
    for _ in range(120):
        la, lb = rng.integers(0, 80, 2)
        a = "".join(rng.choice(list("abcab"), la))
        b = "".join(rng.choice(list("abcab"), lb))
        ln, xa, xb = pair_longest_span(a, b)
        assert ln == _lcs_oracle(a, b)
        assert ln == shared_run_length(a, b)
        if ln:
            assert a[xa:xa + ln] == b[xb:xb + ln]


def test_pair_longest_span_unicode_and_gates():
    ln, xa, xb = pair_longest_span("xxЖелезный поток!yy",
                                   "qqЖелезный поток!zz")
    assert (ln, xa, xb) == (15, 2, 2)
    assert pair_longest_span("", "abc") == (0, -1, -1)
    assert pair_longest_span("abc", "") == (0, -1, -1)
    assert pair_longest_span("abc", "abc", min_len=4) == (0, -1, -1)
    assert pair_longest_span("abc", "abc", min_len=3) == (3, 0, 0)


def test_flagship_span_strategy_identity():
    """span_strategy="sa" (suffix array) and "hash" (rolling hash) give
    identical span edges on a corpus with repetitive + plain spans."""
    import ray.data as rd

    from eridu_ray.pipelines.dedup import run_dedup

    rng = np.random.default_rng(3)
    span_plain = "".join(rng.choice(list("abcdefgh ij"), 260))
    span_rep = "res-ume " * 30
    urls, texts = [], []
    for i in range(8):
        filler = " ".join(f"u{i}w{j}{rng.integers(1e6)}" for j in range(40))
        ins = ""
        if i in (0, 1):
            ins = " " + span_plain + " "
        if i in (2, 3):
            ins = " " + span_rep + " "
        urls.append(f"u{i}")
        texts.append(filler[:100] + ins + filler[100:])
    pages = pa.table({"url": urls, "text": texts})
    out = {}
    for strat in ("hash", "sa"):
        cfg = PipelineConfig(num_partitions=4, span_strategy=strat)
        res = run_dedup(rd.from_arrow(pages), cfg)
        out[strat] = res.span_edges.to_pandas().sort_values(
            ["url_a", "url_b"]).reset_index(drop=True)
    assert len(out["sa"]) >= 2  # both planted spans found
    assert out["hash"].equals(out["sa"])


@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    """documents.parquet with three planted shared spans:

    - S1 (150 chars): docs 1 and 5 — single clean cut in doc 5;
    - S2 = X[0:130] in doc 2, S3 = X[80:200] in doc 3, with the full
      200-char X inside doc 6 — doc 6's two cut intervals overlap and
      must merge to exactly X.
    Sentinel chars around each planted copy differ per doc so the SA
    longest-match is exactly the planted span (no boundary extension).
    """
    rng = np.random.default_rng(99)

    def filler(tag: str, n: int) -> str:
        return " ".join(f"{tag}t{j}x{rng.integers(10**6)}"
                        for j in range(n))

    def stream(tag: str, n_chars: int) -> str:
        s = filler(tag, n_chars // 6 + 4).replace(" ", "_")
        return s[:n_chars]

    s1 = stream("S1", 150)
    x = stream("XX", 200)
    s2, s3 = x[:130], x[80:]
    texts = {
        0: filler("d0", 40),
        1: filler("d1a", 20) + "<" + s1 + ">" + filler("d1b", 20),
        2: filler("d2a", 20) + "<" + s2 + ">" + filler("d2b", 20),
        3: filler("d3a", 20) + "<" + s3 + ">" + filler("d3b", 20),
        4: filler("d4", 40),
        5: filler("d5a", 20) + "{" + s1 + "}" + filler("d5b", 20),
        6: filler("d6a", 20) + "{" + x + "}" + filler("d6b", 20),
    }
    tab = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    })
    d = tmp_path_factory.mktemp("substring_sf")
    pq.write_table(tab, str(d / "documents.parquet"))
    return str(d), texts, {"s1": s1, "x": x, "s2": s2, "s3": s3}


def test_substring_spans_planted(planted_docs):
    from eridu_ray.pipelines.substring import substring_spans

    sf_dir, texts, sp = planted_docs
    cfg = PipelineConfig(num_partitions=4)
    spans = substring_spans(sf_dir, cfg).to_pandas()
    got = {(int(r.doc_id_a), int(r.doc_id_b)): r
           for r in spans.itertuples()}
    assert set(got) == {(1, 5), (2, 6), (3, 6)}
    assert got[(1, 5)].span_len == 150
    assert got[(2, 6)].span_len == 130
    assert got[(3, 6)].span_len == 120
    for (a, b), r in got.items():
        shared = texts[a][r.pos_a:r.pos_a + r.span_len]
        assert shared == texts[b][r.pos_b:r.pos_b + r.span_len]
        assert (int(r.doc_id_a), int(r.doc_id_b)) == (a, b)


def test_substring_cut_planted(planted_docs):
    from eridu_ray.pipelines.substring import substring_cut

    sf_dir, texts, sp = planted_docs
    cfg = PipelineConfig(num_partitions=4)
    cut = substring_cut(sf_dir, cfg).to_pandas().set_index("doc_id")
    # victims are the HIGHER doc ids only; canonical copies keep text
    assert set(cut.index) == {5, 6}
    # doc 5: exactly S1 removed, once
    assert cut.loc[5, "n_spans"] == 1
    assert cut.loc[5, "removed_chars"] == 150
    assert cut.loc[5, "text_cut"] == texts[5].replace(sp["s1"], "")
    # doc 6: S2 and S3 overlap inside X — merged to one 200-char cut
    assert cut.loc[6, "n_spans"] == 2
    assert cut.loc[6, "removed_chars"] == 200
    assert cut.loc[6, "text_cut"] == texts[6].replace(sp["x"], "")


def test_substring_cut_runs_on_testdata():
    """sf0.001 smoke: schema stable, every row consistent (the driver's
    rows-only gate mirrors this)."""
    from eridu_ray.pipelines.substring import q_substring_cut

    out = q_substring_cut("/root/testdata/sf0.001").to_pandas()
    assert list(out.columns) == ["doc_id", "n_spans", "removed_chars"]
    assert (out["removed_chars"] > 0).all()
    assert (out["n_spans"] >= 1).all()


def test_substring_span_contract_boundary(tmp_path):
    """A span of EXACTLY DOC_MIN_SPAN=100 chars sits below the old
    window-64 bigram guarantee (2*64+4 = 132) — the family's window-32
    config guarantees one shared bigram at 68 and TWO at 100, so the
    junk-pair guard (winnow_min_hits=2) keeps it; an 80-char span stays
    sub-threshold."""
    rng = np.random.default_rng(7)

    def filler(tag, n):
        return " ".join(f"{tag}t{j}x{rng.integers(10 ** 6)}"
                        for j in range(n))

    def stream(tag, n_chars):
        s = filler(tag, n_chars // 6 + 4).replace(" ", "_")
        return s[:n_chars]

    s100 = stream("B1", 100)
    s80 = stream("B2", 80)
    texts = {
        0: filler("d0a", 20) + "<" + s100 + ">" + filler("d0b", 20),
        1: filler("d1a", 20) + "{" + s100 + "}" + filler("d1b", 20),
        2: filler("d2a", 20) + "<" + s80 + ">" + filler("d2b", 20),
        3: filler("d3a", 20) + "{" + s80 + "}" + filler("d3b", 20),
    }
    tab = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tab, str(d / "documents.parquet"))

    from eridu_ray.pipelines.substring import substring_spans

    spans = substring_spans(str(d)).to_pandas()
    got = {(int(r.doc_id_a), int(r.doc_id_b)): int(r.span_len)
           for r in spans.itertuples()}
    assert got == {(0, 1): 100}, got


def test_winnow_only_signatures_identical():
    """The winnow-only signature mode (substring family fast path) must
    emit IDENTICAL winnow fingerprints and node ids to the full stage —
    span candidates may not shift with the layout optimization."""
    import pyarrow.parquet as pq2

    from eridu_ray.config import PipelineConfig
    from eridu_ray.sources.synth import expand_documents_batch
    from eridu_ray.stages.signatures import SignatureStage

    cfg = PipelineConfig(winnow_window=32)
    docs = pq2.read_table("/root/testdata/sf0.001/documents.parquet").slice(
        0, 80)
    pages = expand_documents_batch(docs, seed=cfg.seed)
    full = SignatureStage(cfg)(pages)
    slim = SignatureStage(cfg, winnow_only=True)(pages)
    assert slim["node_id"].equals(full["node_id"])
    assert slim["winnow"].equals(full["winnow"])
    assert slim["text"].equals(full["text"])
    # the emptiness gate agrees even though the counts differ in kind
    import pyarrow.compute as pc2
    assert pc2.equal(pc2.greater(slim["n_shingles"], 0),
                     pc2.greater(full["n_shingles"], 0)).to_pandas().all()


def test_substring_reduce_layout_identical(planted_docs):
    """The reduce layout (forced via verify_broadcast_max_bytes=0) must
    produce the same spans as the broadcast gate layout — the r5
    restructure gave the two branches different pair plumbing (raw
    pairs + gram gate + survivor distinct vs dedup+guard + text
    attach)."""
    import dataclasses

    from eridu_ray.pipelines.substring import (_substring_cfg,
                                               substring_spans)

    sf_dir, _, _ = planted_docs
    want = substring_spans(sf_dir).to_pandas().sort_values(
        ["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert len(want) > 0
    cfg_r = dataclasses.replace(_substring_cfg(),
                                verify_broadcast_max_bytes=0)
    got = substring_spans(sf_dir, cfg_r).to_pandas().sort_values(
        ["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert got.equals(want), (len(got), len(want))
