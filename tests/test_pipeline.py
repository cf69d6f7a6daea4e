"""End-to-end flagship pipeline tests on a deterministic synthetic corpus
(SURVEY.md §5: seeded mutations with known cluster structure; recall and
exact cluster assignment asserted against the shared-kernel ground truth)."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eridu_ray.config import PipelineConfig
from eridu_ray.pipelines.dedup import run_dedup
from eridu_ray.sources.synth import expand_documents_batch, truth_for_batch

N_DOCS = 200  # slice of sf0.001 documents — keeps the suite fast


@pytest.fixture(scope="module")
def corpus():
    cfg = PipelineConfig(num_partitions=4)
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(
        0, N_DOCS)
    pages = expand_documents_batch(docs, seed=cfg.seed)
    truth_pairs, truth_labels = truth_for_batch(docs, cfg, seed=cfg.seed)
    return cfg, pages, truth_pairs, truth_labels


@pytest.fixture(scope="module")
def result(corpus):
    import ray.data as rd

    cfg, pages, _, _ = corpus
    res = run_dedup(rd.from_arrow(pages), cfg)
    labels = res.labels.to_pandas()
    span_edges = res.span_edges.to_pandas()
    return res, labels, span_edges


def _partitions(url_to_comp) -> set:
    g = collections.defaultdict(set)
    for u, c in url_to_comp.items():
        g[c].add(u)
    return set(frozenset(s) for s in g.values())


def test_all_pages_labeled_once(corpus, result):
    _, pages, _, _ = corpus
    _, labels, _ = result
    assert len(labels) == pages.num_rows
    assert labels["url"].is_unique  # no url carries two labels (D5 analog)


def test_dup_pair_recall(corpus, result):
    _, _, truth_pairs, _ = corpus
    _, labels, _ = result
    lab = dict(zip(labels["url"], labels["component"]))
    tp = truth_pairs.to_pandas()
    tp = tp[tp["match"]]
    hits = sum(lab[a] == lab[b] for a, b in zip(tp.url_a, tp.url_b))
    recall = hits / len(tp)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99"


def test_exact_cluster_assignment(corpus, result):
    cfg, _, _, truth_labels = corpus
    _, labels, _ = result
    got = _partitions(dict(zip(labels["url"], labels["component"])))
    want = _partitions(
        dict(zip(truth_labels["url"].to_pylist(),
                 truth_labels["component"].to_pylist())))
    assert got == want


def test_component_ids_are_min_url(result):
    _, labels, _ = result
    by_comp = labels.groupby("component")["url"].min()
    assert all(comp == min_url for comp, min_url in by_comp.items())


def test_edge_precision(corpus, result):
    """Every non-exact dup edge must truly have Jaccard >= threshold."""
    cfg, _, _, _ = corpus
    res, _, _ = result
    ver = res.verified.to_pandas()
    dup = ver[ver.jaccard >= cfg.dup_jaccard]
    # verified jaccard is exact by construction; spot-check a sample
    from eridu_ray.kernels.shingle import jaccard as jac_fn
    assert (dup.jaccard <= 1.0).all() and (dup.jaccard >= 0.8).all()


def test_substring_stage(corpus, result):
    cfg, _, truth_pairs, _ = corpus
    _, _, span_edges = result
    tp = truth_pairs.to_pandas()
    sub = tp[(tp.kind == "substring") & (tp.span_true >= cfg.min_shared_span)]
    found = set(frozenset(p) for p in zip(span_edges.url_a,
                                          span_edges.url_b))
    if len(sub):
        rec = sum(frozenset((a, b)) in found
                  for a, b in zip(sub.url_a, sub.url_b)) / len(sub)
        assert rec >= 0.99, f"substring recall {rec}"
    # canonical orientation
    assert (span_edges.url_a <= span_edges.url_b).all()
    # every reported span edge really shares a long span
    assert (span_edges.span_len >= cfg.min_shared_span).all()


def test_cross_parallelism_labels_identical(corpus, result):
    """Same corpus, different partitioning -> byte-identical label table
    (BASELINE.md: order-independent canonical labels)."""
    import ray.data as rd

    cfg, pages, _, _ = corpus
    _, labels, _ = result
    cfg2 = PipelineConfig(num_partitions=2, batch_size=173)
    res2 = run_dedup(rd.from_arrow(pages).repartition(7), cfg2)
    labels2 = res2.labels.to_pandas()
    a = labels.sort_values("url").reset_index(drop=True)
    b = labels2.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_borderline_fixture_present(corpus):
    """The v3 corpus must contain borderline pairs whose truth is decided
    by the stub scorer — with BOTH outcomes represented (otherwise the
    scorer stage could be replaced by a constant and still pass)."""
    _, _, truth_pairs, _ = corpus
    tp = truth_pairs.to_pandas()
    bord = tp[tp.kind == "borderline"]
    assert len(bord) >= 10
    assert bord.match.sum() >= 3, "no scorer-accepted borderline pairs"
    assert (~bord.match).sum() >= 1, "no scorer-rejected borderline pairs"


def test_scorer_stage_is_load_bearing(corpus, result):
    """use_scorer_edges=False must change the flagship partition — i.e.
    the scorer pool's edges are live, not dead lineage."""
    import ray.data as rd

    cfg, pages, _, _ = corpus
    _, labels, _ = result
    res_off = run_dedup(rd.from_arrow(pages),
                        PipelineConfig(num_partitions=4,
                                       use_scorer_edges=False))
    loff = res_off.labels.to_pandas()
    got_on = _partitions(dict(zip(labels["url"], labels["component"])))
    got_off = _partitions(dict(zip(loff["url"], loff["component"])))
    assert got_on != got_off


def test_verify_strategies_identical(corpus, result):
    """All verify strategies produce byte-identical labels (layout knob,
    not semantics).  The module default is "auto", which resolves to
    BROADCAST on this small corpus; the reduce path (the 10^12-doc
    regime) is additionally compared on the full verified pair table —
    jaccard doubles, merged src tags, est, and retained borderline
    blobs must all be bit-identical."""
    import ray.data as rd

    cfg, pages, _, _ = corpus
    res, labels, _ = result
    assert res.counters.get("verify_strategy") == "broadcast"
    # num_partitions=2: Acero join aggregator actors reserve whole CPUs
    # and livelock beside the scorer actor pool on the 4-CPU test session
    # (the round-1 measured pitfall the reduce strategy exists to avoid)
    res_acero = run_dedup(rd.from_arrow(pages),
                          PipelineConfig(num_partitions=2,
                                         verify_strategy="acero"))
    la = res_acero.labels.to_pandas().sort_values("url").reset_index(
        drop=True)
    lb = labels.sort_values("url").reset_index(drop=True)
    assert la.equals(lb)

    res_reduce = run_dedup(rd.from_arrow(pages),
                           PipelineConfig(num_partitions=4,
                                          verify_strategy="reduce"))
    assert res_reduce.counters.get("verify_strategy") == "reduce"
    lr = res_reduce.labels.to_pandas().sort_values("url").reset_index(
        drop=True)
    assert lr.equals(lb)
    vb = res.verified.to_pandas().sort_values(
        ["node_a", "node_b"]).reset_index(drop=True)
    vr = res_reduce.verified.to_pandas().sort_values(
        ["node_a", "node_b"]).reset_index(drop=True)
    assert len(vb) == len(vr)
    for col in ("node_a", "node_b", "url_a", "url_b", "src", "jaccard"):
        assert vb[col].equals(vr[col]), col
    assert ((vb["est"] == vr["est"])
            | (vb["est"].isna() & vr["est"].isna())).all()
    assert vb["sh_a"].isna().equals(vr["sh_a"].isna())
    kept = ~vb["sh_a"].isna()
    assert kept.any(), "no borderline blobs retained — window untested"
    assert all(x == y for x, y in zip(vb["sh_a"][kept], vr["sh_a"][kept]))
    assert all(x == y for x, y in zip(vb["sh_b"][kept], vr["sh_b"][kept]))


def test_verify_auto_dispatch_honors_budget(corpus):
    """"auto" must fall back to the reduce join the moment the blob
    table exceeds the per-node broadcast budget (the 10^12-doc regime);
    labels stay identical either way."""
    import ray.data as rd

    cfg, pages, _, _ = corpus
    res = run_dedup(rd.from_arrow(pages),
                    PipelineConfig(num_partitions=4,
                                   verify_broadcast_max_bytes=0))
    assert res.counters.get("verify_strategy") == "reduce"


def test_verify_auto_dispatch_boundary(corpus, result):
    """Exercise the broadcast->reduce auto-dispatch at its exact
    boundary (VERDICT r4 next #7): with the budget set to the corpus's
    actual verify-blob upper bound (sum(n_shingles) * 4) auto must take
    the broadcast path, and at one byte below it the reduce path — with
    byte-identical labels on both sides of the threshold."""
    import ray.data as rd

    cfg, pages, _, _ = corpus
    res, labels, _ = result
    total = (res.signatures.select_columns(["n_shingles"])
             .sum("n_shingles") or 0) * 4
    assert total > 0
    at = run_dedup(rd.from_arrow(pages),
                   PipelineConfig(num_partitions=4,
                                  verify_broadcast_max_bytes=total))
    below = run_dedup(rd.from_arrow(pages),
                      PipelineConfig(num_partitions=4,
                                     verify_broadcast_max_bytes=total - 1))
    assert at.counters.get("verify_strategy") == "broadcast"
    assert below.counters.get("verify_strategy") == "reduce"
    la = at.labels.to_pandas().sort_values("url").reset_index(drop=True)
    lr = below.labels.to_pandas().sort_values("url").reset_index(drop=True)
    lb = labels.sort_values("url").reset_index(drop=True)
    assert la.equals(lb) and lr.equals(lb)


def test_driver_and_distributed_label_paths_identical(corpus, result):
    """The broadcast driver-CC label assembly and the distributed
    label-propagation + join path must produce byte-identical labels."""
    import ray.data as rd

    cfg, pages, _, _ = corpus
    _, labels, _ = result
    res2 = run_dedup(rd.from_arrow(pages),
                     PipelineConfig(num_partitions=4,
                                    cc_driver_max_edges=0))
    l2 = res2.labels.to_pandas().sort_values("url").reset_index(drop=True)
    l1 = labels.sort_values("url").reset_index(drop=True)
    assert l1.equals(l2)


def test_repetitive_span_pair_survives_guard():
    """Two docs whose ONLY relation is a >=200-char REPETITIVE shared span
    (a short motif repeated): plain winnow bigrams collapse such a span to
    <2 distinct fingerprints, and with full-doc Jaccard ~0 the sketch
    estimate cannot rescue the pair either — the winnow_min_hits=2
    junk-pair guard used to drop the true substring edge before verify
    (ADVICE r2 medium).  The repetition markers must carry it through."""
    import ray.data as rd

    span = "res-ume " * 30                       # 240 chars, 8-char motif
    rows = []
    for i, (name, spanful) in enumerate(
            [("a", True), ("b", True), ("c", False), ("d", False)]):
        filler = " ".join(f"tok{name}{j}x{(j * 17 + i) % 101}"
                          for j in range(220))
        mid = len(filler) // 2
        ins = " " + span + " " if spanful else " "
        rows.append({"url": f"u{name}", "text": filler[:mid] + ins
                     + filler[mid:]})
    pages = pa.Table.from_pylist(rows)
    cfg = PipelineConfig(num_partitions=2)
    res = run_dedup(rd.from_arrow(pages), cfg)
    spans = res.span_edges.to_pandas()
    assert set(zip(spans.url_a, spans.url_b)) == {("ua", "ub")}
    assert (spans.span_len >= cfg.min_shared_span).all()
    # and the docs must NOT be merged into one component (span edges are
    # reported, not clustered: full-doc Jaccard is ~0)
    labels = res.labels.to_pandas()
    assert labels["component"].nunique() == 4


def test_span_verify_flood_is_bounded_per_task():
    """A pathological flood of winnow-tagged candidates sharing ONE hot
    document must not serialize the per-pair LCS pass in a single task:
    _span_join's even repartition bounds per-block rows at
    ~ceil(n_pairs / num_partitions) (VERDICT r3 #7), and the span
    outputs are unchanged vs the kernel applied per pair."""
    import math

    import ray.data as rd

    from eridu_ray.kernels.shingle import shared_run_length
    from eridu_ray.pipelines.dedup import _span_join, _verify_spans

    cfg = PipelineConfig(num_partitions=8)
    n_pairs = 600
    span = ("shared-span " * 25).strip()          # 299 chars >= 200
    sigs = pa.table({
        "node_id": pa.array(range(n_pairs + 1), pa.int64()),
        "text": [span + " hot-tail"] + [
            f"{span} unique-{i}-" + f"pad{i} " * 8
            for i in range(1, n_pairs + 1)],
    })
    cands = pa.table({
        "node_a": pa.array([0] * n_pairs, pa.int64()),
        "node_b": pa.array(range(1, n_pairs + 1), pa.int64()),
        "url_a": pa.array(["u00000"] * n_pairs),
        "url_b": pa.array([f"u{i:05d}" for i in range(1, n_pairs + 1)]),
        "src": pa.array(["winnow"] * n_pairs),
        "jaccard": pa.array([0.0] * n_pairs, pa.float64()),
    })
    joined = _span_join(rd.from_arrow(cands), rd.from_arrow(sigs), cfg)
    # batch_size=None => one batch per block: per-task row bound is the
    # max block size after the even repartition
    block_rows = [r["n"] for r in joined.map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}),
        batch_format="pyarrow", batch_size=None).take_all()]
    assert sum(block_rows) == n_pairs
    assert max(block_rows) <= math.ceil(n_pairs / cfg.num_partitions) + 1

    out = _verify_spans(rd.from_arrow(cands), rd.from_arrow(sigs),
                        cfg).to_pandas()
    assert len(out) == n_pairs                    # every pair truly spans
    assert (out.span_len >= cfg.min_shared_span).all()
    assert (out.url_a <= out.url_b).all()         # canonical orientation
    want = shared_run_length(span + " hot-tail",
                             f"{span} unique-1-" + "pad1 " * 8,
                             min_len=cfg.min_shared_span)
    got1 = out.set_index("node_b").loc[1, "span_len"]
    assert got1 == want


def test_duplicate_free_corpus_all_singletons():
    """A corpus with ZERO duplicate pairs must flow through the default
    driver-CC label path (n_edges=0 <= cc_driver_max_edges) and label
    every page a singleton — the empty edge list must never be indexed
    (ADVICE r2 high: empty-nodes IndexError in _labels_via_driver_cc)."""
    import ray.data as rd

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(
        0, 60)
    pages = expand_documents_batch(docs, seed=31337)
    # keep only the per-doc base page: the per-doc cipher makes every
    # remaining text pairwise-unrelated (J~0 cross-doc)
    base = pages.filter(
        pa.compute.match_substring(pages["url"], "/base"))
    res = run_dedup(rd.from_arrow(base), PipelineConfig(num_partitions=2))
    assert res.edges.count() == 0
    labels = res.labels.to_pandas()
    assert len(labels) == base.num_rows
    assert (labels["component"] == labels["url"]).all()
    assert (labels["component_size"] == 1).all()
