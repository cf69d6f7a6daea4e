"""Incremental-dedup equivalence gate (pipelines/incremental.py):
folding one half of the corpus into a prior run over the other half
must reproduce the from-scratch labels byte-identically — duplicate
clusters deliberately straddle the prior/new split so cross-batch
candidate generation, the both-prior pair filter, and the prior star
edges are all load-bearing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.hashing import hash_strings_u64
from eridu_ray.pipelines.dedup import run_dedup
from eridu_ray.pipelines.incremental import (build_incremental_state,
                                             prior_star_edges,
                                             run_dedup_incremental)
from eridu_ray.sources.synth import expand_documents_batch

N_DOCS = 200


@pytest.fixture(scope="module")
def split_corpus():
    cfg = PipelineConfig(num_partitions=4)
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(
        0, N_DOCS)
    pages = expand_documents_batch(docs, seed=cfg.seed)
    # split by url hash: variants of one source doc scatter across
    # prior/new, so most duplicate pairs cross the batch boundary —
    # the hard case the incremental path must not miss
    h = hash_strings_u64(pages["url"].to_pylist(), seed=7)
    mask = (h % np.uint64(2)).astype(bool)
    prior_pages = pages.filter(pa.array(~mask))
    new_pages = pages.filter(pa.array(mask))
    assert prior_pages.num_rows > 0 and new_pages.num_rows > 0
    return cfg, pages, prior_pages, new_pages


def test_incremental_labels_match_full_rerun(split_corpus):
    import ray.data as rd

    cfg, pages, prior_pages, new_pages = split_corpus
    full = run_dedup(rd.from_arrow(pages), cfg).labels.to_pandas()
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    inc = run_dedup_incremental(
        rd.from_arrow(new_pages), prior, cfg).labels.to_pandas()
    assert len(inc) == pages.num_rows
    a = full.sort_values("url").reset_index(drop=True)
    b = inc.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_incremental_join_membership_matches_full_rerun(split_corpus):
    """Forced join-membership path (membership_broadcast_max_nodes=0
    pushes the prior corpus 'above budget'): the semi/anti-join
    membership — pair drop, touched-node prune, distributed clash
    check — must reproduce the from-scratch labels byte-identically
    (VERDICT r4 missing #4 / next #3)."""
    import dataclasses

    import ray.data as rd

    cfg, pages, prior_pages, new_pages = split_corpus
    cfg_j = dataclasses.replace(cfg, membership_broadcast_max_nodes=0)
    full = run_dedup(rd.from_arrow(pages), cfg).labels.to_pandas()
    prior = run_dedup(rd.from_arrow(prior_pages), cfg_j)
    res = run_dedup_incremental(rd.from_arrow(new_pages), prior, cfg_j)
    assert res.counters.get("membership_mode") == "join"
    inc = res.labels.to_pandas()
    a = full.sort_values("url").reset_index(drop=True)
    b = inc.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_incremental_join_membership_rejects_recrawled(split_corpus):
    """The distributed clash check (join-membership regime) enforces
    the disjoint-url contract exactly like the probe path."""
    import dataclasses

    import ray.data as rd

    cfg, pages, prior_pages, new_pages = split_corpus
    cfg_j = dataclasses.replace(cfg, membership_broadcast_max_nodes=0)
    prior = run_dedup(rd.from_arrow(prior_pages), cfg_j)
    with pytest.raises(ValueError, match="already exist in the prior"):
        run_dedup_incremental(rd.from_arrow(prior_pages), prior, cfg_j)


@pytest.mark.parametrize("prune", [True, False],
                         ids=["v3-pruned", "v2-full-read"])
def test_incremental_state_path_matches_full_rerun(split_corpus,
                                                   tmp_path, prune):
    """v2 (persisted explode state, new-rows-only candidate shuffles)
    and v3 (key-pruned state reads) must both reproduce the
    from-scratch labels byte-identically — including across demoted
    prior reps (a new doc winning an exact group is common under the
    url-hash split)."""
    import dataclasses

    import ray.data as rd

    cfg, pages, prior_pages, new_pages = split_corpus
    cfg = dataclasses.replace(cfg, incremental_prune_state=prune)
    full = run_dedup(rd.from_arrow(pages), cfg).labels.to_pandas()
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    state = build_incremental_state(prior, cfg, str(tmp_path / "state"))
    inc = run_dedup_incremental(
        rd.from_arrow(new_pages), prior, cfg,
        state_dir=state).labels.to_pandas()
    a = full.sort_values("url").reset_index(drop=True)
    b = inc.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_read_state_pruned_exact_bucket_membership(tmp_path):
    """read_state_pruned keeps EVERY row of a touched bucket key and NO
    row of an untouched one, across row-group boundaries."""
    import pyarrow.parquet as pq_mod

    from eridu_ray.stages.candidates import read_state_pruned

    # 3 buckets of 4 rows each, sorted by key, split into tiny row
    # groups so pruning must reassemble across group boundaries
    keys = np.repeat(np.array([10, 20, 30], np.uint64), 4)
    t = pa.table({
        "band_key": pa.array(keys),
        "node_id": pa.array(np.arange(12, dtype=np.int64)),
        "sketch": pa.array([b"s%d" % i for i in range(12)], pa.binary())})
    d = tmp_path / "pid=0"
    d.mkdir()
    pq_mod.write_table(t, str(d / "part.parquet"), row_group_size=3)
    got = read_state_pruned(str(d), ["band_key", "node_id", "sketch"],
                            "band_key",
                            np.array([20, 999], np.uint64))
    assert got is not None
    assert got["band_key"].to_pylist() == [20] * 4
    assert got["node_id"].to_pylist() == [4, 5, 6, 7]
    # no touched key -> nothing read
    assert read_state_pruned(str(d), ["band_key"], "band_key",
                             np.array([999], np.uint64)) is None
    # empty new-key set -> nothing read
    assert read_state_pruned(str(d), ["band_key"], "band_key",
                             np.array([], np.uint64)) is None


def test_incremental_v2_rejects_mismatched_state(split_corpus, tmp_path):
    """A state built under a different bucket_partitions (or semantic
    config) must be refused — a pid mismatch would silently drop prior
    rows from candidate buckets instead of erroring."""
    import dataclasses

    import ray.data as rd

    cfg, pages, prior_pages, new_pages = split_corpus
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    state = build_incremental_state(prior, cfg, str(tmp_path / "s"))
    other_layout = dataclasses.replace(
        cfg, bucket_partitions=cfg.bucket_partitions * 2)
    with pytest.raises(ValueError, match="different config"):
        run_dedup_incremental(rd.from_arrow(new_pages), prior,
                              other_layout, state_dir=state)
    other_semantic = dataclasses.replace(cfg, seed=cfg.seed + 1)
    with pytest.raises(ValueError, match="different config"):
        run_dedup_incremental(rd.from_arrow(new_pages), prior,
                              other_semantic, state_dir=state)
    with pytest.raises(ValueError, match="manifest"):
        run_dedup_incremental(rd.from_arrow(new_pages), prior, cfg,
                              state_dir=str(tmp_path / "nowhere"))


def test_fold_state_roundtrip_across_processes(split_corpus, tmp_path):
    """save_fold_state → load_fold_state → fold must reproduce the
    from-scratch labels byte-identically (the cross-day/cross-process
    contract the CLI `fold` command relies on), including the parquet
    roundtrip of the signature blobs."""
    import ray.data as rd

    from eridu_ray.pipelines.incremental import (load_fold_state,
                                                 save_fold_state)

    cfg, pages, prior_pages, new_pages = split_corpus
    full = run_dedup(rd.from_arrow(pages), cfg).labels.to_pandas()
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    state = save_fold_state(prior, cfg, str(tmp_path / "state"))
    loaded = load_fold_state(state, cfg)
    inc = run_dedup_incremental(
        rd.from_arrow(new_pages), loaded, cfg,
        state_dir=state).labels.to_pandas()
    a = full.sort_values("url").reset_index(drop=True)
    b = inc.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_fold_without_exact_index_falls_back(split_corpus, tmp_path):
    """A state built before the v4 exact-group index existed (no
    ``exact/`` dir) must still fold via the union exact shuffle, with
    identical labels — backward compatibility of persisted states."""
    import shutil

    import ray.data as rd

    from eridu_ray.pipelines.incremental import (load_fold_state,
                                                 save_fold_state)

    cfg, pages, prior_pages, new_pages = split_corpus
    full = run_dedup(rd.from_arrow(pages), cfg).labels.to_pandas()
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    state = save_fold_state(prior, cfg, str(tmp_path / "state"))
    shutil.rmtree(tmp_path / "state" / "exact")
    res = run_dedup_incremental(rd.from_arrow(new_pages),
                                load_fold_state(state, cfg), cfg,
                                state_dir=state)
    assert res.counters["exact_path"] == "union"
    a = full.sort_values("url").reset_index(drop=True)
    b = res.labels.to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_append_fold_state_chain_matches_full_rerun(split_corpus,
                                                    tmp_path):
    """Two consecutive folds rolled forward with the O(increment)
    append_fold_state must reproduce the from-scratch labels over the
    3-day combined corpus byte-identically — the daily-crawl loop the
    CLI `fold --update-state` (append mode) runs."""
    import ray.data as rd

    from eridu_ray.pipelines.incremental import (append_fold_state,
                                                 load_fold_state,
                                                 save_fold_state)

    cfg, pages, _, _ = split_corpus
    # 3-way split by url hash: day-1 base, day-2 and day-3 increments;
    # duplicate clusters straddle all three days
    h = hash_strings_u64(pages["url"].to_pylist(), seed=7)
    parts = [pages.filter(pa.array(h % np.uint64(3) == np.uint64(i)))
             for i in range(3)]
    assert all(p.num_rows > 0 for p in parts)
    full = run_dedup(rd.from_arrow(pages), cfg).labels.to_pandas()

    day1 = run_dedup(rd.from_arrow(parts[0]), cfg)
    state = save_fold_state(day1, cfg, str(tmp_path / "state"))
    n_sigs_day1 = pq.read_table(f"{state}/signatures").num_rows
    assert n_sigs_day1 == parts[0].num_rows

    fold2 = run_dedup_incremental(rd.from_arrow(parts[1]),
                                  load_fold_state(state, cfg), cfg,
                                  state_dir=state)
    fold2.labels.count()
    append_fold_state(fold2, cfg, state)
    # signatures grew by exactly the increment; labels cover both days
    assert (pq.read_table(f"{state}/signatures").num_rows
            == parts[0].num_rows + parts[1].num_rows)
    assert (pq.read_table(f"{state}/labels").num_rows
            == parts[0].num_rows + parts[1].num_rows)

    fold3 = run_dedup_incremental(rd.from_arrow(parts[2]),
                                  load_fold_state(state, cfg), cfg,
                                  state_dir=state)
    got = fold3.labels.to_pandas()
    a = full.sort_values("url").reset_index(drop=True)
    b = got.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # and the chain can keep rolling: append day 3 too, then reload
    append_fold_state(fold3, cfg, state)
    assert (pq.read_table(f"{state}/labels").num_rows
            == pages.num_rows)
    reloaded = load_fold_state(state, cfg)
    assert reloaded.signatures.count() == pages.num_rows


def test_compact_fold_state_preserves_labels(split_corpus, tmp_path):
    """append → compact → next fold reproduces the from-scratch labels;
    every compacted partition collapses to ONE key-sorted file (so v3's
    per-file key scans stop growing with fold count) and the exact
    index sheds superseded rep rows — all without the O(corpus)
    rebuild (no signature recompute)."""
    import glob
    import os

    import ray.data as rd

    from eridu_ray.pipelines.incremental import (append_fold_state,
                                                 compact_fold_state,
                                                 load_fold_state,
                                                 save_fold_state)

    cfg, pages, _, _ = split_corpus
    h = hash_strings_u64(pages["url"].to_pylist(), seed=7)
    parts = [pages.filter(pa.array(h % np.uint64(3) == np.uint64(i)))
             for i in range(3)]
    full = run_dedup(rd.from_arrow(pages), cfg).labels.to_pandas()

    day1 = run_dedup(rd.from_arrow(parts[0]), cfg)
    state = save_fold_state(day1, cfg, str(tmp_path / "state"))
    fold2 = run_dedup_incremental(rd.from_arrow(parts[1]),
                                  load_fold_state(state, cfg), cfg,
                                  state_dir=state)
    fold2.labels.count()
    append_fold_state(fold2, cfg, state)

    multi = [d for d in glob.glob(f"{state}/*/pid=*")
             if len(glob.glob(os.path.join(d, "*.parquet"))) > 1]
    assert multi, "append should have left delta files to compact"
    n_exact_before = pq.read_table(f"{state}/exact").num_rows

    stats = compact_fold_state(cfg, state)
    assert sum(s["files_before"] for s in stats.values()) > \
        sum(s["files_after"] for s in stats.values())
    for d in glob.glob(f"{state}/*/pid=*"):
        if os.path.basename(os.path.dirname(d)) in (
                "band", "simhash", "winnow", "exact"):
            assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    # running-min merge applied at rest: one row per live exact group
    exact = pq.read_table(f"{state}/exact")
    keys = list(zip(exact["chash"].to_pylist(),
                    exact["chash2"].to_pylist()))
    assert len(keys) == len(set(keys))
    assert exact.num_rows <= n_exact_before

    fold3 = run_dedup_incremental(rd.from_arrow(parts[2]),
                                  load_fold_state(state, cfg), cfg,
                                  state_dir=state)
    assert fold3.counters["exact_path"] == "state"
    a = full.sort_values("url").reset_index(drop=True)
    b = fold3.labels.to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_append_fold_state_guards(split_corpus, tmp_path):
    """append_fold_state refuses a non-fold DedupResult, and an
    interrupted append (sentinel on disk) poisons the state for every
    loader until it is rebuilt."""
    import ray.data as rd

    from eridu_ray.pipelines.incremental import (_APPEND_SENTINEL,
                                                 append_fold_state,
                                                 load_fold_state,
                                                 save_fold_state)

    cfg, _, prior_pages, new_pages = split_corpus
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    state = save_fold_state(prior, cfg, str(tmp_path / "state"))
    with pytest.raises(ValueError, match="fold-only"):
        append_fold_state(prior, cfg, state)  # not a fold result
    (tmp_path / "state" / _APPEND_SENTINEL).write_text("boom")
    with pytest.raises(ValueError, match="interrupted"):
        load_fold_state(state, cfg)
    with pytest.raises(ValueError, match="interrupted"):
        run_dedup_incremental(rd.from_arrow(new_pages), prior, cfg,
                              state_dir=state)


def test_incremental_rejects_recrawled_urls(split_corpus):
    """A new batch sharing urls with the prior corpus must be refused —
    node ids are url hashes, so a silent collision would emit two label
    rows per url with undefined component assignment."""
    import ray.data as rd

    cfg, pages, prior_pages, new_pages = split_corpus
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    overlapping = pa.concat_tables([new_pages, prior_pages.slice(0, 3)])
    with pytest.raises(ValueError, match="already exist in the prior"):
        run_dedup_incremental(rd.from_arrow(overlapping), prior, cfg)


def test_prior_star_edges_shape(split_corpus):
    """Star edges: one edge per non-singleton labels row, node ids equal
    the signature stage's seeded url hashes, singletons emit nothing."""
    import ray.data as rd

    cfg, _, prior_pages, _ = split_corpus
    prior = run_dedup(rd.from_arrow(prior_pages), cfg)
    lab = prior.labels.to_pandas()
    stars = prior_star_edges(prior.labels, cfg).to_pandas()
    n_clustered_rows = int((lab["url"] != lab["component"]).sum())
    assert len(stars) == n_clustered_rows
    assert set(stars["src"]) <= {"prior"}
    if len(stars):
        want = (hash_strings_u64(stars["url_a"].tolist(), seed=cfg.seed)
                >> np.uint64(1)).astype(np.int64)
        assert (stars["node_a"].to_numpy() == want).all()
