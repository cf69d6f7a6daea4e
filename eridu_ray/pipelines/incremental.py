"""Incremental dedup: fold a NEW batch of pages into an existing dedup
state without re-verifying the prior corpus against itself.

The daily-crawl regime: a 100 TB corpus is deduped once, then increments
arrive.  A full rerun re-pays the verify joins (the blob-bandwidth-bound
stage) and the scorer pool over every prior-internal pair; incrementally,
those pairs are already summarized by the prior run's component
structure, so the only NEW information is pairs touching at least one
new document.

Semantics (provably equal to a full rerun, gated byte-identical in
tests/test_incremental.py):

1. signatures(new) computed fresh; prior signatures reused as-is
   (``run_dedup(signatures_override=prior ∪ new)``).
2. Candidate generation runs over the UNION — exact groups, LSH bands,
   SimHash chunks and winnow fingerprints must co-bucket old and new
   docs or cross-batch duplicates are missed.  Pair emission is
   therefore identical to the full run's.
3. Pairs whose BOTH endpoints are prior docs are dropped BEFORE verify
   (``skip_pairs_both_in``: one searchsorted per batch into a ray.put
   sorted id array).  Their components are re-injected as star edges
   derived from the prior labels (``extra_edges``): node(url) ↔
   node(component) for every non-singleton row — by construction these
   generate exactly the partition the dropped pairs' edges generated,
   so CC(star ∪ new-edges) == CC(old-edges ∪ new-edges).
4. CC + canonical min-url labels run as usual over all docs.

What this buys at scale: verify blob attachment, exact-Jaccard compute,
borderline scoring and span LCS all skip the O(prior²) pair set and pay
only O(prior × new + new²) — the increment's actual novelty.  The
signature side of verify and of the span text join is additionally
pruned to pair-TOUCHED nodes (every surviving pair touches ≥ 1 new
doc, so the touched set ∝ increment): the prior corpus's blobs stop
entering the verify exchange / broadcast index / span join every fold
(``run_dedup``'s ``verify_sigs``; inner joins for absent nodes matched
nothing, so labels are unchanged — gated in tests).

Two fold modes:

- **v1** (no ``state_dir``): the explode/bucket candidate shuffles still
  carry the prior reps' slim rows (ids + sketches, no blobs) every fold.
- **v2/v3** (``state_dir`` from :func:`build_incremental_state`): the
  prior reps' explode tables are persisted once, hive-partitioned by
  the same pid the candidate groupby uses AND sorted by bucket key
  within each partition; a fold shuffles only the NEW docs' explode
  rows and each pair task concatenates its pid's persisted partition
  map-side (``stages/candidates.make_stateful_pairs_fn``) — exchange
  cost ∝ increment.  v3 (``cfg.incremental_prune_state``, the default)
  additionally prunes the read to buckets a NEW key touches
  (``candidates.read_state_pruned``: key-column scan + row-group
  selection over the sorted partitions), so the per-fold read AND the
  pair-kernel input scale with the increment's bucket overlap, not the
  prior corpus.  Identity argument: an untouched bucket emits only
  prior-prior pairs, all of which ``skip_pairs_both_in`` drops before
  verify; touched buckets keep full union-run membership, so caps /
  salting / est-prefilter behave identically.  ``False`` restores the
  full-partition v2 read (same labels, more I/O).

State lifecycle across folds: :func:`save_fold_state` persists a
complete fold state (signatures + labels + explode tables + manifest)
and is O(corpus) — use it to create a state or to compact one.
:func:`append_fold_state` rolls a state forward after a fold in
O(increment): the fold's union-run NEW reps are exploded and APPENDED
as per-pid delta files (pruned per-file exactly like the originals),
the increment's signatures are appended, and only the slim label table
is rewritten (write-new-then-swap; a ``.append_pending`` sentinel
poisons a state left by an interrupted append).  A fold chain rolled
forward with appends reproduces from-scratch labels byte-identically
(tests/test_incremental.py).

Membership at scale: the prior node-id membership is scale-dispatched
on ``cfg.membership_broadcast_max_nodes`` — below it (8 B/doc, e.g.
1.6 GB at 200M priors) the sorted array ships ONCE per node via
ray.put and every membership check is a searchsorted; above it (the
10^12-prior regime, where the array would be ~8 TB) ``run_dedup``
receives the node-id DATASET and runs hash-partitioned semi/anti
joins instead (pair drop, new-row filter, touched-node prune), and
the url-clash check runs as a broadcast-filtered scan — nothing
O(prior) lands on the driver or any single worker.  Both paths are
byte-identical (forced-path gate in tests/test_incremental.py).

Fold checkpoint/resume: with ``cfg.checkpoint_dir`` set, a fold
commits its stages (fold_new_sigs / exact_tagged / verify_sigs /
verified / edges / labels) under a FOLD-IDENTITY fingerprint
(:func:`_fold_fingerprint`: prior state files + increment files +
persisted-state inventory + config hash) — a killed fold resumes from
the last committed stage with byte-identical labels
(tests/test_resume.py::test_fold_resume_reproduces_labels), and a
changed increment / appended state invalidates every stage checkpoint.

Remaining trade (both modes): appended delta files accumulate one
file set per fold; rebuild occasionally (CLI ``fold
--state-update-mode rebuild``) to compact.

New-batch urls must be disjoint from the prior corpus (node ids are
stable url hashes; a re-crawled url should be dropped or versioned
upstream, same as the reference's by-url identity, eridu/etl/
filter.py:51-54).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from eridu_ray.config import PipelineConfig
from eridu_ray.pipelines.dedup import (DedupResult, compute_signatures,
                                       run_dedup)

_ONE = np.uint64(1)


def prior_star_edges(labels, cfg: PipelineConfig):
    """Prior components as star edges: node(url) ↔ node(component url).

    One narrow map over the labels table; singletons (url == component)
    emit nothing.  Node ids are recomputed with the same seeded url hash
    the signature stage uses, so they join the new edge set exactly.
    """
    from eridu_ray.kernels.hashing import hash_strings_u64

    def f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b["url"], b["component"])))
        ua = t["url"].to_pylist()
        ub = t["component"].to_pylist()
        na = (hash_strings_u64(ua, seed=cfg.seed) >> _ONE).astype(np.int64)
        nb = (hash_strings_u64(ub, seed=cfg.seed) >> _ONE).astype(np.int64)
        return pa.table({
            "node_a": pa.array(na),
            "node_b": pa.array(nb),
            "url_a": pa.array(ua, pa.string()),
            "url_b": pa.array(ub, pa.string()),
            "src": pa.array(["prior"] * len(ua), pa.string()),
        })

    return labels.map_batches(f, batch_format="pyarrow")


def _collect_node_ids(signatures) -> np.ndarray:
    """Sorted int64 node ids of a signature table (8 B/doc artifact)."""
    parts = [b["node_id"].to_numpy(zero_copy_only=False)
             for b in signatures.select_columns(["node_id"]).iter_batches(
                 batch_format="pyarrow", batch_size=65536)]
    if not parts:
        return np.empty(0, np.int64)
    return np.sort(np.concatenate(parts))


def _write_family_explodes(sig_reps, cfg: PipelineConfig,
                           state_dir: str) -> None:
    """Explode a rep-signature table by each candidate family and write
    the rows hive-partitioned by the candidate groupby's pid, each
    partition file sorted by its bucket key (so v3's pruned reads —
    ``candidates.read_state_pruned`` — touch row groups proportional to
    a fold's bucket overlap).  ``write_parquet`` into an existing family
    dir APPENDS files with unique names, which is what
    :func:`append_fold_state` relies on: delta files are pruned per-file
    exactly like the originals."""
    from eridu_ray.stages import candidates as cand

    nb = cfg.bucket_partitions
    for family, exploder, key in (
            ("band", cand.BandExploder(cfg, with_url=False), "band_key"),
            ("simhash", cand.SimhashChunkExploder(cfg, with_url=False),
             "chunk_key"),
            ("winnow", cand.WinnowExploder(cfg, with_url=False),
             "fp_key")):
        rows = cand.add_pid(
            sig_reps.map_batches(lambda b, e=exploder: e(b),
                                 batch_format="pyarrow",
                                 batch_size=None), key, nb)
        rows = rows.groupby("pid").map_groups(
            lambda g, k=key: g.sort_by([("pid", "ascending"),
                                        (k, "ascending")]),
            batch_format="pyarrow")
        rows.write_parquet(f"{state_dir}/{family}",
                           partition_cols=["pid"])


def _write_exact_index(signatures, cfg: PipelineConfig,
                       state_dir: str) -> None:
    """Persist the exact-group index (incremental v4): one row per
    distinct ``(chash, chash2)`` of ``signatures`` — the group's rep
    (min node) + url — hive-partitioned by the exact stage's own
    pid(chash) and key-sorted per file for pruned reads.  Written from
    the prior corpus at state build and from just the increment at
    append time: every file carries the min over a disjoint member
    subset, so the read-side running-min merge
    (``candidates._min_rep_per_group``) reproduces the union-run rep."""
    from eridu_ray.stages import candidates as cand

    slim = signatures.select_columns(["chash", "chash2", "node_id", "url"])

    def reduce_group(g: pa.Table) -> pa.Table:
        t = cand.exact_groups_partition_fn(g)
        t = t.filter(t["is_rep"])
        return pa.table({
            "pid": t["pid"],
            "chash": t["chash"],
            "chash2": t["chash2"],
            "rep_node": t["node_id"],
            "rep_url": t["url"],
        }).sort_by([("pid", "ascending"), ("chash", "ascending")])

    (cand.add_pid(slim, "chash", cfg.bucket_partitions)
     .groupby("pid")
     .map_groups(reduce_group, batch_format="pyarrow")
     .write_parquet(f"{state_dir}/exact", partition_cols=["pid"]))


def build_incremental_state(prior: DedupResult, cfg: PipelineConfig,
                            state_dir: str) -> str:
    """Persist the prior corpus's per-family explode tables for v2 folds.

    One pass amortized across every subsequent fold: the prior reps
    (recomputed by the same deterministic exact stage) are exploded by
    each candidate family and written hive-partitioned by pid
    (``state_dir/{band,simhash,winnow}/pid=N/``), so a fold's pair
    tasks read exactly one local partition per family instead of
    re-shuffling the prior rows (see ``make_stateful_pairs_fn``).  On a
    cluster the dir must be shared storage.

    A ``manifest.json`` records the semantic ``config_hash`` (the
    explode rows' content depends on shingle/minhash/winnow params and
    the seed) AND ``bucket_partitions`` (normally a pure layout knob,
    but here the fold's groupby must land new rows on the SAME pid the
    state was partitioned by — a mismatch would silently drop prior
    rows from candidate buckets).  :func:`run_dedup_incremental`
    refuses a state whose manifest disagrees with the fold config.
    """
    import json
    import os

    from eridu_ray.stages import candidates as cand

    slim = prior.signatures.select_columns(
        ["chash", "chash2", "node_id", "url", "n_shingles",
         "minhash", "simhash", "winnow"])
    tagged = (cand.add_pid(slim, "chash", cfg.bucket_partitions)
              .groupby("pid")
              .map_groups(cand.exact_groups_partition_fn,
                          batch_format="pyarrow"))
    sig_reps = tagged.filter(
        expr="is_rep == True and n_shingles > 0").drop_columns(
        ["pid", "is_rep", "rep_node", "rep_url", "chash", "chash2",
         "n_shingles", "url"]).materialize()
    _write_family_explodes(sig_reps, cfg, state_dir)
    _write_exact_index(prior.signatures, cfg, state_dir)
    with open(os.path.join(state_dir, "manifest.json"), "w") as f:
        json.dump({"config_hash": cfg.config_hash(),
                   "bucket_partitions": cfg.bucket_partitions}, f)
    return state_dir


def _validate_state(state_dir: str, cfg: PipelineConfig) -> None:
    import json
    import os

    if os.path.exists(os.path.join(state_dir, _APPEND_SENTINEL)):
        raise ValueError(
            f"incremental state {state_dir!r} has an interrupted "
            "append_fold_state (sentinel present) — its labels/"
            "signatures/explodes may be mutually inconsistent; rebuild "
            "it with save_fold_state from a trusted DedupResult")
    path = os.path.join(state_dir, "manifest.json")
    if not os.path.isfile(path):
        raise ValueError(f"no manifest.json in state_dir {state_dir!r} "
                         "(not written by build_incremental_state?)")
    with open(path) as f:
        m = json.load(f)
    want = {"config_hash": cfg.config_hash(),
            "bucket_partitions": cfg.bucket_partitions}
    if m != want:
        raise ValueError(
            f"incremental state {state_dir!r} was built under a "
            f"different config: state {m} vs fold {want} — rebuild the "
            "state (a bucket_partitions mismatch would silently drop "
            "prior rows from candidate buckets)")


_APPEND_SENTINEL = ".append_pending"


def save_fold_state(prior: DedupResult, cfg: PipelineConfig,
                    state_dir: str) -> str:
    """Persist everything a future fold needs, so increments can be
    folded across processes/days: the prior signatures and labels
    (Parquet) plus the v2 explode tables + manifest
    (:func:`build_incremental_state`).  Rewrite it from a fold's result
    to roll the state forward to the new combined corpus — O(corpus);
    the O(increment) roll-forward is :func:`append_fold_state`.
    """
    build_incremental_state(prior, cfg, state_dir)
    prior.signatures.write_parquet(f"{state_dir}/signatures")
    prior.labels.write_parquet(f"{state_dir}/labels")
    return state_dir


def append_fold_state(fold: DedupResult, cfg: PipelineConfig,
                      state_dir: str) -> str:
    """Roll a fold state forward in O(increment) instead of rebuilding
    it over the combined corpus (:func:`save_fold_state`).

    Three appends, each proportional to the increment:

    1. **explode deltas** — the fold's ``state_new_reps`` (the union-run
       exact reps that are NEW docs: exactly the rows the fold's
       candidate shuffles carried) are exploded per family and written
       as NEW files under the existing ``state_dir/{family}/pid=N/``
       partitions, sorted by bucket key so v3's per-file pruned reads
       treat them like the originals.  Invariant preserved: the state
       holds the current union-run rep of every exact group (plus the
       already-documented harmless stale rows of demoted prior reps).
    2. **signatures append** — only the increment's signature rows
       (``new_signatures``) are added; prior docs' signatures are
       immutable.
    3. **labels rewrite** — prior docs' component ids CAN change when a
       fold merges clusters, so the slim (url, component, size) table is
       rewritten whole via write-new-then-swap.  It is the one
       O(corpus) term, but carries no sketch payload.

    Not atomic across the three steps: a ``.append_pending`` sentinel is
    held for the duration and any state carrying it is refused by every
    loader (``_validate_state``) — recover by rebuilding with
    :func:`save_fold_state` from a trusted fold result.  Delta files
    accumulate per fold; rebuild occasionally to compact (the CLI's
    ``fold --state-update-mode rebuild``).
    """
    import os
    import shutil

    _validate_state(state_dir, cfg)
    if fold.new_signatures is None or fold.state_new_reps is None:
        raise ValueError(
            "append_fold_state needs a DedupResult returned by "
            "run_dedup_incremental with state_dir set (new_signatures / "
            "state_new_reps are fold-only handles)")
    sentinel = os.path.join(state_dir, _APPEND_SENTINEL)
    with open(sentinel, "w") as f:
        f.write("append_fold_state in progress\n")
    # labels first: if we crash after the swap, signatures/explodes are
    # still day-N consistent for every doc the OLD label table covers,
    # and the sentinel refuses the state anyway until it is removed
    nxt = os.path.join(state_dir, "labels.next")
    shutil.rmtree(nxt, ignore_errors=True)
    fold.labels.write_parquet(nxt)
    cur = os.path.join(state_dir, "labels")
    old = os.path.join(state_dir, "labels.prev")
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(cur):
        os.rename(cur, old)
    os.rename(nxt, cur)
    shutil.rmtree(old, ignore_errors=True)
    fold.new_signatures.write_parquet(f"{state_dir}/signatures")
    _write_family_explodes(fold.state_new_reps, cfg, state_dir)
    if os.path.isdir(os.path.join(state_dir, "exact")):
        # exact-index delta: the increment's per-group min rows; the
        # read-side running-min merge yields the combined-corpus rep
        _write_exact_index(fold.new_signatures, cfg, state_dir)
    os.remove(sentinel)
    return state_dir


def compact_fold_state(cfg: PipelineConfig, state_dir: str) -> dict:
    """Merge each state partition's accumulated append-delta files into
    one key-sorted file — O(state) I/O, NO signature recompute (contrast
    :func:`save_fold_state`'s O(corpus) rebuild, which re-runs the exact
    stage and all three exploders over the full corpus).

    Why: :func:`append_fold_state` adds one file set per fold, and
    ``read_state_pruned`` scans the key column of EVERY file in a
    partition — after many folds the per-fold key-scan cost creeps from
    O(state) toward O(state × folds).  Compaction restores one sorted
    file per partition, so row-group pruning is maximally effective
    again.  The exact index additionally drops superseded rep rows
    (the running-min merge of ``candidates._min_rep_per_group`` applied
    at rest), shrinking it back to one row per live exact group.

    Execution shape: a flat Ray task fan-out — one task per pid
    partition (``from_items`` over partition dirs, no shuffle; each
    task reads its own files, sorts, writes one replacement file).
    Crash safety: the same ``.append_pending`` sentinel protocol as
    append — a compaction that dies mid-way leaves the sentinel and
    every loader refuses the state (rebuild to recover).  Single-pid
    partitions that are already one file are skipped.

    Returns per-family ``{files_before, files_after, rows}`` counters.
    """
    import glob
    import os
    import uuid

    import pyarrow.parquet as pq
    import ray.data as rd

    from eridu_ray.stages.candidates import _min_rep_per_group

    _validate_state(state_dir, cfg)

    jobs = []
    for family, key in (("band", "band_key"), ("simhash", "chunk_key"),
                        ("winnow", "fp_key"), ("exact", "chash")):
        fam_dir = os.path.join(state_dir, family)
        if not os.path.isdir(fam_dir):
            continue
        for pid_dir in sorted(glob.glob(os.path.join(fam_dir, "pid=*"))):
            n_files = len(glob.glob(os.path.join(pid_dir, "*.parquet")))
            # a 1-file exact partition may still hold superseded rep
            # rows from the build/append split — always re-merge exact
            if n_files > 1 or (family == "exact" and n_files == 1):
                jobs.append({"dir": pid_dir, "key": key,
                             "family": family, "files": n_files})
    stats = {f: {"files_before": 0, "files_after": 0, "rows": 0}
             for f in ("band", "simhash", "winnow", "exact")}
    if not jobs:
        return stats

    sentinel = os.path.join(state_dir, _APPEND_SENTINEL)
    with open(sentinel, "w") as f:
        f.write("compact_fold_state in progress\n")

    def compact_one(b: pa.Table) -> pa.Table:
        out = []
        for row in b.to_pylist():
            d, key, family = row["dir"], row["key"], row["family"]
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            tab = pa.concat_tables([pq.read_table(fp) for fp in files])
            if family == "exact":
                tab = _min_rep_per_group(tab)
            tab = tab.sort_by([(key, "ascending")])
            nxt = os.path.join(d, f"compact-{uuid.uuid4().hex}.parquet")
            pq.write_table(tab, nxt)
            for fp in files:  # new file is durable before olds vanish
                os.remove(fp)
            out.append({"family": family, "files_before": len(files),
                        "rows": tab.num_rows})
        return pa.Table.from_pylist(out) if out else pa.table(
            {"family": pa.array([], pa.string()),
             "files_before": pa.array([], pa.int64()),
             "rows": pa.array([], pa.int64())})

    # one TASK per pid dir would be launch-overhead-bound on small
    # states (4 families × bucket_partitions dirs of a few KB each);
    # pack dirs into at most 4×num_partitions blocks — each task loops
    # its dirs sequentially, and on a real cluster the block count
    # (not dirs-per-block) is the concurrency, so big states still fan
    # out as wide as every other shuffle stage
    n_blocks = max(1, min(len(jobs), 4 * cfg.num_partitions))
    res = (rd.from_items(jobs, override_num_blocks=n_blocks)
           .map_batches(compact_one, batch_format="pyarrow",
                        batch_size=max(1, -(-len(jobs) // n_blocks))))
    for b in res.iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            s = stats[row["family"]]
            s["files_before"] += row["files_before"]
            s["files_after"] += 1
            s["rows"] += row["rows"]
    os.remove(sentinel)
    return stats


def load_fold_state(state_dir: str, cfg: PipelineConfig) -> DedupResult:
    """Load a :func:`save_fold_state` dir as the ``prior`` of a fold.

    Validates the manifest against ``cfg`` (semantic config hash +
    bucket alignment); ``verified``/``edges``/``span_edges`` are not
    part of the fold contract and come back as None.
    """
    import ray.data as rd

    _validate_state(state_dir, cfg)
    return DedupResult(
        signatures=rd.read_parquet(f"{state_dir}/signatures"),
        verified=None, edges=None, span_edges=None,
        labels=rd.read_parquet(f"{state_dir}/labels"))


def _fold_fingerprint(new_pages, prior: DedupResult,
                      state_dir: str | None,
                      cfg: PipelineConfig) -> str:
    """Identity of a FOLD for checkpoint validity: the composed input
    has no single source-file list, so the fingerprint covers every
    ingredient that determines the fold's results — prior signature /
    label files, increment files, the persisted-state file inventory
    (an append between attempts must invalidate), and the semantic
    config hash.  In-memory inputs contribute empty file lists (same
    degradation as run_dedup's plain-input fingerprint: config hash
    alone then guards)."""
    import glob
    import hashlib
    import json
    import os

    def files_of(ds):
        try:
            return sorted(ds.input_files())
        except Exception:
            return []

    parts = {
        "config": cfg.config_hash(),
        "prior_sigs": files_of(prior.signatures),
        "prior_labels": files_of(prior.labels),
        "new": files_of(new_pages),
        "state": sorted(
            (os.path.relpath(p, state_dir), os.path.getsize(p))
            for p in glob.glob(os.path.join(state_dir, "**", "*"),
                               recursive=True)
            if os.path.isfile(p)) if state_dir else [],
    }
    return "fold-" + hashlib.sha256(
        json.dumps(parts, sort_keys=True).encode()).hexdigest()[:16]


def run_dedup_incremental(new_pages, prior: DedupResult,
                          cfg: PipelineConfig | None = None,
                          state_dir: str | None = None) -> DedupResult:
    """Dedup ``new_pages`` against (and within) a prior :class:`DedupResult`.

    Returns a full DedupResult over prior ∪ new docs whose ``labels``
    are byte-identical to a from-scratch ``run_dedup`` over the combined
    corpus (see module docstring for the argument and
    tests/test_incremental.py for the gate).

    With ``state_dir`` (written by :func:`build_incremental_state`) the
    v2 path runs: only NEW docs' explode rows enter the candidate
    shuffles, prior rows are read map-side from the persisted per-pid
    partitions — fold exchange cost becomes proportional to the
    increment, not the corpus.  A demoted prior rep (a new doc wins its
    exact group) keeps its state rows; the resulting extra pairs verify
    to jaccard 1.0 against content-identical docs already connected by
    the exact star edge, so the component partition — and therefore the
    labels — stay byte-identical (gated in tests).
    """
    import ray

    from eridu_ray.pipelines.dedup import _in_sorted

    cfg = cfg or PipelineConfig()
    if state_dir is not None:
        _validate_state(state_dir, cfg)
    fold_fp = None
    if cfg.checkpoint_dir is not None:
        # fold checkpoint/resume (VERDICT r4 next #4): the fold identity
        # fingerprint validates every stage checkpoint; the increment's
        # signatures get their own stage so a resumed fold skips the
        # signature compute too
        from eridu_ray.state.checkpoint import CheckpointManager

        fold_fp = _fold_fingerprint(new_pages, prior, state_dir, cfg)
        fold_ckpt = CheckpointManager(cfg.checkpoint_dir,
                                      cfg.config_hash(),
                                      input_fingerprint=fold_fp)
        new_sigs = fold_ckpt.stage(
            "fold_new_sigs", lambda: compute_signatures(new_pages, cfg),
            lineage={"input": "fold increment"})
    else:
        new_sigs = compute_signatures(new_pages, cfg).materialize()
    new_ids = _collect_node_ids(new_sigs)  # ∝ increment, always small
    n_prior = prior.signatures.count()
    if n_prior <= cfg.membership_broadcast_max_nodes:
        prior_ids = _collect_node_ids(prior.signatures)
        # enforce the documented contract instead of silently emitting
        # two label rows per re-crawled url: node ids are stable url
        # hashes, so one searchsorted over the (already-collected)
        # prior ids finds any collision
        clash = np.intersect1d(new_ids, prior_ids, assume_unique=False)
        if clash.size:
            raise ValueError(
                f"{clash.size} new-batch url(s) already exist in the "
                "prior corpus (first colliding node ids: "
                f"{clash[:5].tolist()}) — re-crawled urls must be "
                "dropped or versioned upstream (module docstring)")
        membership = prior_ids
    else:
        # prior corpus above the membership broadcast budget: hand the
        # node-id DATASET to run_dedup (which runs the semi/anti-join
        # membership paths) and run the clash check distributed — the
        # NEW ids (∝ increment) broadcast once, one filtered scan over
        # the prior ids, nothing O(prior) on the driver
        membership = prior.signatures.select_columns(["node_id"])
        new_ref = ray.put(np.sort(new_ids))

        def _in_new(b: pa.Table) -> pa.Table:
            nn = ray.get(new_ref)
            keep = _in_sorted(nn, b["node_id"].to_numpy(
                zero_copy_only=False))
            return b if bool(keep.all()) else b.filter(pa.array(keep))

        clash_ds = membership.map_batches(
            _in_new, batch_format="pyarrow").materialize()
        n_clash = clash_ds.count()
        if n_clash:
            first = [r["node_id"] for r in clash_ds.take(5)]
            raise ValueError(
                f"{n_clash} new-batch url(s) already exist in the "
                f"prior corpus (first colliding node ids: {first}) — "
                "re-crawled urls must be dropped or versioned upstream "
                "(module docstring)")
    all_sigs = prior.signatures.union(new_sigs).materialize()
    res = run_dedup(
        None, cfg,
        signatures_override=all_sigs,
        skip_pairs_both_in=membership,
        extra_edges=prior_star_edges(prior.labels, cfg),
        candidate_state_dir=state_dir,
        input_fingerprint_override=fold_fp)
    # fold-only handle for append_fold_state: the increment's own
    # signature rows (∝ increment; already materialized above)
    res.new_signatures = new_sigs
    return res
