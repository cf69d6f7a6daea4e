"""Flagship near-duplicate detection + clustering pipeline (SURVEY.md §7.1).

    pages ─ map_batches(SignatureStage) ─► signatures          [checkpoint]
      slim(keys+LSH cols) ─ groupby(pid(chash)) ─► exact star edges
                                                   + representatives
      reps ─ BandExploder    ─ groupby(pid(band_key)) ─► minhash cands
      reps ─ SimhashExploder ─ groupby(pid(chunk))    ─► simhash cands
      reps ─ WinnowExploder  ─ groupby(pid(fp_key))   ─► span cands
        (each bucket carries a byte sketch; pairs below the borderline
         estimate die at emission — the verify-traffic prefilter)
      ∪ cands ─ groupby(pid(a,b)) dedup ─ verify            [checkpoint]
        (scale-dispatched: blob index broadcast once + fused dedup/Jaccard
         in the pair-pid groupby while the blob table fits the per-node
         budget; reduce-side verify join ×2 — blob ships once per node —
         above it)
      dup edges (J >= t) ∪ exact edges ∪ scorer edges ─► edges [checkpoint]
        (borderline J ∈ [lo, t) pairs scored by the actor-pool scorer)
      span candidates (J < t) ─ join text ×2 ─ LCS ─► span_edges
      edges ─ label propagation to fixpoint ─► labels          [checkpoint]
      labels ∪ singletons ─ relabel by min url ─► components

Every stage is a Dataset transform; the driver holds only config, manifests
and small aggregates.  All shuffles are keyed on int64 hashes; buckets are
hashed into cfg.bucket_partitions pids with vectorized run detection
inside each pid group (per-group Python overhead amortized), and skewed
buckets are capped with the star fallback (candidates.py; the
pair-emitting text_dedup ops use triangle salting instead).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from eridu_ray.config import PipelineConfig
from eridu_ray.stages import candidates as cand
from eridu_ray.stages.components import (connected_components_auto,
                                          relabel_by_min_url)
from eridu_ray.stages.scorer import PairScorer
from eridu_ray.stages.signatures import SignatureStage
from eridu_ray.stages.verify import (attach_shingles, jaccard_batch,
                                     verify_pairs_broadcast,
                                     verify_pairs_reduce)
from eridu_ray.state.checkpoint import CheckpointManager


@dataclass
class DedupResult:
    signatures: "ray.data.Dataset"
    verified: "ray.data.Dataset"       # candidate pairs + exact jaccard
    edges: "ray.data.Dataset"          # (node_a, node_b, url_a, url_b, src)
    span_edges: "ray.data.Dataset"     # long-shared-span pairs
    labels: "ray.data.Dataset"         # (url, component, component_size)
    counters: dict = field(default_factory=dict)
    # fold-only handles (pipelines/incremental.py append_fold_state):
    # the increment's own signature rows, and the union-run exact reps
    # that are NEW docs (exactly the rows the fold's candidate shuffles
    # carried) — both ∝ increment, None outside the v2/v3 fold path
    new_signatures: "ray.data.Dataset | None" = None
    state_new_reps: "ray.data.Dataset | None" = None


def compute_signatures(pages, cfg: PipelineConfig):
    # bound instance in a closure: stateless elastic tasks (the per-task
    # state — 128 minhash params — is tiny; the heavyweight actor pool is
    # reserved for the model-bearing scorer stage)
    stage = SignatureStage(cfg)
    return pages.map_batches(
        lambda b: stage(b),
        batch_format="pyarrow", batch_size=cfg.batch_size)


def run_dedup(pages, cfg: PipelineConfig | None = None,
              use_scorer_edges: bool | None = None, *,
              signatures_override=None, skip_pairs_both_in=None,
              extra_edges=None, candidate_state_dir=None,
              input_fingerprint_override=None) -> DedupResult:
    """Public entry: ``_run_dedup_inner`` under the executor-allocator
    scope.  ``cfg.disable_op_reservation`` (default True) turns off Ray
    Data's per-operator object-store reservation for the pipeline's
    execution — the allocator livelocks the chained all-to-all verify
    DAG once several barrier queues hold GBs at once (measured at 633k
    fat pages; BASELINE.md "executor reservation livelock").  The
    caller's context setting is restored on return.  Every heavy stage
    INCLUDING the final labels materializes inside this scope (with
    ``checkpoint_dir`` set the checkpoint writes are the
    materialization); the one exception is ``span_edges``, which stays
    lazy because many callers never consume it — a caller that does
    executes it under its OWN DataContext (ADVICE r4; the CLI ``dedup``
    command and bench.py consume inside scopes of their own)."""
    cfg = cfg or PipelineConfig()
    if not cfg.disable_op_reservation:
        return _run_dedup_inner(
            pages, cfg, use_scorer_edges,
            signatures_override=signatures_override,
            skip_pairs_both_in=skip_pairs_both_in,
            extra_edges=extra_edges,
            candidate_state_dir=candidate_state_dir,
            input_fingerprint_override=input_fingerprint_override)
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    prev = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = False
    try:
        return _run_dedup_inner(
            pages, cfg, use_scorer_edges,
            signatures_override=signatures_override,
            skip_pairs_both_in=skip_pairs_both_in,
            extra_edges=extra_edges,
            candidate_state_dir=candidate_state_dir,
            input_fingerprint_override=input_fingerprint_override)
    finally:
        ctx.op_resource_reservation_enabled = prev


def _run_dedup_inner(pages, cfg: PipelineConfig | None = None,
                     use_scorer_edges: bool | None = None, *,
                     signatures_override=None, skip_pairs_both_in=None,
                     extra_edges=None, candidate_state_dir=None,
                     input_fingerprint_override=None
                     ) -> DedupResult:
    """Run the full pipeline on a pages Dataset (url/warc_ts/html/text/lang).

    With ``cfg.checkpoint_dir`` set, signatures / verified / edges / labels
    are committed as Parquet checkpoints and a rerun resumes from the last
    completed stage (identical results — see tests/test_resume.py).

    ``use_scorer_edges`` defaults to ``cfg.use_scorer_edges`` (ON: the
    borderline scorer pool is part of the flagship edge set, reference
    semantics eridu/train/utils.py:153-235).  Passing an override here
    rebinds the config — the flag is semantic and participates in
    ``config_hash()``, so checkpoints written under one setting are never
    silently resumed under the other.

    The keyword-only hooks exist for :func:`run_dedup_incremental`
    (pipelines/incremental.py):
    ``signatures_override`` replaces the signature stage (``pages`` may
    then be None), ``skip_pairs_both_in`` (sorted int64 node ids, or a
    node_id Dataset for the join-membership regime) drops candidate
    pairs whose BOTH endpoints are listed before any blob is attached
    or scored, ``extra_edges`` unions a pre-existing edge set
    (prior-component star edges) into the CC input, and
    ``candidate_state_dir`` (requires ``skip_pairs_both_in``) switches
    the three explode branches to NEW-doc rows only, concatenating the
    prior corpus's persisted explode partitions map-side inside each
    pid task (incremental v2; pipelines/incremental.py).

    Checkpointing WITH hooks (fold checkpoint/resume, VERDICT r4 next
    #4): the default ``_input_fingerprint(pages)`` has no meaning for a
    composed signature input, so hook callers that also set
    ``cfg.checkpoint_dir`` MUST pass ``input_fingerprint_override`` —
    a fingerprint of the fold identity (prior state files, increment
    files, config hash; see incremental._fold_fingerprint).  A killed
    fold then resumes from the last committed stage (verify_sigs /
    verified / edges / labels) with byte-identical labels
    (tests/test_resume.py::test_fold_resume_reproduces_labels).
    """
    import time as _time

    from dataclasses import replace as _dc_replace

    cfg = cfg or PipelineConfig()
    if use_scorer_edges is not None and \
            use_scorer_edges != cfg.use_scorer_edges:
        cfg = _dc_replace(cfg, use_scorer_edges=use_scorer_edges)
    if (signatures_override is not None or skip_pairs_both_in is not None
            or extra_edges is not None):
        assert (cfg.checkpoint_dir is None
                or input_fingerprint_override), \
            "incremental hooks need input_fingerprint_override to " \
            "checkpoint (the stage-lineage fingerprint has no meaning " \
            "for a composed input; run_dedup_incremental provides one)"
    ckpt = CheckpointManager(
        cfg.checkpoint_dir, cfg.config_hash(),
        input_fingerprint=(
            input_fingerprint_override
            or (_input_fingerprint(pages)
                if pages is not None else "signatures-override")))
    _t = _time.perf_counter()

    def _mark(name: str) -> None:
        nonlocal _t
        now = _time.perf_counter()
        ckpt.counters[f"sec.{name}"] = round(now - _t, 3)
        _t = now

    if signatures_override is not None:
        signatures = signatures_override
    else:
        signatures = ckpt.stage(
            "signatures", lambda: compute_signatures(pages, cfg),
            lineage={"input": "pages"})
    if cfg.checkpoint_dir is None:
        signatures = signatures.materialize()
    _mark("signatures")

    # --- exact dedup + representative selection (one shuffle) ------------
    # slim projection: the exact shuffle and the candidate branches need
    # keys + LSH columns only — text and shingle blobs (the heavy ~2/3 of
    # the signature table) stay out of this shuffle and of the three
    # explode branches (they re-enter only in the verify/span stages,
    # which read `signatures` directly)
    slim = signatures.select_columns(
        ["chash", "chash2", "node_id", "url", "n_shingles",
         "minhash", "simhash", "winnow"])

    _old_ref = None
    _prior_ids_ds = None
    membership_mode = None
    state_new_reps = None
    if skip_pairs_both_in is not None:
        import ray as _ray

        # membership dispatch (VERDICT r4 missing #4): an ndarray input
        # — or a node-id DATASET small enough to collect — becomes the
        # ray.put sorted-probe (one searchsorted per batch, array ships
        # once per node).  A Dataset larger than the broadcast budget
        # (the 10^12-prior-doc regime: ~8 TB of ids) switches every
        # membership use to hash-partitioned semi/anti joins on node_id
        # — no O(prior) driver or per-node artifact anywhere.  Paths
        # are byte-identical (forced-path gate,
        # tests/test_incremental.py).
        if hasattr(skip_pairs_both_in, "join"):  # Ray Dataset of node_id
            n_prior = skip_pairs_both_in.count()
            if n_prior <= cfg.membership_broadcast_max_nodes:
                parts = [b["node_id"].to_numpy(zero_copy_only=False)
                         for b in skip_pairs_both_in.select_columns(
                             ["node_id"]).iter_batches(
                             batch_format="pyarrow", batch_size=None)]
                arr = (np.concatenate(parts) if parts
                       else np.empty(0, np.int64))
                _old_ref = _ray.put(np.ascontiguousarray(
                    np.sort(arr.astype(np.int64, copy=False))))
                membership_mode = "probe"
            else:
                _prior_ids_ds = skip_pairs_both_in.select_columns(
                    ["node_id"]).materialize()
                membership_mode = "join"
        else:
            _old_ref = _ray.put(np.ascontiguousarray(
                np.sort(np.asarray(skip_pairs_both_in, dtype=np.int64))))
            membership_mode = "probe"
        ckpt.counters["membership_mode"] = membership_mode

    def _filter_new(ds):
        """Rows of ``ds`` (node_id column) that are NOT prior docs."""
        if membership_mode == "join":
            # groupby-based anti join (_semi_join_ids): the filtered
            # tables carry minhash/winnow list<> columns, which Acero
            # hash joins reject as non-key fields
            return _semi_join_ids(ds, _prior_ids_ds, cfg,
                                  keep_matches=False)

        def f(b: pa.Table) -> pa.Table:
            import ray as _ray

            old = _ray.get(_old_ref)
            keep = ~_in_sorted(old, b["node_id"].to_numpy(
                zero_copy_only=False))
            return b if bool(keep.all()) else b.filter(pa.array(keep))

        return ds.map_batches(f, batch_format="pyarrow")

    # incremental v4: with a persisted exact-group index in the state,
    # the exact shuffle carries only the increment's slim rows — prior
    # groups re-enter map-side as one synthetic rep row per TOUCHED
    # chash (candidates.make_stateful_exact_fn).  Prior-internal exact
    # edges are not re-emitted (their connectivity is carried by the
    # prior star edges); labels stay byte-identical (gated).  States
    # built before the index existed fall back to the union shuffle.
    import os as _os
    use_exact_state = (
        candidate_state_dir is not None and membership_mode is not None
        and _os.path.isdir(_os.path.join(candidate_state_dir, "exact")))
    ckpt.counters["exact_path"] = ("state" if use_exact_state else "union")
    if use_exact_state:
        slim_exact = _filter_new(slim)
        exact_fn = cand.make_stateful_exact_fn(
            candidate_state_dir, prune=cfg.incremental_prune_state)
    else:
        slim_exact = slim
        exact_fn = cand.exact_groups_partition_fn
    tagged = (cand.add_pid(slim_exact, "chash", cfg.bucket_partitions)
              .groupby("pid")
              .map_groups(exact_fn,
                          batch_format="pyarrow"))
    if cfg.checkpoint_dir is None:
        tagged = tagged.materialize()
    else:
        tagged = ckpt.stage("exact_tagged", lambda: tagged)
    _mark("exact_groups")
    exact_edges = (tagged.filter(expr="is_rep == False")
                   .map_batches(_exact_edge_batch, batch_format="pyarrow"))

    # --- candidate generation (three bucketed paths over reps) -----------
    # Three separate explode+groupby branches: the streaming executor
    # overlaps them, which measured FASTER than the fused single-shuffle
    # variant (candidates.FusedBucketExploder): 129s vs ~200s at sf0.1 —
    # concurrency across smaller shuffles beats one big barrier here.
    # one slim materialized rep table feeds all three branches (instead
    # of three filter passes over tagged)
    # urls stay OFF the candidate path entirely (explode rows and pair
    # rows ship ids only; verify re-attaches urls once per node from the
    # signature table) — explode rows outnumber docs ~200:1 (winnow) so
    # a repeated url string per row dominated that shuffle's payload
    sig_reps = tagged.filter(
        expr="is_rep == True and n_shingles > 0").drop_columns(
        ["pid", "is_rep", "rep_node", "rep_url", "chash", "chash2",
         "n_shingles", "url"])
    if cfg.checkpoint_dir is None:
        sig_reps = sig_reps.materialize()

    if candidate_state_dir is not None:
        # incremental v2: prior reps' explode rows come from the
        # persisted per-pid state inside each group task — only NEW
        # docs' rows enter the three explode shuffles (with the v4
        # exact index, synthetic prior rep rows are also dropped here:
        # n_shingles == 0 already excludes them, this keeps the
        # invariant explicit and covers blob-bearing prior reps when
        # falling back to the union exact shuffle)
        assert membership_mode is not None, \
            "candidate_state_dir requires skip_pairs_both_in"

        # materialized: ∝ increment, feeds the three explode branches
        # AND append_fold_state (the O(increment) state roll-forward)
        sig_reps = _filter_new(sig_reps).materialize()
        state_new_reps = sig_reps
    band_explode = cand.BandExploder(cfg, with_url=False)
    sim_explode = cand.SimhashChunkExploder(cfg, with_url=False)
    win_explode = cand.WinnowExploder(cfg, with_url=False)
    # MinHash-estimate prefilter: sketches are co-located in every bucket,
    # so hopeless pairs (estimate << borderline) die at emission and never
    # reach the shingle-blob verify joins — the round-1 measured bandwidth
    # bottleneck (BASELINE.md).  Winnow/span candidates are exempt (their
    # whole point is low-Jaccard long-shared-span pairs).
    est_min = cfg.borderline_jaccard - cfg.prefilter_margin
    # bucket keys are hashed into cfg.bucket_partitions pids; equal-key
    # runs are detected vectorized inside each pid group, so per-group
    # Python overhead is paid ~128 times instead of once per bucket
    # (measured 3-4x on the candidate stage — most buckets are singletons)
    nb = cfg.bucket_partitions
    # pair_pid_buckets: the cross-branch dedup pid is emitted at pair
    # creation, so the three-way union feeds its groupby directly — no
    # separate add_pair_pid pass over the pre-dedup pair rows (the
    # largest intermediate; VERDICT r3 #8 free fusion)
    fn_min = cand.make_partition_pairs_fn(
        "band_key", cfg.band_group_cap, "minhash", est_min=est_min,
        pair_pid_buckets=nb)
    fn_sim = cand.make_partition_pairs_fn(
        "chunk_key", cfg.band_group_cap, "simhash", est_min=est_min,
        with_simhash=True, max_hamming=cfg.simhash_max_hamming,
        pair_pid_buckets=nb)
    fn_win = cand.make_partition_pairs_fn(
        "fp_key", cfg.winnow_group_cap, "winnow", pair_pid_buckets=nb)
    if candidate_state_dir is not None:
        _prune = cfg.incremental_prune_state
        fn_min = cand.make_stateful_pairs_fn(
            candidate_state_dir, "band", fn_min, "band_key",
            prune=_prune)
        fn_sim = cand.make_stateful_pairs_fn(
            candidate_state_dir, "simhash", fn_sim, "chunk_key",
            with_simhash=True, prune=_prune)
        fn_win = cand.make_stateful_pairs_fn(
            candidate_state_dir, "winnow", fn_win, "fp_key",
            prune=_prune)
    minhash_cands = (cand.add_pid(
        sig_reps.map_batches(lambda b: band_explode(b),
                             batch_format="pyarrow",
                             batch_size=None), "band_key", nb)
        .groupby("pid")
        .map_groups(fn_min, batch_format="pyarrow"))
    simhash_cands = (cand.add_pid(
        sig_reps.map_batches(lambda b: sim_explode(b),
                             batch_format="pyarrow",
                             batch_size=None), "chunk_key", nb)
        .groupby("pid")
        .map_groups(fn_sim, batch_format="pyarrow"))
    winnow_cands = (cand.add_pid(
        sig_reps.map_batches(lambda b: win_explode(b),
                             batch_format="pyarrow",
                             batch_size=None), "fp_key", nb)
        .groupby("pid")
        .map_groups(fn_win, batch_format="pyarrow"))

    raw_cands = minhash_cands.union(simhash_cands).union(winnow_cands)

    if membership_mode == "probe":
        # incremental regime: pairs internal to the PRIOR corpus are
        # already encoded by its component structure (extra_edges) —
        # drop them BEFORE any shingle blob is attached or any scorer
        # runs.  Membership is one searchsorted into a ray.put sorted
        # id array (8 B/prior-doc, shipped once per node); pair rows
        # themselves are slim int64s so the pre-filter shuffle cost of
        # the dropped pairs is the v1 trade documented in
        # pipelines/incremental.py (the v2 state path only emits them
        # for prior-only key runs inside buckets a new doc touches).
        def _drop_both_prior(b: pa.Table) -> pa.Table:
            old = _ray.get(_old_ref)
            keep = ~(_in_sorted(old, b["node_a"].to_numpy(
                zero_copy_only=False))
                     & _in_sorted(old, b["node_b"].to_numpy(
                         zero_copy_only=False)))
            return b if bool(keep.all()) else b.filter(pa.array(keep))

        raw_cands = raw_cands.map_batches(_drop_both_prior,
                                          batch_format="pyarrow")
    elif membership_mode == "join":
        # join regime (prior corpus above the membership broadcast
        # budget): keep a pair iff >= 1 endpoint is NOT prior.  Three
        # slim-int64 semi/anti joins whose union is exactly that set,
        # disjointly: (a ∉ prior) ∪ (a ∈ prior ∧ b ∉ prior) — no
        # marker-column bookkeeping, left rows pass through unchanged.
        a_new = raw_cands.join(
            _prior_ids_ds, join_type="left_anti",
            num_partitions=cfg.num_partitions,
            on=("node_a",), right_on=("node_id",))
        a_old = raw_cands.join(
            _prior_ids_ds, join_type="left_semi",
            num_partitions=cfg.num_partitions,
            on=("node_a",), right_on=("node_id",))
        b_new = a_old.join(
            _prior_ids_ds, join_type="left_anti",
            num_partitions=cfg.num_partitions,
            on=("node_b",), right_on=("node_id",))
        raw_cands = a_new.union(b_new)

    # deferred materialization: in the fold regime the filtered pair
    # set is shared by the verify builder AND the touched-node prune,
    # so the first CONSUMER materializes it — never eager DAG-definition
    # time.  This is what lets a checkpointed fold resume skip the
    # candidate shuffles entirely: when verify_sigs/verified/edges/
    # labels all load from checkpoints, get_raw_cands() is never called.
    _rc_cache = []

    def get_raw_cands():
        if not _rc_cache:
            _rc_cache.append(raw_cands.materialize()
                             if membership_mode is not None else raw_cands)
        return _rc_cache[0]

    # fold regime: every surviving pair touches >= 1 new doc, so the
    # node set appearing in pairs is ∝ increment — prune the signature
    # side of verify AND the span-stage text join to exactly those
    # nodes.  Inner joins / blob lookups for absent nodes matched
    # nothing anyway, so results are byte-identical (gated in
    # tests/test_incremental.py); what changes is that the verify blob
    # exchange (reduce path), the broadcast blob index, and the span
    # text join stop carrying the prior corpus's blobs every fold.
    # The touched-id array is collected driver-side (2 int64 cols over
    # increment-scale pair rows — bounded like skip_pairs_both_in; at
    # corpus scales beyond driver heap this becomes a semi-join on
    # node_id, same trade documented for the membership array).
    if membership_mode is None:
        verify_sigs = signatures
    else:
        def build_verify_sigs():
            if membership_mode == "probe":
                touched = _collect_pair_nodes(get_raw_cands())
                ckpt.counters["n_touched_nodes"] = int(touched.size)
                _touched_ref = _ray.put(touched)

                def _keep_touched(b: pa.Table) -> pa.Table:
                    t = _ray.get(_touched_ref)
                    keep = _in_sorted(t, b["node_id"].to_numpy(
                        zero_copy_only=False))
                    return (b if bool(keep.all())
                            else b.filter(pa.array(keep)))

                return signatures.map_batches(
                    _keep_touched, batch_format="pyarrow")

            # distributed twin of the touched-node prune: distinct pair
            # endpoints (slim int64 groupby, ∝ increment since every
            # surviving pair touches >= 1 new doc) semi-join the
            # signature table — no driver collection of the touched set
            def _endpoints(b: pa.Table) -> pa.Table:
                na = b["node_a"].to_numpy(zero_copy_only=False)
                nb_ = b["node_b"].to_numpy(zero_copy_only=False)
                return pa.table({"node_id": pa.array(
                    np.unique(np.concatenate([na, nb_])))})

            touched_ds = (get_raw_cands()
                          .map_batches(_endpoints, batch_format="pyarrow")
                          .groupby("node_id").count()
                          .select_columns(["node_id"]))
            return _semi_join_ids(signatures, touched_ds, cfg,
                                  keep_matches=True)

        verify_sigs = ckpt.stage("verify_sigs", build_verify_sigs)
        if cfg.checkpoint_dir is None:
            verify_sigs = verify_sigs.materialize()

    # --- exact-Jaccard verification (join strategy per cfg) --------------
    def build_verified():
        strategy = cfg.verify_strategy
        if strategy == "auto":
            # dispatch on an upper bound of the verify-blob bytes
            # (4 B/element; n_shingles >= len(32-bit verify set)): one
            # narrow-column scan over the materialized signature table.
            # Below the per-node broadcast budget the blob index ships
            # once via ray.put and verify needs ZERO shuffles; above it
            # (the 10^12-doc regime) the reduce join runs as before.
            total = verify_sigs.select_columns(
                ["n_shingles"]).sum("n_shingles") or 0
            strategy = ("broadcast"
                        if total * 4 <= cfg.verify_broadcast_max_bytes
                        else "reduce")
        ckpt.counters["verify_strategy"] = strategy
        if strategy == "broadcast":
            return verify_pairs_broadcast(
                get_raw_cands(), verify_sigs, cfg,
                keep_lo=cfg.borderline_jaccard, keep_hi=cfg.dup_jaccard,
                dedup_winnow_min_hits=cfg.winnow_min_hits,
                dedup_winnow_est_min=cfg.winnow_est_min)
        if strategy == "reduce":
            # cross-band pair dedup FUSED into verify pass 1 (node_a
            # groups co-locate every copy of a pair) — the standalone
            # pair-pid sort over the pre-dedup pair set (the flagship's
            # largest intermediate) disappears from the DAG
            return verify_pairs_reduce(
                get_raw_cands(), verify_sigs, cfg,
                keep_lo=cfg.borderline_jaccard, keep_hi=cfg.dup_jaccard,
                dedup_winnow_min_hits=cfg.winnow_min_hits,
                dedup_winnow_est_min=cfg.winnow_est_min)
        all_cands = (get_raw_cands()
            .groupby("pid")
            .map_groups(cand.make_dedup_pairs_partition_fn(
                winnow_min_hits=cfg.winnow_min_hits,
                winnow_est_min=cfg.winnow_est_min),
                batch_format="pyarrow"))
        with_sets = attach_shingles(all_cands, verify_sigs, cfg,
                                    attach_urls=True)
        return with_sets.map_batches(
            jaccard_batch, batch_format="pyarrow",
            batch_size=cfg.batch_size,
            fn_kwargs={"keep_lo": cfg.borderline_jaccard,
                       "keep_hi": cfg.dup_jaccard})

    verified = ckpt.stage("verified", build_verified)
    if cfg.checkpoint_dir is None:
        verified = verified.materialize()
    _mark("candidates_verify")

    dup_pairs = verified.filter(
        expr=f"jaccard >= {cfg.dup_jaccard}").select_columns(
        ["node_a", "node_b", "url_a", "url_b", "src"])

    # --- borderline refinement (actor-pool scorer) ------------------------
    # borderline rows already carry their shingle blobs (jaccard_batch
    # keep window) — the scorer pool consumes them join-free
    borderline = verified.filter(
        expr=f"jaccard >= {cfg.borderline_jaccard} and "
             f"jaccard < {cfg.dup_jaccard}")
    scored = borderline.map_batches(
        PairScorer, fn_constructor_args=(cfg,),
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency)
    scorer_edges = scored.filter(
        expr=f"similarity >= {cfg.scorer_threshold}").select_columns(
        ["node_a", "node_b", "url_a", "url_b", "src"])

    edge_parts = [exact_edges, dup_pairs]
    if cfg.use_scorer_edges:
        edge_parts.append(scorer_edges)
    if extra_edges is not None:
        edge_parts.append(extra_edges)
    edges_all = edge_parts[0]
    for p in edge_parts[1:]:
        edges_all = edges_all.union(p)
    edges = ckpt.stage("edges", lambda: edges_all)
    if cfg.checkpoint_dir is None:
        edges = edges.materialize()
    _mark("edges")

    # --- substring (long-shared-span) stage -------------------------------
    # only winnow-tagged sub-threshold candidates can share a long span
    # (the winnowing guarantee); filter BEFORE the text join
    span_cands = (verified.filter(expr=f"jaccard < {cfg.dup_jaccard}")
                  .map_batches(_keep_winnow_src, batch_format="pyarrow"))
    span_edges = _verify_spans(span_cands, verify_sigs, cfg)

    # --- connected components + canonical labels -------------------------
    def build_labels():
        n_edges = edges.count()
        if n_edges <= cfg.cc_driver_max_edges:
            # driver union-find regime: the edge list (true duplicates
            # only) is tiny next to the corpus, and every clustered node
            # appears in >= 1 edge — so component membership, canonical
            # min url and size all compute driver-side and broadcast as
            # ONE lookup into a single map_batches pass.  This replaces
            # a left-outer join consumed three times + the relabel
            # groupby/join (measured: a 9.4s all-join tail -> ~1s).
            return _labels_via_driver_cc(edges, signatures, cfg)
        cc = connected_components_auto(
            edges.select_columns(["node_a", "node_b"]), cfg,
            n_edges=n_edges)
        nodes = signatures.select_columns(["url", "node_id"])
        joined = nodes.join(cc, join_type="left_outer",
                            num_partitions=cfg.num_partitions,
                            on=("node_id",), right_on=("node",))
        if cfg.checkpoint_dir is None:
            joined = joined.materialize()  # consumed by three branches
        clustered = joined.filter(expr="is_valid(label)")
        singles = (joined.map_batches(_keep_null_label,
                                      batch_format="pyarrow")
                   .map_batches(_singleton_label_batch,
                                batch_format="pyarrow"))
        relabeled = relabel_by_min_url(
            clustered.select_columns(["url", "label"]), cfg)
        return relabeled.union(singles)

    labels = ckpt.stage("labels", build_labels)
    if cfg.checkpoint_dir is None:
        # materialize INSIDE the reservation scope: labels in the
        # distributed-CC regime are a full-corpus left-outer join +
        # relabel groupby — deferring them to caller consumption would
        # run those all-to-alls under the caller's allocator context,
        # silently outside the livelock fix (ADVICE r4)
        labels = labels.materialize()
    _mark("components")

    ckpt.write_counters()
    return DedupResult(signatures=signatures, verified=verified,
                       edges=edges, span_edges=span_edges, labels=labels,
                       counters=dict(ckpt.counters),
                       state_new_reps=state_new_reps)


def _input_fingerprint(pages) -> str:
    """Stable fingerprint of the input identity for checkpoint validity.

    Source files when the dataset has them (the normal read_parquet path);
    empty otherwise (in-memory fixtures — config hash alone then guards,
    as before).  Row counts are recorded per stage at checkpoint-save time.
    """
    import hashlib
    import json

    try:
        files = sorted(pages.input_files())
    except Exception:
        files = []
    if not files:
        return ""
    return hashlib.sha256(
        json.dumps(files).encode()).hexdigest()[:16]


def _collect_pair_nodes(pairs) -> np.ndarray:
    """Sorted distinct int64 node ids appearing in a slim pair table."""
    parts = []
    for b in pairs.select_columns(["node_a", "node_b"]).iter_batches(
            batch_format="pyarrow", batch_size=262144):
        parts.append(np.unique(np.concatenate([
            b["node_a"].to_numpy(zero_copy_only=False),
            b["node_b"].to_numpy(zero_copy_only=False)])))
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized membership of vals in a sorted int64 array."""
    if sorted_arr.size == 0:
        return np.zeros(vals.size, dtype=bool)
    idx = np.clip(np.searchsorted(sorted_arr, vals), 0,
                  sorted_arr.size - 1)
    return sorted_arr[idx] == vals


def _semi_join_ids(ds, ids_ds, cfg, keep_matches: bool):
    """Distributed semi (``keep_matches``) / anti join of ``ds`` on
    ``node_id`` against an id-only Dataset, for tables whose payload
    includes list<> columns — Acero hash joins reject those as non-key
    fields, so this runs the engine's own pattern instead: both sides
    tag pid(node_id), union under an aligned schema (probe rows carry
    nulls for the payload columns), and ONE sort-shuffle groupby
    co-locates each id bucket with its rows; the filter is a per-group
    sorted-probe.  Used by the join-membership regime (prior corpus
    above ``membership_broadcast_max_nodes``) where nothing O(prior)
    may land on the driver or a single worker."""
    from eridu_ray.stages import candidates as cand

    base = ds.schema().base_schema
    flag = "__is_probe"

    def mark(b: pa.Table) -> pa.Table:
        return b.append_column(
            flag, pa.array(np.zeros(b.num_rows, np.bool_)))

    def expand(b: pa.Table) -> pa.Table:
        cols = {}
        for f in base:
            cols[f.name] = (pc.cast(b["node_id"], f.type)
                            if f.name == "node_id"
                            else pa.nulls(b.num_rows, f.type))
        return pa.table(cols).append_column(
            flag, pa.array(np.ones(b.num_rows, np.bool_)))

    both = ds.map_batches(mark, batch_format="pyarrow").union(
        ids_ds.map_batches(expand, batch_format="pyarrow"))

    def filt(g: pa.Table) -> pa.Table:
        isp = g[flag].to_numpy(zero_copy_only=False)
        probe = np.sort(g["node_id"].to_numpy(
            zero_copy_only=False)[isp])
        rows = g.filter(pa.array(~isp))
        hit = _in_sorted(probe, rows["node_id"].to_numpy(
            zero_copy_only=False))
        keep = hit if keep_matches else ~hit
        return rows.filter(pa.array(keep)).drop_columns([flag, "pid"])

    return (cand.add_pid(both, "node_id", cfg.bucket_partitions)
            .groupby("pid")
            .map_groups(filt, batch_format="pyarrow"))


def _exact_edge_batch(batch: pa.Table) -> pa.Table:
    return pa.table({
        "node_a": batch["rep_node"],
        "node_b": batch["node_id"],
        "url_a": batch["rep_url"],
        "url_b": batch["url"],
        "src": pa.array(["exact"] * batch.num_rows, pa.string()),
    })


def _keep_winnow_src(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.match_substring(batch["src"], "winnow"))


def _keep_null_label(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.is_null(batch["label"]))


def _singleton_label_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table({
        "url": batch["url"],
        "component": batch["url"],
        "component_size": pa.array([1] * n, pa.int64()),
    })


def _span_join(span_cands, signatures, cfg: PipelineConfig):
    """Texts attached onto sub-threshold winnow candidates, evenly split.

    The attach is the join-free union + pid-groupby pattern
    (verify.attach_texts): span candidates arrive from a groupby, whose
    empty partitions emit schema-less 0-column blocks that crash Ray's
    hash-shuffle JoinOperator ("No match ... for key field node_b") —
    sort/groupby tolerate them.  Also drops two JoinOperators from the
    flagship DAG.

    The signature side is pruned to span-touched nodes first (a bounded
    driver artifact — the candidate set is junk-guard-bounded — hitting
    a 5M-node budget before falling back to the full narrow table):
    without the prune the attach's two pid-groupby sorts ship every
    doc's text, measured +4.6 s on the 158k-page 32-CPU flagship vs the
    old hash joins; pruned, they ship only the span docs.

    The trailing even repartition bounds per-task rows of the (per-pair
    Python) LCS stage at ceil(n_pairs / num_partitions): the attach
    groups by node pid, so a pathological flood of winnow-tagged
    pairs sharing one hot document would otherwise land in ONE
    output block and serialize the whole LCS pass in a single task
    (VERDICT r3 #7).  The span-candidate set is junk-guard-bounded, so
    the split is cheap relative to the attach shuffles."""
    from eridu_ray.stages.verify import attach_texts, prune_to_pair_nodes

    sub = span_cands.select_columns(
        ["node_a", "node_b", "url_a", "url_b", "src", "jaccard"]
    ).materialize()
    texts, _ = prune_to_pair_nodes(
        sub, signatures.select_columns(["node_id", "text"]), cfg,
        max_nodes=5_000_000)
    joined = attach_texts(sub, texts, cfg)
    return joined.repartition(cfg.num_partitions)


def _verify_spans(span_cands, signatures, cfg: PipelineConfig):
    """Join texts for sub-threshold winnow candidates, verify LCS length.

    The verifier kernel is strategy-dispatched (cfg.span_strategy):
    "hash" = rolling-hash binary search (default — length only, faster);
    "sa" = generalized suffix array (collision-free; the same kernel
    substring-cut uses for offsets).  Identical span_len either way
    (asserted in tests/test_pipeline.py)."""
    joined = _span_join(span_cands, signatures, cfg)

    min_span = cfg.min_shared_span
    use_sa = cfg.span_strategy == "sa"

    def lcs_batch(batch: pa.Table) -> pa.Table:
        from eridu_ray.kernels.shingle import shared_run_length
        from eridu_ray.kernels.suffix import pair_longest_span

        def span_len(x: str, y: str) -> int:
            if use_sa:
                return pair_longest_span(x, y, min_len=min_span)[0]
            return shared_run_length(x, y, min_len=min_span)

        srcs = batch["src"].to_pylist()
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        spans = [span_len(x, y) if "winnow" in s else 0
                 for s, x, y in zip(srcs, ta, tb)]
        # canonical orientation: url_a < url_b (FIXTURES.md F2)
        ua = batch["url_a"].to_pylist()
        ub = batch["url_b"].to_pylist()
        na = batch["node_a"].to_pylist()
        nb = batch["node_b"].to_pylist()
        for i in range(batch.num_rows):
            if ua[i] > ub[i]:
                ua[i], ub[i] = ub[i], ua[i]
                na[i], nb[i] = nb[i], na[i]
        out = pa.table({
            "node_a": pa.array(na, pa.int64()),
            "node_b": pa.array(nb, pa.int64()),
            "url_a": pa.array(ua, pa.string()),
            "url_b": pa.array(ub, pa.string()),
            "src": batch["src"],
            "jaccard": batch["jaccard"],
            "span_len": pa.array(spans, pa.int64()),
        })
        return out

    return (joined.map_batches(lcs_batch, batch_format="pyarrow",
                               batch_size=256)
            .filter(expr=f"span_len >= {min_span}"))


def _labels_via_driver_cc(edges, signatures, cfg: PipelineConfig):
    """Labels via driver union-find + broadcast lookup (no joins).

    Collects the (tiny) verified edge list, runs exact union-find, and
    derives per-component canonical min url + size from the edge
    endpoints (every clustered node occurs in an edge).  One broadcast
    lookup then labels the whole corpus in a single map_batches pass;
    unmatched nodes are singletons (component = own url).  Labels are
    byte-identical to the distributed join/relabel path (asserted in
    tests/test_components.py and the cross-parallelism pipeline test).
    """
    import ray

    from eridu_ray.kernels.unionfind import components_from_edges

    na_parts, nb_parts, ua_parts, ub_parts = [], [], [], []
    for b in edges.select_columns(
            ["node_a", "node_b", "url_a", "url_b"]).iter_batches(
            batch_format="pyarrow", batch_size=262144):
        na_parts.append(b["node_a"].to_numpy(zero_copy_only=False))
        nb_parts.append(b["node_b"].to_numpy(zero_copy_only=False))
        ua_parts.append(np.asarray(b["url_a"].to_pylist(), dtype=object))
        ub_parts.append(np.asarray(b["url_b"].to_pylist(), dtype=object))
    na = (np.concatenate(na_parts) if na_parts
          else np.empty(0, np.int64))
    nbv = (np.concatenate(nb_parts) if nb_parts
           else np.empty(0, np.int64))
    if na.size == 0:
        # duplicate-free corpus: every node is a singleton; skip the
        # lookup entirely (an empty nodes array must never be indexed —
        # ADVICE r2 high)
        nodes_sorted = np.empty(0, np.int64)
        comps = np.empty(0, dtype=object)
        sizes = np.empty(0, np.int64)
    else:
        # vectorized exact CC (numpy min-label propagation — same
        # min-node-id labels as UnionFind; no per-edge Python)
        nodes_sorted, labels = components_from_edges(na, nbv)
        ends = np.concatenate([na, nbv])
        urls = np.concatenate(ua_parts + ub_parts)
        # node -> url (node_id is a hash of url, so the map is a function)
        uniq_pos = np.searchsorted(nodes_sorted, ends)
        url_per_node = np.empty(nodes_sorted.size, dtype=object)
        url_per_node[uniq_pos] = urls
        # canonical per-component min url + member count, via pandas
        # groupby over the (bounded) clustered-node table
        import pandas as pd

        grp = pd.DataFrame({"lab": labels, "url": url_per_node}).groupby(
            "lab", sort=False)
        comps = grp["url"].transform("min").to_numpy(dtype=object)
        sizes = grp["url"].transform("size").to_numpy(dtype=np.int64)
    ref = ray.put((nodes_sorted, comps, sizes))

    def assign(batch: pa.Table) -> pa.Table:
        ns, cs, sz = ray.get(ref)
        node = batch["node_id"].to_numpy(zero_copy_only=False)
        urls = np.asarray(batch["url"].to_pylist(), dtype=object)
        if ns.size == 0:
            return pa.table({
                "url": batch["url"],
                "component": batch["url"],
                "component_size": pa.array(
                    np.ones(batch.num_rows, np.int64)),
            })
        idx_c = np.clip(np.searchsorted(ns, node), 0, ns.size - 1)
        found = ns[idx_c] == node
        comp = np.where(found, cs[idx_c], urls)
        size = np.where(found, sz[idx_c], 1)
        return pa.table({
            "url": batch["url"],
            "component": pa.array(comp.tolist(), pa.string()),
            "component_size": pa.array(size.astype(np.int64)),
        })

    return signatures.select_columns(["url", "node_id"]).map_batches(
        assign, batch_format="pyarrow")
