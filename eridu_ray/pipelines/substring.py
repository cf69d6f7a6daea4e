"""Substring (long-shared-span) dedup over documents — spans + cut.

The north-star pipeline names a suffix-array substring-dedup stage.  The
flagship (pipelines/dedup.py) emits span *edges* (length only) for
clustering; this module exposes the substring family as standalone
operators over ``documents.parquet`` and adds the second half of the
technique: **duplicate-span removal** (Lee et al. 2022,
arXiv:2107.06499 — train-data dedup by excising repeated substrings
rather than dropping whole documents).

Stages (all Ray-Data, streaming):

1. winnowing fingerprints as span candidates (kernels/shingle.py —
   the fps are winnow BIGRAMS ∪ repetition markers ∪ CDC hashes: a
   shared non-repetitive span >= 2·window + k - 1 chars guarantees a
   shared bigram fp, >= 3·window + k - 1 guarantees two, so the
   family's window is 32 to keep both bounds inside the 100-char
   contract — see _substring_cfg), hot buckets triangle-salted so pair
   recall survives boilerplate floods
   (stages/candidates.make_salted_explode), single-fp junk collisions
   dropped by the flagship's winnow_min_hits=2 guard;
2. exact verification by **generalized suffix array**
   (kernels/suffix.pair_longest_span): collision-free longest common
   substring WITH offsets in both docs — the rolling-hash verifier is
   length-only, which cut cannot use;
3. cut: spans grouped per victim doc (the larger doc_id — keep-first
   orientation), overlapping intervals merged vectorized, and the
   victim's text excised.

Scale notes: candidate + verify shuffles are the flagship's (salted
buckets, ids-only pair rows until the text attach); every
pair->signature / cut->document attach is the join-free union +
pid-groupby pattern (stages/verify.attach_texts and the local kind-run
variant here) — groupby outputs carry schema-less empty blocks that
crash Ray's JoinOperator, and pid bucketing amortizes group overhead
over ~bucket_partitions groups instead of one per distinct doc_id.
Nothing materializes the corpus driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.config import PipelineConfig
from eridu_ray.pipelines.text_dedup import (_documents_as_pages,
                                            _salted_candidate_pairs,
                                            _signatures)
from eridu_ray.stages import candidates as cand

#: span threshold for the documents-table operators — the flagship's 200
#: assumes ~2.8 KB Common-Crawl pages; testdata documents average ~290
#: chars, so the standalone family verifies at 100.
DOC_MIN_SPAN = 100


def _substring_cfg(num_partitions: int = 8) -> PipelineConfig:
    """Candidate fingerprints for the standalone family use winnow
    window 32 (the flagship's 64 assumes min_span=200): the fingerprints
    are winnow BIGRAMS, whose non-repetitive guarantee is one shared fp
    per 2·window + k - 1 = 68 <= DOC_MIN_SPAN chars and TWO shared fps
    per 3·window + k - 1 = 100 <= DOC_MIN_SPAN chars — so the flagship's
    winnow_min_hits=2 junk-pair guard is recall-complete at this
    contract.  Without the guard, dense-shared-vocab corpora flood the
    SA verify with single-fp collisions (measured at sf0.1: 1.29M
    candidate pairs for 223 true spans — 103 s; guarded: see
    BASELINE.md round-4 notes)."""
    return PipelineConfig(num_partitions=num_partitions, winnow_window=32)


def _span_guard_hits(cfg: PipelineConfig, min_span: int) -> int:
    """winnow_min_hits valid for ``min_span`` under cfg's window: 2 when
    the two-bigram guarantee bound fits inside the contract, else 1
    (guard off — completeness beats speed)."""
    return 2 if min_span >= 3 * cfg.winnow_window + cfg.shingle_k - 1 else 1


def substring_spans(sf_dir: str, cfg: PipelineConfig | None = None,
                    min_span: int = DOC_MIN_SPAN):
    """(doc_id_a, doc_id_b, span_len, pos_a, pos_b) for every winnow
    candidate pair sharing an exact span >= min_span chars.

    doc_id_a < doc_id_b always; (pos_a, pos_b) locate one maximal shared
    span (the suffix-array argmax — deterministic given the texts).

    Candidates carry the flagship's winnow junk-pair guard when the
    two-bigram guarantee covers ``min_span`` under the config's window
    (see _substring_cfg) — single-fingerprint collisions on
    dense-shared-vocab corpora otherwise flood the per-pair SA verify.
    """
    from eridu_ray.stages.verify import attach_texts, prune_to_pair_nodes

    cfg = cfg or _substring_cfg()
    # winnow-only signatures: the family consumes node ids + text +
    # winnow fps; the flagship's minhash/simhash/verify blobs are dead
    # weight here (measured: the full re-sign dominated substring_cut's
    # sf0.1 wall — VERDICT r4 next #6)
    sigs = _signatures(sf_dir, cfg, winnow_only=True).materialize()
    pairs = _salted_candidate_pairs(
        sigs, cfg, cand.WinnowExploder(cfg), "fp_key", "winnow",
        est_min=None, winnow_min_hits=_span_guard_hits(cfg, min_span))

    def widen(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "node_a": b["node_a"], "node_b": b["node_b"],
            "url_a": b["url_a"], "url_b": b["url_b"],
            "src": pa.nulls(n, pa.string()),
            "jaccard": pa.nulls(n, pa.float64())})

    sub = pairs.map_batches(widen, batch_format="pyarrow").materialize()
    # the pid-groupby upstream coalesces to a handful of blocks and
    # map_batches never splits a block across tasks — the per-pair
    # verify below is CPU-bound, so split to ~8k pairs/task (measured:
    # 3 tasks = 71 s vs ~6 s split, 822k pairs at 32 CPUs); plain
    # repartition is a split/coalesce, not an all-to-all
    n_pairs = sub.count()
    nb = max(cfg.num_partitions, min(512, (n_pairs + 8191) // 8192))
    sub = sub.repartition(nb).materialize()
    texts, n_nodes = prune_to_pair_nodes(
        sub, sigs.select_columns(["node_id", "text"]), cfg,
        max_nodes=5_000_000)

    def _verify_rows(ta, tb, ids_a, ids_b):
        """Tiered exact verify, shared by both layouts: rolling-hash
        length gate first (never underestimates — hash equality can
        only falsely CONFIRM, so a sub-threshold tier-1 length proves
        the true span is sub-threshold), collision-free SA with offsets
        only for the survivors (~pairs-with-real-spans, not
        candidates)."""
        from eridu_ray.kernels.shingle import shared_run_length
        from eridu_ray.kernels.suffix import pair_longest_span

        n = len(ta)
        ln = np.zeros(n, np.int64)
        pos_a = np.full(n, -1, np.int64)
        pos_b = np.full(n, -1, np.int64)
        ids_a = np.asarray(ids_a, np.int64).copy()
        ids_b = np.asarray(ids_b, np.int64).copy()
        for i in range(n):  # inherent per-pair string work, task-bounded
            if shared_run_length(ta[i], tb[i]) < min_span:
                continue
            length, xa, xb = pair_longest_span(ta[i], tb[i],
                                               min_len=min_span)
            # orient to doc_id order (keep-first: a = smaller id)
            if ids_a[i] <= ids_b[i]:
                ln[i], pos_a[i], pos_b[i] = length, xa, xb
            else:
                ids_a[i], ids_b[i] = ids_b[i], ids_a[i]
                ln[i], pos_a[i], pos_b[i] = length, xb, xa
        return pa.table({
            "doc_id_a": pa.array(ids_a), "doc_id_b": pa.array(ids_b),
            "span_len": pa.array(ln),
            "pos_a": pa.array(pos_a), "pos_b": pa.array(pos_b)})

    # layout dispatch, the flagship verify's pattern (stages/verify.py):
    # while the pair-pruned text table fits the broadcast budget it
    # ships ONCE per node via ray.put and pairs verify map-side — no
    # per-pair text copies enter any shuffle (the naive attach sorts
    # |pairs| × ~2 texts: measured 84 s vs ~14 s at sf0.1's 822k
    # guarded candidates).  Above the budget (or the 5M-node prune
    # cap), the join-free union+pid-groupby attach is the 100 TB path.
    total_bytes = 0
    if n_nodes is not None:
        import pyarrow.compute as pc

        for b in texts.map_batches(
                lambda t: pa.table({"nb": pa.array(
                    [int(pc.sum(pc.utf8_length(t["text"])).as_py() or 0)
                     + 64 * t.num_rows], pa.int64())}),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None):
            total_bytes += int(pc.sum(b["nb"]).as_py() or 0)

    if n_nodes is not None and total_bytes <= cfg.verify_broadcast_max_bytes:
        import ray

        from eridu_ray.kernels.shingle import gram_hashes

        # zero-copy-friendly broadcast layout (ADVICE r4): a pickled
        # list-of-str deserializes a FULL private copy into every worker
        # process on ray.get (multiplying resident memory by worker
        # count near the budget).  Numpy buffers instead are plasma-
        # backed read-only views shared by every worker on the node —
        # one concatenated UTF-8 blob + int64 offsets, decoded per
        # SURVIVING pair only, so the per-worker private footprint is
        # O(batch texts), not O(corpus).
        #
        # Tier-0 gram index (the r5 tier restructure): each doc's
        # min_span-length rolling-hash set is computed ONCE here and
        # shipped sorted — a true shared span >= min_span implies a
        # common gram hash (never misses; collisions only falsely
        # CONFIRM and die in the SA tier).  Docs average ~180 pairs
        # each at sf0.1 (822k pairs over 4.6k pruned nodes), so the
        # per-DOC precompute replaces 822k per-PAIR rolling-hash scans
        # + 1.6M text decodes with one sorted-array intersection per
        # pair (measured: the verify tail dropped ~7 s -> <1 s).
        ids_parts, txt_chunks = [], []
        for b in texts.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
            ids_parts.append(b["node_id"].to_numpy(zero_copy_only=False))
            txt_chunks.append(b["text"])
        ids = (np.concatenate(ids_parts) if ids_parts
               else np.array([], np.int64))
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        if txt_chunks:
            # large_string: int64 offsets — the 4 GiB budget exceeds
            # 32-bit string-offset range.  take() materializes fresh
            # contiguous buffers, so the Arrow offsets/data buffers ARE
            # the broadcast layout (no per-string re-encode).
            txt = pc.cast(pa.chunked_array(txt_chunks),
                          pa.large_string()).combine_chunks().take(
                pa.array(order))
            assert txt.offset == 0
            offs = np.frombuffer(txt.buffers()[1], np.int64, len(txt) + 1)
            data_buf = txt.buffers()[2]
            blob = (np.frombuffer(data_buf, np.uint8, int(offs[-1]))
                    if data_buf is not None else np.empty(0, np.uint8))
            grams = [np.sort(gram_hashes(t, min_span))
                     for t in txt.to_pylist()]
            gsizes = np.array([g.size for g in grams], np.int64)
            goffs = np.zeros(len(grams) + 1, np.int64)
            np.cumsum(gsizes, out=goffs[1:])
            gblob = (np.concatenate(grams) if grams and gsizes.sum()
                     else np.empty(0, np.uint64))
        else:
            offs = np.zeros(1, np.int64)
            blob = np.empty(0, np.uint8)
            goffs = np.zeros(1, np.int64)
            gblob = np.empty(0, np.uint64)
        ref = ray.put((ids, offs, blob, goffs, gblob))

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            ids_s, offs_s, blob_s, goffs_s, gblob_s = ray.get(ref)
            na = batch["node_a"].to_numpy(zero_copy_only=False)
            nb_ = batch["node_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(ids_s, na)
            ib = np.searchsorted(ids_s, nb_)
            keep = []
            for i in range(len(na)):
                ga = gblob_s[goffs_s[ia[i]]:goffs_s[ia[i] + 1]]
                gb = gblob_s[goffs_s[ib[i]]:goffs_s[ib[i] + 1]]
                if ga.size == 0 or gb.size == 0:
                    continue
                if ga.size > gb.size:
                    ga, gb = gb, ga
                pos = np.searchsorted(gb, ga)
                pos[pos == gb.size] = 0
                if bool((gb[pos] == ga).any()):
                    keep.append(i)
            ta = [blob_s[offs_s[ia[i]]:offs_s[ia[i] + 1]].tobytes()
                  .decode("utf-8") for i in keep]
            tb = [blob_s[offs_s[ib[i]]:offs_s[ib[i] + 1]].tobytes()
                  .decode("utf-8") for i in keep]
            ua = batch["url_a"].take(pa.array(keep, pa.int64())).to_pylist()
            ub = batch["url_b"].take(pa.array(keep, pa.int64())).to_pylist()
            return _verify_rows(
                ta, tb, [int(u) for u in ua], [int(u) for u in ub])

        verified = sub.map_batches(verify_broadcast,
                                   batch_format="pyarrow",
                                   batch_size=2048)
    else:
        joined = attach_texts(sub, texts, cfg).repartition(
            cfg.num_partitions)

        def verify_reduce(batch: pa.Table) -> pa.Table:
            return _verify_rows(
                batch["text_a"].to_pylist(), batch["text_b"].to_pylist(),
                [int(u) for u in batch["url_a"].to_pylist()],
                [int(u) for u in batch["url_b"].to_pylist()])

        verified = joined.map_batches(verify_reduce,
                                      batch_format="pyarrow",
                                      batch_size=256)
    return verified.filter(expr=f"span_len >= {min_span}")


_CUT_SCHEMA = pa.schema([
    ("key", pa.int64()), ("kind", pa.int8()), ("text", pa.string()),
    ("cut_start", pa.int64()), ("cut_end", pa.int64()),
])

_CUT_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_spans", pa.int64()),
    ("removed_chars", pa.int64()), ("text_cut", pa.string()),
])


def _merge_runs(start: np.ndarray, end: np.ndarray):
    """Merge overlapping sorted-by-start intervals; returns
    (merged_start, merged_end, n_inputs_per_merged)."""
    order = np.argsort(start, kind="stable")
    start, end = start[order], end[order]
    run_max = np.maximum.accumulate(end)
    new_run = np.ones(start.size, dtype=bool)
    new_run[1:] = start[1:] > run_max[:-1]
    run_id = np.cumsum(new_run) - 1
    m_start = start[new_run]
    m_end = np.maximum.reduceat(end, np.flatnonzero(new_run))
    return m_start, m_end, np.bincount(run_id, minlength=m_start.size)


def _apply_cuts_fn(group: pa.Table) -> pa.Table:
    """map_groups over groupby(pid(doc_id)) of union(doc-text rows
    kind=0, cut-interval rows kind=1): per doc-run, merge overlapping
    intervals and excise them from the text.  Docs with no interval
    rows in the pid (or intervals whose doc has no text row) drop —
    inner semantics."""
    keys = group["key"].to_numpy(zero_copy_only=False)
    kind = group["kind"].to_numpy(zero_copy_only=False)
    order = np.lexsort((kind, keys))
    k_s, kd_s = keys[order], kind[order]
    n = k_s.shape[0]
    bnd = np.nonzero(k_s[1:] != k_s[:-1])[0] + 1
    starts = np.concatenate([[0], bnd])
    ends = np.concatenate([bnd, [n]])
    live = (ends - starts >= 2) & (kd_s[starts] == 0)
    texts = group["text"].to_pylist()
    # doc rows carry null intervals, so Arrow->numpy gives float64 with
    # NaN; the kind-1 rows indexed below are never null — cast back
    cs = group["cut_start"].to_numpy(zero_copy_only=False)
    ce = group["cut_end"].to_numpy(zero_copy_only=False)
    out_id, out_n, out_rm, out_txt = [], [], [], []
    for s, e in zip(starts[live], ends[live]):
        text = texts[order[s]]
        rows = order[s + 1:e]
        m_start, m_end, counts = _merge_runs(
            cs[rows].astype(np.int64), ce[rows].astype(np.int64))
        pieces, prev = [], 0
        for a, b in zip(m_start.tolist(), m_end.tolist()):
            pieces.append(text[prev:a])
            prev = b
        pieces.append(text[prev:])
        cut = "".join(pieces)
        out_id.append(int(k_s[s]))
        out_n.append(int(counts.sum()))
        out_rm.append(len(text) - len(cut))
        out_txt.append(cut)
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "n_spans": pa.array(out_n, pa.int64()),
        "removed_chars": pa.array(out_rm, pa.int64()),
        "text_cut": pa.array(out_txt, pa.string())}).cast(_CUT_OUT_SCHEMA)


def substring_cut(sf_dir: str, cfg: PipelineConfig | None = None,
                  min_span: int = DOC_MIN_SPAN):
    """Duplicate-span removal: every doc that shares a span >= min_span
    with a LOWER doc_id gets that span excised (the lower-id copy is
    canonical and keeps its text).

    Returns (doc_id, n_spans, removed_chars, text_cut) for the affected
    docs only — one row per victim, overlapping intervals from several
    partners merged before cutting so each char is removed once.
    """
    import ray.data as rd

    from eridu_ray.kernels.hashing import splitmix64

    cfg = cfg or _substring_cfg()
    nb = cfg.bucket_partitions
    spans = substring_spans(sf_dir, cfg, min_span=min_span)

    def with_pid(tab: pa.Table) -> pa.Table:
        keys = tab["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pid = (splitmix64(keys) % np.uint64(nb)).astype(np.int32)
        return tab.append_column("pid", pa.array(pid))

    def cut_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        pos = b["pos_b"].to_numpy(zero_copy_only=False)
        ln = b["span_len"].to_numpy(zero_copy_only=False)
        return with_pid(pa.Table.from_arrays(
            [b["doc_id_b"], pa.array(np.ones(n, np.int8)),
             pa.nulls(n, pa.string()),
             pa.array(pos.astype(np.int64)),
             pa.array((pos + ln).astype(np.int64))],
            schema=_CUT_SCHEMA))

    def doc_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return with_pid(pa.Table.from_arrays(
            [b["doc_id"], pa.array(np.zeros(n, np.int8)), b["text"],
             pa.nulls(n, pa.int64()), pa.nulls(n, pa.int64())],
            schema=_CUT_SCHEMA))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    u = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        spans.map_batches(cut_rows, batch_format="pyarrow"))
    return u.groupby("pid").map_groups(_apply_cuts_fn,
                                       batch_format="pyarrow")


def q_substring_cut(sf_dir: str):
    """Driver registry entry (rows-only: span discovery is SA-based, not
    SQL-expressible; planted-span golden tests in tests/test_substring.py
    gate values).  text_cut is dropped from the driver row so the
    comparison stays on the bounded numeric summary."""
    return substring_cut(sf_dir).drop_columns(["text_cut"])
