"""Exact-Jaccard verification of candidate pairs.

Three implementations (run_dedup's "auto" dispatch picks broadcast while
the blob table fits cfg.verify_broadcast_max_bytes, else reduce):

- ``attach_shingles`` + ``jaccard_batch``: two Acero hash joins keyed on
  node id (SURVEY.md §7.1 SHUFFLE #3), then per-pair exact Jaccard.
  Joins duplicate a node's shingle blob once per pair it appears in,
  and Ray 2.49's join aggregator actors reserve whole CPUs (the
  measured 16-partition width cap, BASELINE.md round 1).
- ``verify_pairs_reduce``: the same semantics as TWO reduce-side joins
  (union + sort-groupby on node id) with the Jaccard computation FUSED
  into the second join's group function.  Each node's blob is shuffled
  once per pass (not once per pair), sh_b never rides on pair rows, and
  no join-aggregator actors are reserved — the sort shuffle runs as
  plain tasks at any width.  The flagship's large-corpus path.
- ``verify_pairs_broadcast``: the signature blob index is ``ray.put``
  once and dedup + Jaccard fuse into the raw candidates' existing
  pair-pid groupby — verify itself needs ZERO shuffles.  The flagship's
  small-regime path (blob table under the per-node broadcast budget).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.mem import ensure_malloc_pool

# imported in every Ray worker that runs a verify kernel: large scratch
# buffers must come from the reusable heap or each group call pays
# kernel page-zeroing (see kernels/mem.py — the measured 8->32 CPU
# scaling collapse of this stage)
ensure_malloc_pool()


def blob_to_u32(buf) -> np.ndarray:
    """uint32-LE verify-set blob -> sorted-unique uint32 array."""
    return (np.frombuffer(buf, dtype=np.uint32) if buf is not None
            else np.empty(0, dtype=np.uint32))


def attach_shingles(candidates, signatures, cfg: PipelineConfig,
                    column: str = "shingles", attach_urls: bool = False):
    """pairs (node_a, node_b, ...) join signatures twice -> + sh_a, sh_b.

    sh_a/sh_b are binary uint32-LE verify-set blobs (the signature
    stage's wire format — decode with blob_to_u32).  ``attach_urls``
    also pulls url_a/url_b from the signature side — used by the
    flagship, whose slim candidate pairs carry ids only.
    """
    cols = ["node_id", column] + (["url"] if attach_urls else [])
    side = signatures.select_columns(cols)
    ren_a = {column: "sh_a", "node_id": "na_key"}
    ren_b = {column: "sh_b", "node_id": "nb_key"}
    if attach_urls:
        ren_a["url"] = "url_a"
        ren_b["url"] = "url_b"
    a_side = side.rename_columns(ren_a)
    b_side = side.rename_columns(ren_b)
    out = candidates.join(a_side, join_type="inner",
                          num_partitions=cfg.num_partitions,
                          on=("node_a",), right_on=("na_key",))
    out = out.join(b_side, join_type="inner",
                   num_partitions=cfg.num_partitions,
                   on=("node_b",), right_on=("nb_key",))
    return out  # join drops the right-side key columns itself


def _batched_jaccard(blobs_a: list, blobs_b: list) -> np.ndarray:
    """Exact Jaccard for aligned lists of uint32-LE sorted-set blobs.

    One vectorized sort-merge membership pass for the WHOLE batch: each
    row's elements are tagged with the row id in the high 32 bits, so the
    concatenated b-side key array is globally sorted and a single
    ``np.searchsorted`` answers every per-row membership test at once.
    Per-row intersection sizes fall out of a cumsum over the hit mask.
    Replaces the per-pair ``np.intersect1d`` loop that was 50% of the
    flagship wall (VERDICT r2 #1); results are bit-identical (same
    integer counts, same float division).
    """
    n = len(blobs_a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    sz_a = np.fromiter((len(b) >> 2 if b is not None else 0
                        for b in blobs_a), dtype=np.int64, count=n)
    sz_b = np.fromiter((len(b) >> 2 if b is not None else 0
                        for b in blobs_b), dtype=np.int64, count=n)
    cat_a = np.frombuffer(
        b"".join(b for b in blobs_a if b is not None), dtype=np.uint32)
    cat_b = np.frombuffer(
        b"".join(b for b in blobs_b if b is not None), dtype=np.uint32)
    inter = _tagged_intersections(cat_a, sz_a, cat_b, sz_b)
    union = sz_a + sz_b - inter
    # both-empty rows: union == 0 -> Jaccard defined as 1.0
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def _tagged_intersections(cat_a: np.ndarray, sz_a: np.ndarray,
                          cat_b: np.ndarray, sz_b: np.ndarray) -> np.ndarray:
    """Per-row set-intersection sizes of concatenated sorted uint32 rows.

    The shared sort-merge core of the reduce and broadcast verify paths:
    elements are tagged with the row id in the high 32 bits, so the
    concatenated b-side key array is globally sorted and ONE
    ``np.searchsorted`` answers every per-row membership test; per-row
    counts fall out of a cumsum over the hit mask.
    """
    n = sz_a.size
    row_ids = np.arange(n, dtype=np.uint64) << np.uint64(32)
    a_keys = cat_a.astype(np.uint64) | np.repeat(row_ids, sz_a)
    b_keys = cat_b.astype(np.uint64) | np.repeat(row_ids, sz_b)
    if b_keys.size:
        pos = np.searchsorted(b_keys, a_keys)
        np.clip(pos, 0, b_keys.size - 1, out=pos)
        hits = b_keys[pos] == a_keys
    else:
        hits = np.zeros(a_keys.size, dtype=bool)
    cs = np.concatenate([[0], np.cumsum(hits)])
    offs = np.concatenate([[0], np.cumsum(sz_a)])
    return cs[offs[1:]] - cs[offs[:-1]]


def jaccard_batch(batch: pa.Table, keep_lo: float | None = None,
                  keep_hi: float | None = None) -> pa.Table:
    """Add exact 'jaccard' column from sh_a/sh_b (uint32-LE blobs).

    When (keep_lo, keep_hi) is given, sh_a/sh_b are retained (nulled
    outside the [keep_lo, keep_hi) window) so the borderline scorer stage
    can consume them directly without re-joining the signature table —
    two shuffles saved per run.  Otherwise the blobs are dropped.
    """
    n = batch.num_rows
    blobs_a = batch["sh_a"].to_pylist() if n else []
    blobs_b = batch["sh_b"].to_pylist() if n else []
    out = _batched_jaccard(blobs_a, blobs_b)
    if keep_lo is None:
        batch = batch.drop_columns(["sh_a", "sh_b"])
    else:
        keep = (out >= keep_lo) & (out < keep_hi)
        kept_a = [blobs_a[i] if keep[i] else None for i in range(n)]
        kept_b = [blobs_b[i] if keep[i] else None for i in range(n)]
        batch = batch.drop_columns(["sh_a", "sh_b"])
        batch = batch.append_column("sh_a", pa.array(kept_a, pa.binary()))
        batch = batch.append_column("sh_b", pa.array(kept_b, pa.binary()))
    return batch.append_column("jaccard", pa.array(out))


# --- join-free text attach (span-verify inputs) ----------------------------
#
# Ray's hash-shuffle JoinOperator crashes when a probe-side partition
# receives only a 0-row 0-column block ("No match ... for key field" in
# pyarrow.Table.join) — and groupby().map_groups() emits exactly such
# schema-less empties for empty partitions, which Filter/MapBatches
# forward untouched.  Sort/groupby tolerate them, so pair->signature
# attaches downstream of a groupby use this union + pid-groupby join
# (the reduce-verify pattern) instead of Dataset.join.

_SPAN_ATTACH_SCHEMA = pa.schema([
    ("key", pa.int64()), ("kind", pa.int8()), ("text", pa.string()),
    ("node_a", pa.int64()), ("node_b", pa.int64()),
    ("url_a", pa.string()), ("url_b", pa.string()),
    ("src", pa.string()), ("jaccard", pa.float64()),
])

_SPAN_ATTACH2_SCHEMA = _SPAN_ATTACH_SCHEMA.append(
    pa.field("text_a", pa.string()))

_PAIR_PASSTHROUGH = ["node_a", "node_b", "url_a", "url_b", "src",
                     "jaccard"]


def _key_kind_runs(g: pa.Table):
    """lexsorted (key, kind) run spans that start with a kind-0 head."""
    keys = g["key"].to_numpy(zero_copy_only=False)
    kind = g["kind"].to_numpy(zero_copy_only=False)
    order = np.lexsort((kind, keys))
    k_s = keys[order]
    kd_s = kind[order]
    n = k_s.shape[0]
    bnd = np.nonzero(k_s[1:] != k_s[:-1])[0] + 1
    starts = np.concatenate([[0], bnd])
    ends = np.concatenate([bnd, [n]])
    live = (ends - starts >= 2) & (kd_s[starts] == 0)
    return order, starts[live], ends[live]


def prune_to_pair_nodes(pairs, signatures, cfg: PipelineConfig,
                        max_nodes: int):
    """(signatures pruned to nodes appearing in ``pairs``, n_nodes).

    ``pairs`` must be small enough to iterate driver-side (span
    candidates are junk-guard-bounded; same bounded-driver-artifact
    class as hot-bucket salts).  The distinct node ids broadcast once
    via ray.put (zero-copy plasma views in every filter task).  If the
    id set exceeds ``max_nodes``, returns the signatures UNPRUNED
    (n_nodes None) — the 10^12-doc fallback, where the attach shuffles
    the full narrow (node_id, text) table exactly like a hash join
    would.
    """
    import ray

    ids: set = set()
    over = False
    for b in pairs.select_columns(["node_a", "node_b"]).iter_batches(
            batch_format="pyarrow"):
        ids.update(b["node_a"].to_pylist())
        ids.update(b["node_b"].to_pylist())
        if len(ids) > max_nodes:
            over = True
            break
    if over:
        return signatures, None
    arr = np.sort(np.fromiter(ids, np.int64, len(ids)))
    ref = ray.put(arr)

    def keep(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        nid = b["node_id"].to_numpy(zero_copy_only=False)
        if keys.size == 0:
            return b.slice(0, 0)
        pos = np.searchsorted(keys, nid)
        np.clip(pos, 0, keys.size - 1, out=pos)
        return b.filter(pa.array(keys[pos] == nid))

    return (signatures.map_batches(keep, batch_format="pyarrow"),
            int(arr.size))


def attach_texts(pairs, signatures, cfg: PipelineConfig):
    """pairs(node_a, node_b, url_a, url_b, src, jaccard) +
    signatures(node_id, text) -> pairs + text_a + text_b.

    Inner-join semantics (pairs whose node has no signature row drop),
    implemented as two union + groupby(pid(key)) passes so the span
    stage never feeds a JoinOperator (see the 0-column-block note
    above).  pid buckets reuse cfg.bucket_partitions for group-count
    amortization; each doc's text ships once per pass.
    """
    from eridu_ray.kernels.hashing import splitmix64

    nb = cfg.bucket_partitions

    def with_pid(tab: pa.Table) -> pa.Table:
        keys = tab["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pid = (splitmix64(keys) % np.uint64(nb)).astype(np.int32)
        return tab.append_column("pid", pa.array(pid))

    def sig_rows(schema: pa.Schema):
        extra = [f.name for f in schema
                 if f.name not in ("key", "kind", "text")]

        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return with_pid(pa.Table.from_arrays(
                [b["node_id"], pa.array(np.zeros(n, np.int8)), b["text"]]
                + [pa.nulls(n, schema.field(c).type) for c in extra],
                schema=schema))

        return signatures.select_columns(["node_id", "text"]).map_batches(
            f, batch_format="pyarrow")

    def pair_rows1(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return with_pid(pa.Table.from_arrays(
            [b["node_a"], pa.array(np.ones(n, np.int8)),
             pa.nulls(n, pa.string())]
            + [b[c] for c in _PAIR_PASSTHROUGH],
            schema=_SPAN_ATTACH_SCHEMA))

    def make_attach(schema: pa.Schema, out_col: str):
        def attach(g: pa.Table) -> pa.Table:
            out_schema = schema.append(pa.field(out_col, pa.string()))
            order, starts, ends = _key_kind_runs(g)
            if starts.size == 0:
                return out_schema.empty_table()
            texts = g["text"].to_pylist()
            pair_idx, t_out = [], []
            for s, e in zip(starts, ends):
                head_text = texts[order[s]]
                rows = order[s + 1:e]
                pair_idx.extend(int(r) for r in rows)
                t_out.extend([head_text] * (e - s - 1))
            out = g.take(pa.array(pair_idx)).select(
                [f.name for f in schema])
            return out.append_column(out_col, pa.array(t_out, pa.string()))

        return attach

    u1 = sig_rows(_SPAN_ATTACH_SCHEMA).union(
        pairs.map_batches(pair_rows1, batch_format="pyarrow"))
    p1 = u1.groupby("pid").map_groups(
        make_attach(_SPAN_ATTACH_SCHEMA, "text_a"), batch_format="pyarrow")

    def rekey_b(b: pa.Table) -> pa.Table:
        b = b.set_column(0, "key", b["node_b"])
        if "pid" in b.column_names:
            b = b.drop_columns(["pid"])
        return with_pid(b)

    u2 = sig_rows(_SPAN_ATTACH2_SCHEMA).union(
        p1.map_batches(rekey_b, batch_format="pyarrow"))
    p2 = u2.groupby("pid").map_groups(
        make_attach(_SPAN_ATTACH2_SCHEMA, "text_b"), batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        return b.select(_PAIR_PASSTHROUGH + ["text_a", "text_b"])

    return p2.map_batches(finish, batch_format="pyarrow")


# --- reduce-side verify (union + groupby join, fused Jaccard) --------------

_P1_SCHEMA = pa.schema([
    ("key", pa.int64()), ("kind", pa.int8()), ("blob", pa.binary()),
    ("url", pa.string()),  # sig rows only: the node's url (pairs are slim)
    ("node_a", pa.int64()), ("node_b", pa.int64()),
    ("src", pa.string()), ("est", pa.float64()),
])

_P1_OUT_SCHEMA = pa.schema([
    ("key", pa.int64()), ("kind", pa.int8()), ("blob", pa.binary()),
    ("url", pa.string()),
    ("node_a", pa.int64()), ("node_b", pa.int64()),
    ("src", pa.string()), ("est", pa.float64()),
    ("url_a", pa.string()), ("sh_a", pa.binary()),
])

_VERIFIED_SCHEMA = pa.schema([
    ("node_a", pa.int64()), ("node_b", pa.int64()),
    ("url_a", pa.string()), ("url_b", pa.string()),
    ("src", pa.string()), ("est", pa.float64()),
    ("sh_a", pa.binary()), ("sh_b", pa.binary()),
    ("jaccard", pa.float64()),
])


def _sig_side(signatures, column: str):
    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [b["node_id"], pa.array(np.zeros(n, np.int8)), b[column],
             b["url"],
             pa.nulls(n, pa.int64()), pa.nulls(n, pa.int64()),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.float64())],
            schema=_P1_SCHEMA)

    return signatures.select_columns(
        ["node_id", column, "url"]).map_batches(
        f, batch_format="pyarrow")


def verify_pairs_reduce(candidates, signatures, cfg: PipelineConfig,
                        keep_lo: float | None = None,
                        keep_hi: float | None = None,
                        column: str = "shingles",
                        dedup_winnow_min_hits: int | None = None,
                        dedup_winnow_est_min: float = 0.0):
    """pairs + signatures -> verified pairs with exact 'jaccard'.

    Pass 1: union(sig rows keyed node_id, pair rows keyed node_a) ->
    groupby(pid) -> pair rows acquire sh_a (their key run's single sig
    blob).  Pass 2: same keyed on node_b; the group function computes
    exact Jaccard in place (sh_b never leaves the group) and retains
    blobs only inside the [keep_lo, keep_hi) borderline window for the
    scorer.  Groups are pid = hash(node) % bucket_partitions with
    vectorized equal-key run detection inside — per-group Python
    overhead is paid ~hundreds of times, not once per corpus node.
    Output schema matches attach_shingles + jaccard_batch.

    ``dedup_winnow_min_hits`` not None means ``candidates`` is the RAW
    pre-dedup branch union: the cross-band (node_a, node_b) dedup runs
    inside each pass-1 group (every copy of a pair shares node_a, so the
    node_a-keyed shuffle already co-locates them — identical decisions
    to the standalone pair-pid pass), saving one full sort over the
    pre-dedup pair set, the flagship's largest intermediate.
    """
    from eridu_ray.kernels.hashing import splitmix64
    from eridu_ray.stages.candidates import dedup_slim_pairs

    nb = cfg.bucket_partitions

    def with_pid(tab: pa.Table) -> pa.Table:
        keys = tab["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pid = (splitmix64(keys) % np.uint64(nb)).astype(np.int32)
        return tab.append_column("pid", pa.array(pid))

    sig1 = _sig_side(signatures, column).map_batches(
        with_pid, batch_format="pyarrow")

    def pair_side1(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return with_pid(pa.Table.from_arrays(
            [b["node_a"], pa.array(np.ones(n, np.int8)),
             pa.nulls(n, pa.binary()), pa.nulls(n, pa.string()),
             b["node_a"], b["node_b"], b["src"], b["est"]],
            schema=_P1_SCHEMA))

    u1 = sig1.union(candidates.map_batches(pair_side1,
                                           batch_format="pyarrow"))

    def _runs(g: pa.Table):
        """lexsorted (key, kind) run spans with a kind-0 (sig) head."""
        keys = g["key"].to_numpy(zero_copy_only=False)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, keys))
        k_s = keys[order]
        kd_s = kind[order]
        n = k_s.shape[0]
        bnd = np.nonzero(k_s[1:] != k_s[:-1])[0] + 1
        starts = np.concatenate([[0], bnd])
        ends = np.concatenate([bnd, [n]])
        live = (ends - starts >= 2) & (kd_s[starts] == 0)
        return order, starts[live], ends[live]

    def attach_a(g: pa.Table) -> pa.Table:
        if dedup_winnow_min_hits is not None:
            # fused cross-band dedup: rebuild the group's pair rows from
            # the deduped slim set (see docstring); sig rows pass through
            kind_np = g["kind"].to_numpy(zero_copy_only=False)
            mask = pa.array(kind_np == 0)
            sig_rows = g.filter(mask).select(
                [f.name for f in _P1_SCHEMA])
            slim = dedup_slim_pairs(g.filter(pc.invert(mask)),
                                    dedup_winnow_min_hits,
                                    dedup_winnow_est_min)
            m = slim.num_rows
            pair_rows = pa.Table.from_arrays(
                [slim["node_a"], pa.array(np.ones(m, np.int8)),
                 pa.nulls(m, pa.binary()), pa.nulls(m, pa.string()),
                 slim["node_a"], slim["node_b"], slim["src"],
                 slim["est"]],
                schema=_P1_SCHEMA)
            g = pa.concat_tables([sig_rows, pair_rows])
        order, starts, ends = _runs(g)
        if starts.size == 0:
            return _P1_OUT_SCHEMA.empty_table()
        blobs = g["blob"].to_pylist()
        urls = g["url"].to_pylist()
        pair_idx, sh_a, u_a = [], [], []
        for s, e in zip(starts, ends):
            blob = blobs[order[s]]
            url = urls[order[s]]
            rows = order[s + 1:e]
            pair_idx.extend(int(r) for r in rows)
            sh_a.extend([blob] * (e - s - 1))
            u_a.extend([url] * (e - s - 1))
        pairs = g.take(pa.array(pair_idx)).select(
            [f.name for f in _P1_SCHEMA])
        pairs = pairs.append_column("url_a", pa.array(u_a, pa.string()))
        return pairs.append_column("sh_a", pa.array(sh_a, pa.binary()))

    p1 = u1.groupby("pid").map_groups(attach_a, batch_format="pyarrow")

    # sig side for pass 2 needs the extra sh_a column to union with p1
    def sig_side2(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return with_pid(pa.Table.from_arrays(
            [b["node_id"], pa.array(np.zeros(n, np.int8)), b[column],
             b["url"],
             pa.nulls(n, pa.int64()), pa.nulls(n, pa.int64()),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.float64()),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.binary())],
            schema=_P1_OUT_SCHEMA))

    sig2 = signatures.select_columns(
        ["node_id", column, "url"]).map_batches(
        sig_side2, batch_format="pyarrow")

    def rekey_b(b: pa.Table) -> pa.Table:
        b = b.set_column(0, "key", b["node_b"])
        if "pid" in b.column_names:
            b = b.drop_columns(["pid"])
        return with_pid(b)

    u2 = sig2.union(p1.map_batches(rekey_b, batch_format="pyarrow"))

    def attach_b_and_jaccard(g: pa.Table) -> pa.Table:
        # Per-run zero-copy group verify: each run's sb blob becomes ONE
        # uint32 view (np.frombuffer on the bytes — no copy), and every
        # pair's sa elements are membership-tested with one searchsorted
        # against it.  The former whole-group tagged variant (uint64
        # run-id keys over b"".join-concatenated blobs) allocated tens of
        # MB of short-lived buffers per group call; glibc served those
        # from fresh mmap pages, and with 32 concurrent tasks the kernel
        # zero-fill serialized on the memory subsystem — measured 1.3-2.4
        # s/group in situ vs 137 ms for this loop on the same group
        # (round-4 profiling, 158k-page corpus).  Scratch here stays
        # KB-sized (one searchsorted pos array per pair); integer counts
        # and the float division are identical, so outputs are
        # bit-identical to the tagged path.
        order, starts, ends = _runs(g)
        if starts.size == 0:
            return _VERIFIED_SCHEMA.empty_table()
        blobs = g["blob"].to_pylist()
        blobs_a_all = g["sh_a"].to_pylist()
        urls_all = g["url"].to_pylist()
        _empty = np.empty(0, dtype=np.uint32)
        pair_idx: list = []
        inter_l: list = []
        sz_a_l: list = []
        sz_b_l: list = []
        url_b: list = []
        sa_blobs: list = []
        hb_per_pair: list = []
        for s, e in zip(starts, ends):
            head = int(order[s])
            hb = blobs[head]
            sb = (np.frombuffer(hb, dtype=np.uint32)
                  if hb is not None else _empty)
            m = sb.size
            hurl = urls_all[head]
            for i in order[s + 1:e]:
                i = int(i)
                ab = blobs_a_all[i]
                sa = (np.frombuffer(ab, dtype=np.uint32)
                      if ab is not None else _empty)
                if m and sa.size:
                    pos = np.searchsorted(sb, sa)
                    np.clip(pos, 0, m - 1, out=pos)
                    inter = int((sb[pos] == sa).sum())
                else:
                    inter = 0
                pair_idx.append(i)
                inter_l.append(inter)
                sz_a_l.append(sa.size)
                sz_b_l.append(m)
                url_b.append(hurl)
                sa_blobs.append(ab)
                hb_per_pair.append(hb)
        inter = np.array(inter_l, dtype=np.int64)
        sz_a = np.array(sz_a_l, dtype=np.int64)
        sz_b = np.array(sz_b_l, dtype=np.int64)
        union = sz_a + sz_b - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        if keep_lo is not None:
            keep = (jac >= keep_lo) & (jac < keep_hi)
            kept_a = [b if k else None for b, k in zip(sa_blobs, keep)]
            kept_b = [b if k else None for b, k in zip(hb_per_pair, keep)]
        else:
            kept_a = [None] * len(sa_blobs)
            kept_b = kept_a
        pairs = g.take(pa.array(pair_idx))
        return pa.Table.from_arrays(
            [pairs["node_a"], pairs["node_b"], pairs["url_a"],
             pa.array(url_b, pa.string()), pairs["src"], pairs["est"],
             pa.array(kept_a, pa.binary()), pa.array(kept_b, pa.binary()),
             pa.array(jac, pa.float64())],
            schema=_VERIFIED_SCHEMA)

    return u2.groupby("pid").map_groups(attach_b_and_jaccard,
                                        batch_format="pyarrow")


# --- broadcast verify (small regime: blob index ray.put once) ---------------

#: per-worker cache of the deserialized blob index: the numpy members of
#: the tuple are zero-copy plasma views, but the url object array is
#: pickled — re-running ray.get per GROUP call would unpickle it ~128
#: times per run.  One entry only (clear-then-insert): holding the tuple
#: also pins the plasma buffer, so the cache must not accumulate indexes
#: across runs.
_BLOB_INDEX_CACHE: dict = {}


def _get_blob_index(ref):
    import ray

    key = ref.hex()
    val = _BLOB_INDEX_CACHE.get(key)
    if val is None:
        _BLOB_INDEX_CACHE.clear()
        nodes, row_of, offs, data, urls = ray.get(ref)
        # uint32 view computed ONCE per fetch: plasma buffers are
        # 64-byte aligned and every blob length is a multiple of 4, so
        # the zero-copy view holds; fall back to one copy otherwise
        # (defensive — never hit in practice).
        payload = data[:int(offs[-1])] if offs.size else data[:0]
        if payload.ctypes.data % 4:
            payload = payload.copy()
        du = payload.view(np.uint32)
        val = (nodes, row_of, offs >> 2, du, urls)
        _BLOB_INDEX_CACHE[key] = val
    return val


def build_blob_index(signatures, column: str = "shingles"):
    """Driver-collected node -> (verify blob, url) index, ``ray.put`` once.

    Returns an ObjectRef of ``(nodes_sorted i64, row_of_sorted i64,
    offsets i64, data u8, urls object-ndarray)``: the blob of node
    ``nodes_sorted[i]`` lives at row ``r = row_of_sorted[i]`` —
    ``data[offsets[r]:offsets[r+1]]``, a uint32-LE verify-set blob
    (zero-copy viewable — blob lengths are multiples of 4 so every
    offset is 4-aligned).  The permutation indirection keeps the build
    cheap: only the (8 B/doc) node array is sorted, the multi-GB blob
    payload is never gathered into sorted order (this build is serial
    driver time, so it dilutes scaling efficiency — measured 5.0 s ->
    ~2 s on a 1.8 GB index).  Size is bounded by the caller's dispatch
    (run_dedup routes to the broadcast strategy only under
    cfg.verify_broadcast_max_bytes); on a multi-node cluster the object
    ships once per node and every worker on it reads the same plasma
    copy zero-copy.
    """
    import ray

    tabs = list(signatures.select_columns(
        ["node_id", column, "url"]).iter_batches(
        batch_format="pyarrow", batch_size=65536))
    if tabs:
        tab = pa.concat_tables(tabs)
    else:
        tab = pa.table({"node_id": pa.array([], pa.int64()),
                        column: pa.array([], pa.binary()),
                        "url": pa.array([], pa.string())})
    # large_binary: int64 offsets — a >2 GB blob table (the budget is a
    # config knob) must not hit binary's int32 offset ceiling
    col = tab[column].cast(pa.large_binary()).combine_chunks()
    if col.null_count:
        col = col.fill_null(b"")
    off_buf = col.buffers()[1]
    data_buf = col.buffers()[2]
    offs = np.frombuffer(off_buf, dtype=np.int64)[
        col.offset: col.offset + len(col) + 1].copy()
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.empty(0, np.uint8))
    # every blob is a uint32-LE set (length % 4 == 0), so every offset is
    # 4-aligned — the consumer's zero-copy uint32 view depends on it
    if offs.size and ((offs[0] & 3) or (np.diff(offs) & 3).any()):
        raise ValueError("verify blob offsets are not 4-aligned")
    nodes_raw = tab["node_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(nodes_raw, kind="stable")
    urls = np.asarray(tab["url"].to_pylist(), dtype=object)
    return ray.put((nodes_raw[order], order.astype(np.int64), offs, data,
                    urls))


def verify_pairs_broadcast(candidates, signatures, cfg: PipelineConfig,
                           keep_lo: float | None = None,
                           keep_hi: float | None = None,
                           column: str = "shingles",
                           dedup_winnow_min_hits: int = 1,
                           dedup_winnow_est_min: float = 0.0):
    """Small-regime verify: cross-band dedup + exact Jaccard fused into
    the ONE pair-pid groupby the raw candidate union already carries.

    The signature blob table is ``ray.put`` once (:func:`build_blob_index`)
    and each group verifies its deduped pairs against zero-copy uint32
    views — the reduce path's two verify shuffle passes AND all
    signature-blob shuffle traffic disappear.  run_dedup routes here only
    while the blob table fits cfg.verify_broadcast_max_bytes (the
    10^12-doc regime always takes :func:`verify_pairs_reduce`).  Outputs
    are bit-identical to the reduce path: the dedup decisions run the
    same ``dedup_slim_pairs`` over the same complete pair-copy sets (all
    copies of a pair share its pair pid), and the Jaccard uses the same
    integer intersection counts and float division (asserted in
    tests/test_pipeline.py).
    """
    from eridu_ray.stages.candidates import dedup_slim_pairs

    index_ref = build_blob_index(signatures, column)

    def dedup_verify_group(g: pa.Table) -> pa.Table:
        slim = dedup_slim_pairs(g, dedup_winnow_min_hits,
                                dedup_winnow_est_min)
        m = slim.num_rows
        if m == 0:
            return _VERIFIED_SCHEMA.empty_table()
        nodes, row_of, offs4, du, urls = _get_blob_index(index_ref)
        na = slim["node_a"].to_numpy(zero_copy_only=False)
        nb = slim["node_b"].to_numpy(zero_copy_only=False)
        if nodes.size:
            ia = np.searchsorted(nodes, na)
            ib = np.searchsorted(nodes, nb)
            np.clip(ia, 0, nodes.size - 1, out=ia)
            np.clip(ib, 0, nodes.size - 1, out=ib)
            found = (nodes[ia] == na) & (nodes[ib] == nb)
        else:
            ia = ib = np.empty(0, np.int64)
            found = np.zeros(m, dtype=bool)
        if not found.all():
            # mirror the reduce path: a pair whose node has no signature
            # row is dropped (cannot happen for candidates derived from
            # signature reps; defensive for direct callers)
            slim = slim.filter(pa.array(found))
            ia, ib = ia[found], ib[found]
            m = slim.num_rows
            if m == 0:
                return _VERIFIED_SCHEMA.empty_table()
        ia = row_of[ia]  # sorted position -> physical row
        ib = row_of[ib]
        st_a, sz_a = offs4[ia], offs4[ia + 1] - offs4[ia]
        st_b, sz_b = offs4[ib], offs4[ib + 1] - offs4[ib]
        # per-pair searchsorted over zero-copy views of the broadcast
        # index, NOT the reduce path's tagged concat-and-merge: each
        # pair's search stays in small cache-resident arrays.  The
        # concatenated variant (one global searchsorted over
        # sum-of-blob-size tagged keys) was measured 36x SLOWER at
        # m=100k pairs x ~375-element blobs (105 s vs 2.9 s: every
        # binary-search probe misses cache in the 37M-key array, and
        # the gather allocates ~24 B/element of scratch).  The reduce
        # path keeps the tagged core because its groups arrive already
        # concatenated as Arrow blobs; here the index is random-access.
        inter = np.empty(m, np.int64)
        for k in range(m):
            sa = du[st_a[k]:st_a[k] + sz_a[k]]
            sb = du[st_b[k]:st_b[k] + sz_b[k]]
            if sa.size and sb.size:
                pos = np.searchsorted(sb, sa)
                np.clip(pos, 0, sb.size - 1, out=pos)
                inter[k] = int((sb[pos] == sa).sum())
            else:
                inter[k] = 0
        union = sz_a + sz_b - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = (np.zeros(m, dtype=bool) if keep_lo is None
                else (jac >= keep_lo) & (jac < keep_hi))
        kept_a = [du[st_a[k]:st_a[k] + sz_a[k]].tobytes()
                  if keep[k] else None for k in range(m)]
        kept_b = [du[st_b[k]:st_b[k] + sz_b[k]].tobytes()
                  if keep[k] else None for k in range(m)]
        return pa.Table.from_arrays(
            [slim["node_a"], slim["node_b"],
             pa.array(urls[ia].tolist(), pa.string()),
             pa.array(urls[ib].tolist(), pa.string()),
             slim["src"], slim["est"],
             pa.array(kept_a, pa.binary()), pa.array(kept_b, pa.binary()),
             pa.array(jac, pa.float64())],
            schema=_VERIFIED_SCHEMA)

    return candidates.groupby("pid").map_groups(dedup_verify_group,
                                                batch_format="pyarrow")
