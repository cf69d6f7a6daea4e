"""Candidate-pair generation: exact hash groups, LSH bands, SimHash chunks.

The wide steps are explicit ``groupby`` shuffles with skew handling
(SURVEY.md §4: the reference leans on Spark AQE for skew,
eridu/etl/filter.py:33-35 — here the cap is explicit): a bucket with more
than ``cfg.band_group_cap`` docs emits *star* pairs (every member against
the minimum node) instead of the O(n²) clique.  Star pairs preserve
connected-component recall (any two members stay linked through the hub)
while bounding pair count linearly in the bucket size.

Empty-shingle docs never enter LSH/SimHash (their all-max signatures would
collide into one giant bucket — verified skew bomb); the exact content-hash
path dedups them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.minhash import band_keys
from eridu_ray.kernels.simhash import hamming_u64, simhash_chunks
from eridu_ray.kernels.mem import ensure_malloc_pool

ensure_malloc_pool()
from eridu_ray.stages.signatures import list_col_to_matrix

_PAIR_SCHEMA = pa.schema([
    ("node_a", pa.int64()),
    ("node_b", pa.int64()),
    ("url_a", pa.string()),
    ("url_b", pa.string()),
    ("src", pa.string()),
    # MinHash Jaccard estimate from the byte sketch co-located at
    # pair-emission time (null for winnow/span candidates).  Lets the
    # pipeline drop hopeless pairs BEFORE the shingle-blob verify joins —
    # the measured shuffle-bandwidth bottleneck (BASELINE.md round 1).
    ("est", pa.float64()),
])


_SLIM_PAIR_SCHEMA = pa.schema([
    ("node_a", pa.int64()),
    ("node_b", pa.int64()),
    ("src", pa.string()),
    ("est", pa.float64()),
])


def _pairs_table(na, nb, ua, ub, src, est=None) -> pa.Table:
    """src: one tag for every pair (str) or a per-pair sequence.

    ``ua is None`` emits the SLIM schema (no url columns): the flagship
    candidate path ships ids only — urls re-attach once per node inside
    the verify join, never once per pair (candidate pair rows outnumber
    verified pairs ~35:1 pre-guard, so url strings on pair rows were the
    bulk of the union+dedup shuffle payload).
    """
    n = len(na)
    est_arr = (pa.nulls(n, pa.float64()) if est is None
               else pa.array(np.asarray(est, dtype=np.float64)))
    src_arr = (pa.array([src] * n, pa.string()) if isinstance(src, str)
               else pa.array(list(src), pa.string()))
    if ua is None:
        return pa.Table.from_arrays(
            [pa.array(na, pa.int64()), pa.array(nb, pa.int64()),
             src_arr, est_arr],
            schema=_SLIM_PAIR_SCHEMA)
    return pa.Table.from_arrays(
        [pa.array(na, pa.int64()), pa.array(nb, pa.int64()),
         pa.array(ua, pa.string()), pa.array(ub, pa.string()),
         src_arr, est_arr],
        schema=_PAIR_SCHEMA)


_EMPTY_PAIRS = _PAIR_SCHEMA.empty_table()
_EMPTY_SLIM_PAIRS = _SLIM_PAIR_SCHEMA.empty_table()


def empty_pairs() -> pa.Table:
    return _EMPTY_PAIRS


def empty_slim_pairs() -> pa.Table:
    return _EMPTY_SLIM_PAIRS


def sketch_from_minhash(sigs: np.ndarray) -> pa.Array:
    """(n, P) uint64 signature matrix -> binary column of P-byte sketches.

    One byte per permutation slot (the low byte of the mixed minhash
    value).  Slot-agreement over the sketch estimates Jaccard with an
    upward bias of ~(1-J)/256 (accidental byte collisions) — negligible
    for prefiltering, and 8x cheaper to ship in every bucket row than the
    full signature.
    """
    by = (sigs & np.uint64(0xFF)).astype(np.uint8)
    buf, width = by.tobytes(order="C"), by.shape[1]
    return pa.array([buf[i * width:(i + 1) * width]
                     for i in range(by.shape[0])], pa.binary())


def _sketch_matrix(col) -> np.ndarray | None:
    """binary sketch column -> (n, P) uint8 matrix (None if absent/null)."""
    blobs = col.to_pylist()
    if not blobs or blobs[0] is None:
        return None
    return np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(
        len(blobs), -1)


def _bucket_pair_indices(node_id: np.ndarray, cap: int,
                         sketch: np.ndarray | None = None,
                         est_min: float | None = None,
                         simh: np.ndarray | None = None,
                         max_hamming: int | None = None):
    """(ii, jj, est, star) pair indices within one SORTED-by-node bucket.

    Clique below the cap, star (hub = min node) beyond it; optional
    simhash-hamming gate and sketch-estimate prefilter applied at
    emission.  ``star`` flags the fallback so callers can tag the pairs
    (a star bucket under-counts per-pair fingerprint hits, so the
    junk-pair guard must not apply its hit-count rule to them).
    """
    n = node_id.shape[0]
    if n < 2:
        return None
    star = n > cap
    if not star:
        ii, jj = np.triu_indices(n, k=1)
    else:  # star fallback: hub = min node; O(n) pairs, keeps CC recall
        ii = np.zeros(n - 1, dtype=np.int64)
        jj = np.arange(1, n, dtype=np.int64)
    if max_hamming is not None:
        keep = hamming_u64(simh[ii], simh[jj]) <= max_hamming
        ii, jj = ii[keep], jj[keep]
        if ii.size == 0:
            return None
    est = None
    if sketch is not None:
        est = (sketch[ii] == sketch[jj]).mean(axis=1)
        if est_min is not None:
            keep = est >= est_min
            ii, jj, est = ii[keep], jj[keep], est[keep]
            if ii.size == 0:
                return None
    return ii, jj, est, star


def _emit_group_pairs(node_id: np.ndarray, urls: list[str], cap: int,
                      src: str, sketch: np.ndarray | None = None,
                      est_min: float | None = None) -> pa.Table:
    """All-pairs within a bucket (clique if small, star beyond the cap).

    With a sketch matrix, each pair carries its MinHash Jaccard estimate
    and pairs below ``est_min`` are dropped at emission (identical to
    filtering after the cross-band dedup, since the sketch — hence the
    estimate — is the same for a pair no matter which bucket emitted it).
    Star-fallback pairs get the tag ``src + "*"`` (hit-count-exempt at
    the junk-pair guard — the star drops co-occurrence rows).
    """
    order = np.argsort(node_id, kind="stable")
    node_id = node_id[order]
    urls = [urls[i] for i in order]
    if sketch is not None:
        sketch = sketch[order]
    res = _bucket_pair_indices(node_id, cap, sketch=sketch,
                               est_min=est_min)
    if res is None:
        return empty_pairs()
    ii, jj, est, star = res
    return _pairs_table(node_id[ii], node_id[jj],
                        [urls[i] for i in ii], [urls[j] for j in jj],
                        src + "*" if star else src, est=est)


# --- exact (content hash) -------------------------------------------------

def exact_groups_fn(group: pa.Table) -> pa.Table:
    """map_groups over groupby('chash'): emit star edges + one representative.

    Output rows are the group's signature rows with an added bool column
    ``is_rep`` (True once per distinct content) and the hub edge target
    ``rep_node``/``rep_url``; the pipeline splits this into the
    exact-duplicate edge list and the representative set that feeds LSH —
    one shuffle serves both (reference exact dedup:
    dropDuplicates semantics, eridu/etl/filter.py:51-54).

    Distinct-content detection inside the hash group uses the SECOND
    independent content hash (``chash2``): together the keys form a
    128-bit identity, so a collision between distinct texts is ~2^-128
    per pair (negligible at 10^12 docs) and the exact path never ships
    or compares text bytes.  Fully vectorized (lexsort + run detection).
    """
    node = group["node_id"].to_numpy(zero_copy_only=False)
    n = group.num_rows
    if "chash2" in group.column_names and n > 1:
        ch2 = group["chash2"].to_numpy(zero_copy_only=False)
    else:
        ch2 = np.zeros(n, dtype=np.int64)
    order = np.lexsort((node, ch2))  # runs of equal chash2, min node first
    ch2_s = ch2[order]
    new_run = np.concatenate([[True], ch2_s[1:] != ch2_s[:-1]])
    starts = np.nonzero(new_run)[0]
    lens = np.diff(np.concatenate([starts, [n]]))
    rep_sorted_pos = np.repeat(starts, lens)     # per sorted row: its rep
    rep_row = order[rep_sorted_pos]              # original index of rep
    is_rep = np.zeros(n, dtype=bool)
    is_rep[order[starts]] = True
    rep_node = np.empty(n, dtype=np.int64)
    rep_node[order] = node[rep_row]
    inv = np.empty(n, dtype=np.int64)
    inv[order] = rep_row
    urls = group["url"]
    group = group.append_column("is_rep", pa.array(is_rep))
    group = group.append_column("rep_node", pa.array(rep_node, pa.int64()))
    group = group.append_column("rep_url", urls.take(pa.array(inv)))
    return group


def exact_groups_partition_fn(g: pa.Table) -> pa.Table:
    """Partition-level exact_groups_fn: groupby(pid of chash) with
    vectorized (chash, chash2) run detection — per-group overhead paid
    per pid, not per distinct content hash."""
    node = g["node_id"].to_numpy(zero_copy_only=False)
    ch = g["chash"].to_numpy(zero_copy_only=False)
    n = g.num_rows
    ch2 = (g["chash2"].to_numpy(zero_copy_only=False)
           if "chash2" in g.column_names else np.zeros(n, dtype=np.int64))
    order = np.lexsort((node, ch2, ch))
    ch_s, ch2_s = ch[order], ch2[order]
    new_run = np.concatenate(
        [[True], (ch_s[1:] != ch_s[:-1]) | (ch2_s[1:] != ch2_s[:-1])])
    starts = np.nonzero(new_run)[0]
    lens = np.diff(np.concatenate([starts, [n]]))
    rep_row = order[np.repeat(starts, lens)]
    is_rep = np.zeros(n, dtype=bool)
    is_rep[order[starts]] = True
    rep_node = np.empty(n, dtype=np.int64)
    rep_node[order] = node[rep_row]
    inv = np.empty(n, dtype=np.int64)
    inv[order] = rep_row
    g = g.append_column("is_rep", pa.array(is_rep))
    g = g.append_column("rep_node", pa.array(rep_node, pa.int64()))
    g = g.append_column("rep_url", g["url"].take(pa.array(inv)))
    return g


def _min_rep_per_group(tab: pa.Table) -> pa.Table:
    """One row per distinct (chash, chash2): the min rep_node + its url.

    Used to merge exact-index delta files (incremental v4): every file
    carries the min node over a disjoint member subset, so the running
    min over rows IS the union-run rep — order-independent."""
    ch = tab["chash"].to_numpy(zero_copy_only=False)
    ch2 = tab["chash2"].to_numpy(zero_copy_only=False)
    rn = tab["rep_node"].to_numpy(zero_copy_only=False)
    order = np.lexsort((rn, ch2, ch))
    ch_s, ch2_s = ch[order], ch2[order]
    first = np.concatenate(
        [[True], (ch_s[1:] != ch_s[:-1]) | (ch2_s[1:] != ch2_s[:-1])])
    return tab.take(pa.array(order[np.nonzero(first)[0]]))


def make_stateful_exact_fn(state_dir: str, prune: bool = True):
    """Exact-group fn over NEW docs' slim rows + the persisted prior
    exact-group index (incremental v4, pipelines/incremental.py).

    The index (``state_dir/exact/pid=N/``, one row per prior distinct
    ``(chash, chash2)``: the group's rep node + url, key-sorted) is read
    map-side — pruned to chashes the increment touches — and its rows
    re-enter the unchanged run-detection kernel as SYNTHETIC member rows
    (node=rep_node, url=rep_url, LSH columns null).  Because the prior
    rep is the min node over all prior members, the merged group's rep
    equals the union run's; edges to prior NON-rep members are not
    re-emitted — their connectivity is already carried by the fold's
    prior-component star edges (an exact group of size >= 2 always
    formed a non-singleton prior component).  Labels stay byte-identical
    to the union-shuffle path (tests/test_incremental.py); what
    disappears is the O(corpus)-row exact shuffle every fold."""
    import os

    import pyarrow.parquet as pq

    need = ["chash", "chash2", "rep_node", "rep_url"]

    def fn(g: pa.Table) -> pa.Table:
        pid = int(g["pid"][0].as_py())
        path = os.path.join(state_dir, "exact", f"pid={pid}")
        old = None
        if os.path.isdir(path):
            if prune:
                old = read_state_pruned(
                    path, need, "chash",
                    g["chash"].to_numpy(zero_copy_only=False))
            else:
                old = pq.read_table(path, columns=need).select(need)
        if old is not None and old.num_rows:
            old = _min_rep_per_group(old)
            cols = []
            for f in g.schema:
                if f.name == "chash":
                    cols.append(old["chash"].cast(f.type))
                elif f.name == "chash2":
                    cols.append(old["chash2"].cast(f.type))
                elif f.name == "node_id":
                    cols.append(old["rep_node"].cast(f.type))
                elif f.name == "url":
                    cols.append(old["rep_url"].cast(f.type))
                elif f.name == "pid":
                    cols.append(pa.array(
                        np.full(old.num_rows, pid, np.int64)).cast(f.type))
                elif f.name == "n_shingles":
                    # synthetic rows must never enter the explode
                    # branches (prior reps' explode rows live in the
                    # family state); the sig_reps n_shingles > 0 filter
                    # and _keep_new_nodes both exclude them
                    cols.append(pa.array(
                        np.zeros(old.num_rows, np.int64)).cast(f.type))
                else:
                    cols.append(pa.nulls(old.num_rows, f.type))
            g = pa.concat_tables(
                [g, pa.Table.from_arrays(cols, schema=g.schema)])
        return exact_groups_partition_fn(g)

    return fn


# --- MinHash LSH bands ----------------------------------------------------

class BandExploder:
    """reps -> (band_key, node_id[, url]) rows, 16 per doc (map_batches).

    ``with_url=False`` (the flagship path) omits the url column: explode
    rows outnumber docs 16:1, so a repeated url string per row is pure
    shuffle dead weight when the verify join re-attaches urls per node.
    """

    def __init__(self, cfg: PipelineConfig, with_url: bool = True):
        self.cfg = cfg
        self.with_url = with_url

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            cols = {"band_key": pa.array([], pa.int64()),
                    "node_id": pa.array([], pa.int64()),
                    "sketch": pa.array([], pa.binary())}
            if self.with_url:
                cols["url"] = pa.array([], pa.string())
            return pa.table(cols)
        sigs = list_col_to_matrix(batch["minhash"], cfg.num_perms)
        bk = band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)  # (n, b)
        keys = (bk >> np.uint64(1)).astype(np.int64).reshape(-1)
        node = np.repeat(batch["node_id"].to_numpy(zero_copy_only=False),
                         cfg.lsh_bands)
        sketch = sketch_from_minhash(sigs)
        sk_rep = sketch.take(pa.array(
            np.repeat(np.arange(n, dtype=np.int64), cfg.lsh_bands)))
        cols = {"band_key": pa.array(keys),
                "node_id": pa.array(node),
                "sketch": sk_rep}
        if self.with_url:
            cols["url"] = pa.array(np.repeat(
                np.asarray(batch["url"].to_pylist(), dtype=object),
                cfg.lsh_bands), pa.string())
        return pa.table(cols)


def make_band_pairs_fn(cap: int, est_min: float | None = None):
    def band_pairs(group: pa.Table) -> pa.Table:
        node = group["node_id"].to_numpy(zero_copy_only=False)
        return _emit_group_pairs(node, group["url"].to_pylist(), cap,
                                 "minhash",
                                 sketch=_sketch_matrix(group["sketch"]),
                                 est_min=est_min)
    return band_pairs


# --- SimHash chunk buckets (near-exact fallback) --------------------------

class SimhashChunkExploder:
    """reps -> (chunk_key, node_id, url, simhash) rows, 4 per doc.

    Pigeonhole: hamming <= cfg.simhash_max_hamming (3) over 64 bits split
    into 4 chunks guarantees at least one exact chunk match.
    """

    NCHUNKS = 4

    def __init__(self, cfg: PipelineConfig, with_url: bool = True):
        self.cfg = cfg
        self.with_url = with_url

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {"chunk_key": pa.array([], pa.int64()),
                    "node_id": pa.array([], pa.int64()),
                    "simhash": pa.array([], pa.int64()),
                    "sketch": pa.array([], pa.binary())}
            if self.with_url:
                cols["url"] = pa.array([], pa.string())
            return pa.table(cols)
        simh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        chunks = simhash_chunks(simh, self.NCHUNKS)  # (n, 4) u64
        # chunk key = chunk value tagged by chunk index (disjoint keyspaces)
        keys = (chunks | (np.arange(self.NCHUNKS, dtype=np.uint64)
                          << np.uint64(48)))
        keys = keys.astype(np.int64).reshape(-1)
        node = np.repeat(batch["node_id"].to_numpy(zero_copy_only=False),
                         self.NCHUNKS)
        sims = np.repeat(simh.view(np.int64), self.NCHUNKS)
        sigs = list_col_to_matrix(batch["minhash"], self.cfg.num_perms)
        sk_rep = sketch_from_minhash(sigs).take(pa.array(
            np.repeat(np.arange(n, dtype=np.int64), self.NCHUNKS)))
        cols = {"chunk_key": pa.array(keys),
                "node_id": pa.array(node),
                "simhash": pa.array(sims),
                "sketch": sk_rep}
        if self.with_url:
            cols["url"] = pa.array(np.repeat(
                np.asarray(batch["url"].to_pylist(), dtype=object),
                self.NCHUNKS), pa.string())
        return pa.table(cols)


def make_simhash_pairs_fn(cap: int, max_hamming: int,
                          est_min: float | None = None):
    def simhash_pairs(group: pa.Table) -> pa.Table:
        node = group["node_id"].to_numpy(zero_copy_only=False)
        urls = group["url"].to_pylist()
        simh = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        sketch = _sketch_matrix(group["sketch"])
        order = np.argsort(node, kind="stable")
        node, simh = node[order], simh[order]
        urls = [urls[i] for i in order]
        if sketch is not None:
            sketch = sketch[order]
        n = node.shape[0]
        if n < 2:
            return empty_pairs()
        star = n > cap
        if not star:
            ii, jj = np.triu_indices(n, k=1)
        else:
            ii = np.zeros(n - 1, dtype=np.int64)
            jj = np.arange(1, n, dtype=np.int64)
        ham = hamming_u64(simh[ii], simh[jj])
        keep = ham <= max_hamming
        ii, jj = ii[keep], jj[keep]
        est = None
        if sketch is not None:
            est = (sketch[ii] == sketch[jj]).mean(axis=1) if ii.size else \
                np.empty(0, dtype=np.float64)
            if est_min is not None:
                k2 = est >= est_min
                ii, jj, est = ii[k2], jj[k2], est[k2]
        return _pairs_table(node[ii], node[jj],
                            [urls[i] for i in ii], [urls[j] for j in jj],
                            "simhash*" if star else "simhash", est=est)
    return simhash_pairs


# --- winnowing fingerprint buckets (long-shared-span candidates) ----------

class WinnowExploder:
    """reps -> (fp_key, node_id, url) rows, one per winnow fingerprint.

    Any two docs sharing a span >= winnow_window + k - 1 chars share at
    least one fingerprint (Schleimer et al. SIGMOD'03), so the groupby over
    fp_key yields complete candidates for the substring-dedup stage — the
    scalable stand-in for a corpus-wide suffix array.
    """

    def __init__(self, cfg: PipelineConfig, with_url: bool = True):
        self.cfg = cfg
        self.with_url = with_url

    SKETCH_SLOTS = 32  # winnow rows are numerous (one per fingerprint):
                       # carry a quarter-width sketch — enough resolution
                       # (sigma ~0.087 at J=0.6) for the junk-pair rescue
                       # rule at a quarter of the traffic

    def __call__(self, batch: pa.Table) -> pa.Table:
        from eridu_ray.stages.signatures import (list_col_to_arrays,
                                                 list_col_to_matrix)

        if batch.num_rows == 0:
            cols = {"fp_key": pa.array([], pa.int64()),
                    "node_id": pa.array([], pa.int64()),
                    "sketch": pa.array([], pa.binary())}
            if self.with_url:
                cols["url"] = pa.array([], pa.string())
            return pa.table(cols)
        values, offsets = list_col_to_arrays(batch["winnow"])
        counts = np.diff(offsets)
        keys = (values >> np.uint64(1)).astype(np.int64)
        node = np.repeat(batch["node_id"].to_numpy(zero_copy_only=False),
                         counts)
        if "minhash" in batch.column_names:
            sigs = list_col_to_matrix(batch["minhash"], self.cfg.num_perms)
            sk = sketch_from_minhash(sigs[:, :self.SKETCH_SLOTS])
            sk_rep = sk.take(pa.array(np.repeat(
                np.arange(batch.num_rows, dtype=np.int64), counts)))
        else:
            # winnow-only signatures (substring family): no sketch —
            # its only consumer is the est rescue rule, which that
            # family never enables (_sketch_matrix handles the nulls)
            sk_rep = pa.nulls(int(counts.sum()), pa.binary())
        cols = {"fp_key": pa.array(keys),
                "node_id": pa.array(node),
                "sketch": sk_rep}
        if self.with_url:
            cols["url"] = pa.array(np.repeat(
                np.asarray(batch["url"].to_pylist(), dtype=object),
                counts), pa.string())
        return pa.table(cols)


def make_winnow_pairs_fn(cap: int):
    def winnow_pairs(group: pa.Table) -> pa.Table:
        node = group["node_id"].to_numpy(zero_copy_only=False)
        return _emit_group_pairs(node, group["url"].to_pylist(), cap,
                                 "winnow")
    return winnow_pairs


# --- fused bucket explode (one shuffle for all three families) ------------

class FusedBucketExploder:
    """reps -> (family:int32, key:int64, node_id, url, simhash) rows for
    the LSH-band, SimHash-chunk and span-fingerprint families at once.

    One map produces all bucket rows and ONE groupby(['family','key'])
    co-locates them — replacing three separate explode+sort shuffles
    (each wide op costs seconds of fixed latency regardless of data size,
    which is what caps small-corpus scaling efficiency).
    """

    FAM_BAND, FAM_CHUNK, FAM_WINNOW = 0, 1, 2

    def __init__(self, cfg: PipelineConfig):
        self.band = BandExploder(cfg)
        self.chunk = SimhashChunkExploder(cfg)
        self.winnow = WinnowExploder(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = self.band(batch)
        c = self.chunk(batch)
        w = self.winnow(batch)
        nulls_b = pa.nulls(b.num_rows, pa.int64())
        nulls_w = pa.nulls(w.num_rows, pa.int64())
        return pa.concat_tables([
            pa.table({"family": pa.array(
                np.full(b.num_rows, self.FAM_BAND, np.int32)),
                "key": b["band_key"], "node_id": b["node_id"],
                "url": b["url"], "simhash": nulls_b,
                "sketch": b["sketch"]}),
            pa.table({"family": pa.array(
                np.full(c.num_rows, self.FAM_CHUNK, np.int32)),
                "key": c["chunk_key"], "node_id": c["node_id"],
                "url": c["url"], "simhash": c["simhash"],
                "sketch": c["sketch"]}),
            pa.table({"family": pa.array(
                np.full(w.num_rows, self.FAM_WINNOW, np.int32)),
                "key": w["fp_key"], "node_id": w["node_id"],
                "url": w["url"], "simhash": nulls_w,
                "sketch": w["sketch"]}),
        ])


def make_fused_pairs_fn(cfg: PipelineConfig):
    """map_groups over groupby(['family','key']): dispatch per family."""
    band_fn = make_band_pairs_fn(cfg.band_group_cap)
    sim_fn = make_simhash_pairs_fn(cfg.band_group_cap,
                                   cfg.simhash_max_hamming)
    win_fn = make_winnow_pairs_fn(cfg.winnow_group_cap)

    def fused_pairs(group: pa.Table) -> pa.Table:
        fam = group["family"][0].as_py()
        if fam == FusedBucketExploder.FAM_BAND:
            return band_fn(group)
        if fam == FusedBucketExploder.FAM_CHUNK:
            return sim_fn(group)
        return win_fn(group)

    return fused_pairs


# --- cross-band pair dedup ------------------------------------------------

def dedup_pairs_fn(group: pa.Table) -> pa.Table:
    """map_groups over groupby(['node_a','node_b']): keep one row.

    The kept row's ``src`` is the sorted union of all source tags
    ("minhash,winnow", ...) — deterministic regardless of input order (D1
    keep-first semantics made order-independent), and downstream stages
    gate on membership (e.g. span verify requires a 'winnow' tag).  ``est``
    is the max non-null estimate across branches (identical values when
    several sketch-bearing branches emitted the pair).
    """
    if group.num_rows == 1:
        return group
    src = ",".join(sorted(set(group["src"].to_pylist())))
    ests = [e for e in group["est"].to_pylist() if e is not None]
    est = pa.array([max(ests) if ests else None], pa.float64())
    out = group.slice(0, 1).drop_columns(["src", "est"])
    out = out.append_column("src", pa.array([src], pa.string()))
    return out.append_column("est", est)


# --- salted hot buckets (pair-emitting ops) --------------------------------
#
# The flagship needs only connected-COMPONENT recall, so its giant buckets
# take the O(n) star fallback above.  The pair-emitting operators
# (text_dedup.minhash_lsh_pairs etc.) must return the PAIRS themselves, so
# a hot bucket is instead *salted*: SURVEY.md §7.3's (band_key, node_hash
# % s) idea realized as triangle partitioning — members split into s
# sub-groups by node hash; the member of sub u is re-emitted to the s
# buckets (min(u,v), max(u,v)) for v in 0..s-1, so every pair (subs p, q)
# co-locates in EXACTLY one sub-bucket (p, q) and clique enumeration
# splits across s(s+1)/2 tasks of ~2·cap docs — no silent pair loss.

def hot_bucket_salts(exploded, key_col: str, cap: int) -> dict:
    """Cheap pre-count over bucket keys -> {key: s} for buckets > cap.

    The count shuffle moves only (key, node) rows; the hot-key list
    collected to the driver is tiny by definition (buckets > cap).
    """
    counts = (exploded.groupby(key_col).count()
              .rename_columns({"count()": "n"})
              .filter(expr=f"n > {cap}"))
    return {int(r[key_col]): int(np.ceil(r["n"] / cap))
            for r in counts.take_all()}


def make_salted_explode(key_col: str, salts: dict, seed: int):
    """map_batches fn: rows -> (salt_key, node_id, url, sketch, sub, bp, bq).

    Cold-bucket rows pass through once with (sub, bp, bq) = 0; hot-bucket
    rows replicate into their s triangle buckets.  salt_key mixes
    (key, bp, bq) so sub-buckets shuffle independently.
    """
    from eridu_ray.kernels.hashing import splitmix64

    hot_keys = (np.fromiter(salts.keys(), dtype=np.int64, count=len(salts))
                if salts else np.empty(0, dtype=np.int64))

    def f(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        has_simhash = "simhash" in batch.column_names
        hot_mask = (np.isin(keys, hot_keys) if hot_keys.size
                    else np.zeros(n, dtype=bool))
        zeros32 = pa.array(np.zeros(int((~hot_mask).sum()), np.int32))
        cold = batch.filter(pa.array(~hot_mask))
        # cold keys go through the same mix (tag 0) so a mixed hot
        # sub-bucket key can never alias an untouched cold key
        cold_keys = (splitmix64(
            cold[key_col].to_numpy(zero_copy_only=False).astype(np.uint64))
            >> np.uint64(1)).astype(np.int64)
        cold_cols = {
            "salt_key": pa.array(cold_keys),
            "node_id": cold["node_id"],
            "url": cold["url"],
            "sketch": cold["sketch"],
            "sub": zeros32, "bp": zeros32, "bq": zeros32,
        }
        if has_simhash:
            cold_cols["simhash"] = cold["simhash"]
        cold_tab = pa.table(cold_cols)  # canonical column order (simhash last)
        if not hot_mask.any():
            return cold_tab
        hot = batch.filter(pa.array(hot_mask))
        node = hot["node_id"].to_numpy(zero_copy_only=False)
        urls = hot["url"].to_pylist()
        sketches = hot["sketch"].to_pylist()
        simhashes = (hot["simhash"].to_pylist() if has_simhash
                     else [None] * hot.num_rows)
        hkeys = hot[key_col].to_numpy(zero_copy_only=False)
        o_key, o_node, o_url, o_sk, o_sh, o_sub, o_bp, o_bq = \
            [], [], [], [], [], [], [], []
        for i in range(hot.num_rows):
            k = int(hkeys[i])
            s = salts[k]
            u = int(splitmix64(np.uint64(node[i]) ^ np.uint64(seed))
                    % np.uint64(s))
            for v in range(s):
                p, q = (u, v) if u <= v else (v, u)
                mixed = int(splitmix64(
                    np.uint64(k) ^ (np.uint64(p * s + q + 1)
                                    << np.uint64(40))) >> np.uint64(1))
                o_key.append(mixed)
                o_node.append(node[i])
                o_url.append(urls[i])
                o_sk.append(sketches[i])
                o_sh.append(simhashes[i])
                o_sub.append(u)
                o_bp.append(p)
                o_bq.append(q)
        hot_cols = {
            "salt_key": pa.array(o_key, pa.int64()),
            "node_id": pa.array(o_node, pa.int64()),
            "url": pa.array(o_url, pa.string()),
            "sketch": pa.array(o_sk, pa.binary()),
            "sub": pa.array(o_sub, pa.int32()),
            "bp": pa.array(o_bp, pa.int32()),
            "bq": pa.array(o_bq, pa.int32()),
        }
        if has_simhash:
            hot_cols["simhash"] = pa.array(o_sh, pa.int64())
        hot_tab = pa.table(hot_cols)  # same canonical order as cold_tab
        return pa.concat_tables([cold_tab, hot_tab])

    return f


def make_salted_pairs_fn(src: str, est_min: float | None = None,
                         max_hamming: int | None = None):
    """map_groups over groupby('salt_key'): exact clique/cross pairs.

    Buckets with bp == bq (all cold buckets, and on-diagonal sub-buckets)
    emit the upper-triangle clique of their members; off-diagonal
    sub-buckets emit only cross pairs between sub bp and sub bq members —
    together exactly the clique of the original hot bucket, once each.
    ``max_hamming`` additionally gates pairs on simhash hamming distance
    (the SimHash pair op's semantics).
    """
    def fn(group: pa.Table) -> pa.Table:
        node = group["node_id"].to_numpy(zero_copy_only=False)
        urls = group["url"].to_pylist()
        sketch = _sketch_matrix(group["sketch"])
        bp = group["bp"][0].as_py()
        bq = group["bq"][0].as_py()
        n = node.shape[0]
        if n < 2:
            return empty_pairs()
        if bp == bq:
            ii, jj = np.triu_indices(n, k=1)
        else:
            sub = group["sub"].to_numpy(zero_copy_only=False)
            ia = np.nonzero(sub == bp)[0]
            ib = np.nonzero(sub == bq)[0]
            if ia.size == 0 or ib.size == 0:
                return empty_pairs()
            ii = np.repeat(ia, ib.size)
            jj = np.tile(ib, ia.size)
        if max_hamming is not None:
            simh = group["simhash"].to_numpy(
                zero_copy_only=False).view(np.uint64)
            keep = hamming_u64(simh[ii], simh[jj]) <= max_hamming
            ii, jj = ii[keep], jj[keep]
            if ii.size == 0:
                return empty_pairs()
        est = None
        if sketch is not None:
            est = (sketch[ii] == sketch[jj]).mean(axis=1)
            if est_min is not None:
                keep = est >= est_min
                ii, jj, est = ii[keep], jj[keep], est[keep]
        # canonical orientation node_a < node_b (dedup key across buckets)
        swap = node[ii] > node[jj]
        ii2 = np.where(swap, jj, ii)
        jj2 = np.where(swap, ii, jj)
        return _pairs_table(node[ii2], node[jj2],
                            [urls[i] for i in ii2],
                            [urls[j] for j in jj2], src, est=est)

    return fn


# --- partitioned bucket grouping (group-count amortization) ----------------
#
# groupby(bucket_key).map_groups pays ~17 µs of per-group overhead; LSH /
# winnow keyspaces have ~one bucket per exploded row (mostly singletons),
# so at 10^5-10^6 buckets the overhead dwarfs the actual pair work
# (measured: the three candidate branches = 30 of 43 s at sf0.1).  The
# fix: shuffle on pid = hash(bucket_key) % P (P ~ hundreds), then inside
# each partition detect equal-key runs VECTORIZED (lexsort + diff) and
# pay Python per-bucket cost only for the few buckets with >= 2 members.
# Same co-location guarantee (equal key -> equal pid), same output pairs.

def add_pid(ds, key_col: str, num_buckets: int):
    """Append pid = splitmix64(key) % num_buckets (map_batches)."""
    from eridu_ray.kernels.hashing import splitmix64

    def f(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        pid = (splitmix64(keys) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("pid", pa.array(pid))

    return ds.map_batches(f, batch_format="pyarrow")


def append_pair_pid(tab: pa.Table, num_buckets: int) -> pa.Table:
    """pid = hash(node_a, node_b) % num_buckets appended to a pair table
    (the same mix as :func:`add_pair_pid`)."""
    from eridu_ray.kernels.hashing import splitmix64

    a = tab["node_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = tab["node_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    pid = (splitmix64(splitmix64(a) ^ b)
           % np.uint64(num_buckets)).astype(np.int32)
    return tab.append_column("pid", pa.array(pid))


def read_state_pruned(path: str, need: list, key_col: str,
                      new_keys: np.ndarray) -> pa.Table | None:
    """Key-pruned read of one persisted explode partition (incremental
    v3, pipelines/incremental.py): scan the key COLUMN of each file
    (~8 B/row against the sketch-dominated full row), keep only rows
    whose bucket key appears among ``new_keys``, and read the remaining
    columns for just the row groups containing such rows.

    Because ``build_incremental_state`` writes each partition SORTED by
    the bucket key, a touched key's rows are contiguous — the touched
    row-group set stays proportional to the touched keys, so both I/O
    and the downstream pair-kernel cost scale with the increment's
    bucket overlap rather than the prior corpus.  Correctness does not
    depend on the sort (an unsorted v2 state reads more row groups but
    filters to the identical row set)."""
    import glob
    import os

    import pyarrow.parquet as pq

    nk = np.unique(np.asarray(new_keys))
    out = []
    for fp in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(fp)
        kcol = pf.read(columns=[key_col])[key_col].to_numpy(
            zero_copy_only=False)
        if len(kcol) == 0 or len(nk) == 0:
            continue
        pos = np.searchsorted(nk, kcol)
        pos[pos == len(nk)] = 0
        hit = nk[pos] == kcol
        if not hit.any():
            continue
        if hit.all():
            # dense overlap (the synthetic-corpus regime): every bucket
            # is touched — skip the row-group machinery entirely
            out.append(pf.read(columns=need))
            continue
        bounds = np.cumsum([pf.metadata.row_group(i).num_rows
                            for i in range(pf.num_row_groups)])
        hit_idx = np.flatnonzero(hit)
        rgs = np.unique(np.searchsorted(bounds, hit_idx, "right"))
        t = pf.read_row_groups([int(r) for r in rgs], columns=need)
        starts = np.r_[0, bounds][rgs]
        lens = bounds[rgs] - starts
        local = np.concatenate([np.arange(s, s + n)
                                for s, n in zip(starts, lens)])
        out.append(t.filter(pa.array(hit[local])))
    return pa.concat_tables(out) if out else None


def make_stateful_pairs_fn(state_dir: str, family: str, inner_fn,
                           key_col: str, with_simhash: bool = False,
                           prune: bool = True):
    """Wrap a pair-emission fn with a map-side read of the persisted
    prior explode partition (incremental v2/v3, pipelines/incremental.py).

    The group arriving from ``groupby("pid")`` carries only the NEW
    docs' explode rows; the prior corpus's rows for the same pid are
    read from ``state_dir/family/pid=N/`` (hive-partitioned Parquet
    written by ``build_incremental_state``) inside the task and
    concatenated before the unchanged pair kernel runs — so bucket
    membership, caps and salting see exactly the union-run rows, and
    the prior rows never enter a shuffle.  On a multi-node cluster the
    state dir must be shared storage (each pid partition is read by
    exactly one task per fold).

    With ``prune`` (v3, the default), only prior rows whose bucket key
    is TOUCHED by a new row are loaded (:func:`read_state_pruned`).
    Label-identity argument: an untouched bucket contributes only
    pairs whose both endpoints are prior docs, and every such pair is
    dropped by the fold's ``skip_pairs_both_in`` filter before verify
    — while every touched bucket keeps its full union-run membership,
    so caps, salting and est-prefilter behave identically there.
    Byte-identical labels across full/v1/v2/v3 are gated in
    tests/test_incremental.py."""
    import os

    import pyarrow.parquet as pq

    need = [key_col, "node_id", "sketch"] + (
        ["simhash"] if with_simhash else [])

    def fn(g: pa.Table) -> pa.Table:
        pid = int(g["pid"][0].as_py())
        gt = g.select(need)
        path = os.path.join(state_dir, family, f"pid={pid}")
        if os.path.isdir(path):
            if prune:
                old = read_state_pruned(
                    path, need, key_col,
                    gt[key_col].to_numpy(zero_copy_only=False))
            else:
                old = pq.read_table(path, columns=need).select(need)
            if old is not None and old.num_rows:
                gt = pa.concat_tables([gt, old.select(need).cast(
                    gt.schema)])
        return inner_fn(gt)

    return fn


def make_partition_pairs_fn(key_col: str, cap: int, src: str,
                            est_min: float | None = None,
                            with_simhash: bool = False,
                            max_hamming: int | None = None,
                            pair_pid_buckets: int | None = None):
    """map_groups over groupby('pid'): emit SLIM pairs for every bucket run.

    Output is the slim (node_a, node_b, src, est) schema — no urls ride
    on candidate pair rows; the verify join re-attaches urls once per
    node from the signature table.  ``pair_pid_buckets`` additionally
    emits the cross-branch dedup pid at pair-creation time, so the
    three-way candidate union feeds its groupby directly instead of
    paying a separate :func:`add_pair_pid` pass over the pre-dedup pair
    rows (the largest intermediate, ~35:1 vs verified pairs).
    """

    def _out(tab: pa.Table) -> pa.Table:
        return (tab if pair_pid_buckets is None
                else append_pair_pid(tab, pair_pid_buckets))

    def fn(g: pa.Table) -> pa.Table:
        keys = g[key_col].to_numpy(zero_copy_only=False)
        node = g["node_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((node, keys))  # key runs, pre-sorted by node
        keys_s = keys[order]
        node_s = node[order]
        n = keys_s.shape[0]
        if n < 2:
            return _out(empty_slim_pairs())
        bnd = np.nonzero(keys_s[1:] != keys_s[:-1])[0] + 1
        starts = np.concatenate([[0], bnd])
        ends = np.concatenate([bnd, [n]])
        multi = np.nonzero(ends - starts >= 2)[0]
        if multi.size == 0:
            return _out(empty_slim_pairs())
        sketch = None
        if "sketch" in g.column_names:
            sk = _sketch_matrix(g["sketch"])
            sketch = sk[order] if sk is not None else None
        simh_s = None
        if with_simhash:
            simh_s = g["simhash"].to_numpy(
                zero_copy_only=False).view(np.uint64)[order]
        out_ii, out_jj, out_est, out_src = [], [], [], []
        star_src = src + "*"
        for r in multi:
            s, e = int(starts[r]), int(ends[r])
            res = _bucket_pair_indices(
                node_s[s:e], cap,
                sketch=None if sketch is None else sketch[s:e],
                est_min=est_min,
                simh=None if simh_s is None else simh_s[s:e],
                max_hamming=max_hamming)
            if res is None:
                continue
            ii, jj, est, star = res
            out_ii.append(ii + s)
            out_jj.append(jj + s)
            out_src.append((star_src if star else src, ii.size))
            if est is not None:
                out_est.append(est)
        if not out_ii:
            return _out(empty_slim_pairs())
        ii = np.concatenate(out_ii)
        jj = np.concatenate(out_jj)
        est = np.concatenate(out_est) if out_est else None
        srcs = ([t for tag, cnt in out_src for t in (tag,) * cnt]
                if any(tag != src for tag, _ in out_src) else src)
        return _out(_pairs_table(node_s[ii], node_s[jj], None, None, srcs,
                                 est=est))

    return fn


def dedup_pairs_partition_fn(g: pa.Table) -> pa.Table:
    return make_dedup_pairs_partition_fn()(g)


def make_dedup_pairs_partition_fn(winnow_min_hits: int = 1,
                                  winnow_est_min: float = 0.0):
    """Partition-level cross-band pair dedup (same semantics as
    dedup_pairs_fn): vectorized (node_a, node_b) run detection; unique
    pairs pass through zero-copy, duplicate runs merge src tags (sorted
    union) and take the max non-null est.

    ``winnow_min_hits`` > 1 drops WINNOW-ONLY pairs that shared fewer
    than that many distinct fingerprints AND whose sketch estimate is
    below ``winnow_est_min``: a true NON-repetitive span of
    3*window+k-1 = 196 < min_shared_span chars shares >= 2 bigram
    fingerprints, a REPETITIVE span >= ~2*window shares >= 2 repetition
    markers (kernels.shingle.repetition_marker_fps — ADVICE r2 case a),
    borderline near-dups caught by a single fingerprint survive via the
    estimate, and single-fp common-vocab collisions (the junk-pair storm
    on dense-vocab corpora: measured 4.2M junk candidates x 22KB blobs)
    never reach the verify shuffle.  Pairs emitted by a star-fallback
    bucket carry the tag "winnow*" and are EXEMPT from the hit count
    (ADVICE r2 case b: the star drops co-occurrence rows, so the count
    under-states true sharing); the guard key below is the exact tag
    "winnow", so starred pairs pass through.
    """
    def fn(g: pa.Table) -> pa.Table:
        return dedup_slim_pairs(g, winnow_min_hits, winnow_est_min)

    return fn


def dedup_slim_pairs(g: pa.Table, winnow_min_hits: int = 1,
                     winnow_est_min: float = 0.0) -> pa.Table:
    """Cross-band (node_a, node_b) pair dedup over ONE table slice.

    Correct wherever every copy of a pair is present in the slice —
    a pair-pid partition (make_dedup_pairs_partition_fn) or a verify
    pass-1 node_a group (all copies of (a, b) share node_a, so the
    node_a-keyed shuffle already co-locates them; verify_pairs_reduce
    fuses this in to skip the separate pair-pid sort over the pre-dedup
    pair set, the flagship's largest intermediate).
    """
    import pyarrow.compute as pc

    a = g["node_a"].to_numpy(zero_copy_only=False)
    b = g["node_b"].to_numpy(zero_copy_only=False)
    n = a.shape[0]
    if n == 0:
        return empty_slim_pairs()
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    new_run = np.concatenate(
        [[True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])])
    starts = np.nonzero(new_run)[0]
    ends = np.concatenate([starts[1:], [n]])
    lens = ends - starts
    is_winnow = pc.equal(g["src"], "winnow").to_numpy(
        zero_copy_only=False)
    est_np = g["est"].to_numpy(zero_copy_only=False).astype(np.float64)
    singles = starts[lens == 1]
    parts = []
    if singles.size:
        keep = order[singles]
        if winnow_min_hits > 1:
            # lone winnow hit: junk unless the sketch estimate says
            # the pair may reach the borderline window
            rescued = est_np[keep] >= winnow_est_min  # NaN -> False
            keep = keep[~is_winnow[keep] | rescued]
        if keep.size:
            parts.append(g.take(pa.array(keep)))
    multi = np.nonzero(lens >= 2)[0]
    if multi.size:
        srcs = g["src"].to_pylist()
        na, nb, ms, me = [], [], [], []
        for r in multi:
            s, e = int(starts[r]), int(ends[r])
            rows = order[s:e]
            tags = set()
            whits = 0
            best = None
            for i in rows:
                tags.update(srcs[i].split(","))
                if is_winnow[i]:
                    whits += 1
                v = est_np[i]
                if v == v and (best is None or v > best):
                    best = v
            if (tags == {"winnow"} and whits < winnow_min_hits
                    and not (best is not None
                             and best >= winnow_est_min)):
                continue
            first = int(rows[0])
            na.append(a[first])
            nb.append(b[first])
            ms.append(",".join(sorted(tags)))
            me.append(best)
        if na:
            parts.append(pa.Table.from_arrays(
                [pa.array(na, pa.int64()), pa.array(nb, pa.int64()),
                 pa.array(ms, pa.string()),
                 pa.array(me, pa.float64())],
                schema=_SLIM_PAIR_SCHEMA))
    if not parts:
        return empty_slim_pairs()
    return pa.concat_tables(
        [p.select(_SLIM_PAIR_SCHEMA.names) for p in parts])



def add_pair_pid(ds, num_buckets: int):
    """pid = hash(node_a, node_b) % num_buckets for pair-dedup co-location."""
    from eridu_ray.kernels.hashing import splitmix64

    def f(b: pa.Table) -> pa.Table:
        a = b["node_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = b["node_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pid = (splitmix64(splitmix64(a) ^ bb)
               % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("pid", pa.array(pid))

    return ds.map_batches(f, batch_format="pyarrow")
