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
from eridu_ray.stages.signatures import list_col_to_matrix

_PAIR_SCHEMA = pa.schema([
    ("node_a", pa.int64()),
    ("node_b", pa.int64()),
    ("url_a", pa.string()),
    ("url_b", pa.string()),
    ("src", pa.string()),
])


def _pairs_table(na, nb, ua, ub, src: str) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(na, pa.int64()), pa.array(nb, pa.int64()),
         pa.array(ua, pa.string()), pa.array(ub, pa.string()),
         pa.array([src] * len(na), pa.string())],
        schema=_PAIR_SCHEMA)


_EMPTY_PAIRS = _PAIR_SCHEMA.empty_table()


def empty_pairs() -> pa.Table:
    return _EMPTY_PAIRS


def _emit_group_pairs(node_id: np.ndarray, urls: list[str], cap: int,
                      src: str) -> pa.Table:
    """All-pairs within a bucket (clique if small, star beyond the cap)."""
    order = np.argsort(node_id, kind="stable")
    node_id = node_id[order]
    urls = [urls[i] for i in order]
    n = node_id.shape[0]
    if n < 2:
        return empty_pairs()
    if n <= cap:
        ii, jj = np.triu_indices(n, k=1)
    else:  # star fallback: hub = min node; O(n) pairs, keeps CC recall
        ii = np.zeros(n - 1, dtype=np.int64)
        jj = np.arange(1, n, dtype=np.int64)
    return _pairs_table(node_id[ii], node_id[jj],
                        [urls[i] for i in ii], [urls[j] for j in jj], src)


# --- exact (content hash) -------------------------------------------------

def exact_groups_fn(group: pa.Table) -> pa.Table:
    """map_groups over groupby('chash'): emit star edges + one representative.

    Output rows are the group's signature rows with an added bool column
    ``is_rep`` (True exactly once, for the min-node member) and the hub edge
    target ``rep_node``/``rep_url``; the pipeline splits this into the
    exact-duplicate edge list and the representative set that feeds LSH —
    one shuffle serves both (reference exact dedup:
    dropDuplicates semantics, eridu/etl/filter.py:51-54).
    """
    node = group["node_id"].to_numpy(zero_copy_only=False)
    rep_pos = int(np.argmin(node))
    n = group.num_rows
    is_rep = np.zeros(n, dtype=bool)
    is_rep[rep_pos] = True
    group = group.append_column("is_rep", pa.array(is_rep))
    group = group.append_column(
        "rep_node", pa.array(np.full(n, node[rep_pos]), pa.int64()))
    group = group.append_column(
        "rep_url",
        pa.array([group["url"][rep_pos].as_py()] * n, pa.string()))
    return group


# --- MinHash LSH bands ----------------------------------------------------

class BandExploder:
    """reps -> (band_key, node_id, url) rows, 16 per doc (map_batches)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             "node_id": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string())})
        sigs = list_col_to_matrix(batch["minhash"], cfg.num_perms)
        bk = band_keys(sigs, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)  # (n, b)
        keys = (bk >> np.uint64(1)).astype(np.int64).reshape(-1)
        node = np.repeat(batch["node_id"].to_numpy(zero_copy_only=False),
                         cfg.lsh_bands)
        urls = np.repeat(
            np.asarray(batch["url"].to_pylist(), dtype=object),
            cfg.lsh_bands)
        return pa.table({"band_key": pa.array(keys),
                         "node_id": pa.array(node),
                         "url": pa.array(urls, pa.string())})


def make_band_pairs_fn(cap: int):
    def band_pairs(group: pa.Table) -> pa.Table:
        node = group["node_id"].to_numpy(zero_copy_only=False)
        return _emit_group_pairs(node, group["url"].to_pylist(), cap,
                                 "minhash")
    return band_pairs


# --- SimHash chunk buckets (near-exact fallback) --------------------------

class SimhashChunkExploder:
    """reps -> (chunk_key, node_id, url, simhash) rows, 4 per doc.

    Pigeonhole: hamming <= cfg.simhash_max_hamming (3) over 64 bits split
    into 4 chunks guarantees at least one exact chunk match.
    """

    NCHUNKS = 4

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"chunk_key": pa.array([], pa.int64()),
                             "node_id": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string()),
                             "simhash": pa.array([], pa.int64())})
        simh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        chunks = simhash_chunks(simh, self.NCHUNKS)  # (n, 4) u64
        # chunk key = chunk value tagged by chunk index (disjoint keyspaces)
        keys = (chunks | (np.arange(self.NCHUNKS, dtype=np.uint64)
                          << np.uint64(48)))
        keys = keys.astype(np.int64).reshape(-1)
        node = np.repeat(batch["node_id"].to_numpy(zero_copy_only=False),
                         self.NCHUNKS)
        urls = np.repeat(
            np.asarray(batch["url"].to_pylist(), dtype=object), self.NCHUNKS)
        sims = np.repeat(simh.view(np.int64), self.NCHUNKS)
        return pa.table({"chunk_key": pa.array(keys),
                         "node_id": pa.array(node),
                         "url": pa.array(urls, pa.string()),
                         "simhash": pa.array(sims)})


def make_simhash_pairs_fn(cap: int, max_hamming: int):
    def simhash_pairs(group: pa.Table) -> pa.Table:
        node = group["node_id"].to_numpy(zero_copy_only=False)
        urls = group["url"].to_pylist()
        simh = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(node, kind="stable")
        node, simh = node[order], simh[order]
        urls = [urls[i] for i in order]
        n = node.shape[0]
        if n < 2:
            return empty_pairs()
        if n <= cap:
            ii, jj = np.triu_indices(n, k=1)
        else:
            ii = np.zeros(n - 1, dtype=np.int64)
            jj = np.arange(1, n, dtype=np.int64)
        ham = hamming_u64(simh[ii], simh[jj])
        keep = ham <= max_hamming
        ii, jj = ii[keep], jj[keep]
        return _pairs_table(node[ii], node[jj],
                            [urls[i] for i in ii], [urls[j] for j in jj],
                            "simhash")
    return simhash_pairs


# --- winnowing fingerprint buckets (long-shared-span candidates) ----------

class WinnowExploder:
    """reps -> (fp_key, node_id, url) rows, one per winnow fingerprint.

    Any two docs sharing a span >= winnow_window + k - 1 chars share at
    least one fingerprint (Schleimer et al. SIGMOD'03), so the groupby over
    fp_key yields complete candidates for the substring-dedup stage — the
    scalable stand-in for a corpus-wide suffix array.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        from eridu_ray.stages.signatures import list_col_to_arrays

        if batch.num_rows == 0:
            return pa.table({"fp_key": pa.array([], pa.int64()),
                             "node_id": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string())})
        values, offsets = list_col_to_arrays(batch["winnow"])
        counts = np.diff(offsets)
        keys = (values >> np.uint64(1)).astype(np.int64)
        node = np.repeat(batch["node_id"].to_numpy(zero_copy_only=False),
                         counts)
        urls = np.repeat(
            np.asarray(batch["url"].to_pylist(), dtype=object), counts)
        return pa.table({"fp_key": pa.array(keys),
                         "node_id": pa.array(node),
                         "url": pa.array(urls, pa.string())})


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
                "url": b["url"], "simhash": nulls_b}),
            pa.table({"family": pa.array(
                np.full(c.num_rows, self.FAM_CHUNK, np.int32)),
                "key": c["chunk_key"], "node_id": c["node_id"],
                "url": c["url"], "simhash": c["simhash"]}),
            pa.table({"family": pa.array(
                np.full(w.num_rows, self.FAM_WINNOW, np.int32)),
                "key": w["fp_key"], "node_id": w["node_id"],
                "url": w["url"], "simhash": nulls_w}),
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
    gate on membership (e.g. span verify requires a 'winnow' tag).
    """
    if group.num_rows == 1:
        return group
    src = ",".join(sorted(set(group["src"].to_pylist())))
    out = group.slice(0, 1).drop_columns(["src"])
    return out.append_column("src", pa.array([src], pa.string()))
