"""Approximate-nearest-neighbor search over an embedding column.

Two paths over ``embeddings(vec_id, embedding: list<float>)``:

- brute-force cosine top-k (the baseline): broadcast the L2-normalized
  query matrix once via ``ray.put``, per-batch matmul + partial top-k,
  then a global per-query top-k — one shuffle over tiny partials
  (relational.q_embedding_topk is the oracle-paired variant).
- IVF (inverted-file) top-k (the scale path): k-means-style coarse
  centroids trained on a seeded sample, every vector assigned to its
  nearest centroid in one map_batches pass, queries probe only the
  ``nprobe`` closest cells — at 10^12 scale the probe is a semi-join on
  cell id instead of a full scan.  Recall < 1 by design; tests measure
  it against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    c = batch[col]
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_centroids(emb_ds, n_centroids: int, seed: int = 31337,
                    iters: int = 5, sample_size: int = 4096) -> np.ndarray:
    """Mini k-means on a deterministic sample (driver-side; the sample is
    bounded, the corpus is not materialized)."""
    sample = pa.concat_tables(
        b for b in emb_ds.limit(sample_size).iter_batches(
            batch_format="pyarrow", batch_size=1024))
    x = _normalize(_matrix(sample))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]),
                        replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def assign_cells(emb_ds, centroids: np.ndarray):
    """Add a ``cell`` column = nearest centroid id (one vectorized pass)."""
    import ray

    cref = ray.put(centroids)

    def f(b: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        m = _normalize(_matrix(b))
        cell = (m @ cent.T).argmax(axis=1).astype(np.int32)
        return b.append_column("cell", pa.array(cell))

    return emb_ds.map_batches(f, batch_format="pyarrow", batch_size=1024)


def ivf_topk(emb_ds, query_ids, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, seed: int = 31337):
    """IVF cosine top-k: returns (query_id, vec_id, sim) for each query.

    Scale notes: the celled dataset would be written partitioned by
    ``cell`` so a query reads only nprobe partitions; here the probe is a
    vectorized in-batch filter (same dataflow, single node).
    """
    import ray

    cent = train_centroids(emb_ds, n_centroids, seed=seed)
    celled = assign_cells(emb_ds, cent)

    qtab = pa.concat_tables(
        b for b in emb_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=4096))
    qmask = np.isin(qtab["vec_id"].to_numpy(zero_copy_only=False),
                    np.asarray(query_ids))
    qtab = qtab.filter(pa.array(qmask))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    qmat = _normalize(_matrix(qtab))
    # cells each query probes
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    qref = ray.put((qids, qmat, qcells))

    def probe(b: pa.Table) -> pa.Table:
        qi, qm, qc = ray.get(qref)
        m = _normalize(_matrix(b))
        vids = b["vec_id"].to_numpy(zero_copy_only=False)
        cells = b["cell"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        sims = m @ qm.T  # (batch, nq)
        for j in range(qi.shape[0]):
            in_probe = np.isin(cells, qc[j]) & (vids != qi[j])
            if not in_probe.any():
                continue
            s = sims[in_probe, j]
            vv = vids[in_probe]
            top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([qi[j]] * top.size)
            out_v.extend(vv[top])
            out_s.extend(s[top])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    def final_topk(g: pa.Table) -> pa.Table:
        s = g["sim"].to_numpy(zero_copy_only=False)
        v = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": g["query_id"].take(pa.array(order)),
            "vec_id": pa.array(v[order]),
            "sim": pa.array(s[order]),
        })

    return (celled.map_batches(probe, batch_format="pyarrow",
                               batch_size=1024)
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pyarrow"))


def brute_topk(emb_ds, query_ids, k: int = 10):
    """Brute-force baseline returning (query_id, vec_id, sim)."""
    import ray

    qtab = pa.concat_tables(
        b for b in emb_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=4096))
    qmask = np.isin(qtab["vec_id"].to_numpy(zero_copy_only=False),
                    np.asarray(query_ids))
    qtab = qtab.filter(pa.array(qmask))
    qids = qtab["vec_id"].to_numpy(zero_copy_only=False)
    qmat = _normalize(_matrix(qtab))
    qref = ray.put((qids, qmat))

    def partial(b: pa.Table) -> pa.Table:
        qi, qm = ray.get(qref)
        m = _normalize(_matrix(b))
        vids = b["vec_id"].to_numpy(zero_copy_only=False)
        sims = m @ qm.T
        out_q, out_v, out_s = [], [], []
        for j in range(qi.shape[0]):
            mask = vids != qi[j]
            s, vv = sims[mask, j], vids[mask]
            top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([qi[j]] * top.size)
            out_v.extend(vv[top])
            out_s.extend(s[top])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    def final_topk(g: pa.Table) -> pa.Table:
        s = g["sim"].to_numpy(zero_copy_only=False)
        v = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": g["query_id"].take(pa.array(order)),
            "vec_id": pa.array(v[order]),
            "sim": pa.array(s[order]),
        })

    return (emb_ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=1024)
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pyarrow"))
