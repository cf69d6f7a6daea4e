"""Borderline-pair refinement: actor-pool pair scorer.

Reimplements the reference's flagship scoring semantics
(sbert_compare_multiple, eridu/train/utils.py:153-235: encode both sides,
L2-normalize, rowwise dot -> cosine) as a Ray actor-pool ``map_batches``
stage: the encoder is loaded ONCE per actor in ``__init__`` (reference
loads the model once per process with a fallback chain,
eridu/etl/compare.py:32-61), each ``__call__`` scores one Arrow batch.

Two encoders:
- ``HashedEncoder`` — the deterministic CPU stub (FIXTURES.md F6): a
  document's shingle set is folded into a dense bucket vector and
  L2-normalized; cosine over it is a smooth semantic-similarity surrogate.
  Always available; used in tests and the sandbox.
- ``SbertEncoder`` — the real sentence-transformers path, constructed only
  if the library + model artifact are importable (no network in the
  sandbox); same interface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.config import PipelineConfig
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _blob_col_to_arrays(col) -> tuple[np.ndarray, np.ndarray]:
    """binary uint64-LE blob column -> (flat_values_u64, offsets_i64)."""
    blobs = col.to_pylist()
    arrs = [np.frombuffer(b, dtype=np.uint64) if b is not None
            else np.empty(0, dtype=np.uint64) for b in blobs]
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum([a.size for a in arrs], out=offsets[1:])
    flat = (np.concatenate(arrs) if arrs else np.empty(0, dtype=np.uint64))
    return flat, offsets


class HashedEncoder:
    """Deterministic shingle-bucket embedding (dim buckets, signed)."""

    def __init__(self, cfg: PipelineConfig, dim: int = 256):
        self.dim = np.uint64(dim)
        self.sign_bit = np.uint64(63)

    def embed_shingle_sets(self, values: np.ndarray,
                           offsets: np.ndarray) -> np.ndarray:
        """(flat shingles, offsets) -> (ndocs, dim) L2-normalized float32."""
        ndocs = offsets.shape[0] - 1
        dim = int(self.dim)
        out = np.zeros((ndocs, dim), dtype=np.float32)
        bucket = (values % self.dim).astype(np.int64)
        sign = np.where((values >> self.sign_bit) & np.uint64(1), -1.0, 1.0)
        doc_idx = np.repeat(np.arange(ndocs),
                            np.diff(offsets).astype(np.int64))
        np.add.at(out, (doc_idx, bucket), sign.astype(np.float32))
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms


class PairScorer:
    """map_batches actor: adds 'similarity' in [0,1] to candidate pairs.

    Batch must carry sh_a/sh_b (list<uint64> shingle sets) — attached by
    verify.attach_shingles.  Similarity = (cosine + 1) / 2 like the
    reference maps cosine into a match score (eridu/train/utils.py:206-233).
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 use_sbert: bool = False, model_path: str | None = None):
        self.cfg = cfg or PipelineConfig()
        self.encoder = None
        if use_sbert:
            try:  # pragma: no cover - not available in the sandbox
                from sentence_transformers import SentenceTransformer

                self.encoder = SentenceTransformer(
                    model_path or "Graphlet-AI/eridu")
            except Exception:
                self.encoder = None
        self.stub = HashedEncoder(self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("similarity",
                                       pa.array([], pa.float64()))
        if self.encoder is not None and "text_a" in batch.column_names:
            ea = self.encoder.encode(batch["text_a"].to_pylist(),
                                     normalize_embeddings=True)
            eb = self.encoder.encode(batch["text_b"].to_pylist(),
                                     normalize_embeddings=True)
        else:
            va, oa = _blob_col_to_arrays(batch["sh_a"])
            vb, ob = _blob_col_to_arrays(batch["sh_b"])
            ea = self.stub.embed_shingle_sets(va, oa)
            eb = self.stub.embed_shingle_sets(vb, ob)
        cos = np.einsum("ij,ij->i", ea, eb)
        sim = (cos.astype(np.float64) + 1.0) / 2.0
        return batch.append_column("similarity", pa.array(sim))


def threshold_batch(batch: pa.Table, threshold: float,
                    col: str = "similarity") -> pa.Table:
    """Binary thresholder (reference: eridu/train/utils.py:347-366)."""
    import pyarrow.compute as pc

    pred = pc.greater_equal(batch[col], pa.scalar(threshold))
    return batch.append_column("predicted_match", pred)
