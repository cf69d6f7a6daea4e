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
    """binary uint32-LE blob column -> (flat_values_u32, offsets_i64)."""
    blobs = col.to_pylist()
    arrs = [np.frombuffer(b, dtype=np.uint32) if b is not None
            else np.empty(0, dtype=np.uint32) for b in blobs]
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum([a.size for a in arrs], out=offsets[1:])
    flat = (np.concatenate(arrs) if arrs else np.empty(0, dtype=np.uint32))
    return flat, offsets


class HashedEncoder:
    """Deterministic shingle-bucket embedding (dim buckets, signed)."""

    def __init__(self, cfg: PipelineConfig, dim: int = 256):
        # verify sets are uint32 (signatures.py wire format)
        self.dim = np.uint32(dim)
        self.sign_bit = np.uint32(31)

    def embed_shingle_sets(self, values: np.ndarray,
                           offsets: np.ndarray) -> np.ndarray:
        """(flat shingles, offsets) -> (ndocs, dim) L2-normalized float32."""
        ndocs = offsets.shape[0] - 1
        dim = int(self.dim)
        out = np.zeros((ndocs, dim), dtype=np.float32)
        bucket = (values % self.dim).astype(np.int64)
        sign = np.where((values >> self.sign_bit) & np.uint32(1), -1.0, 1.0)
        doc_idx = np.repeat(np.arange(ndocs),
                            np.diff(offsets).astype(np.int64))
        np.add.at(out, (doc_idx, bucket), sign.astype(np.float32))
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms


#: entity-type suffixes the reference strips for backward compatibility
#: (eridu/etl/compare.py:48-52) — ONLY these, and only when the stripped
#: base path exists on disk: a bare rsplit("-") would silently turn a
#: failed versioned id like "all-MiniLM-L6-v2" into the different (and
#: possibly loadable) "all-MiniLM-L6".
_ENTITY_SUFFIXES = ("-companies", "-people", "-addresses")


def load_sbert_encoder(model_path: str | None = None):
    """T1 model loader with the reference's fallback chain
    (eridu/etl/compare.py:30-61): exact path -> path minus a KNOWN
    entity-type suffix (if that base exists on disk) -> the public HF
    hub id.  Returns None when sentence-transformers or every candidate
    is unavailable (this sandbox: always None — callers fall back to the
    hashed stub)."""
    import os

    try:
        from sentence_transformers import SentenceTransformer
    except Exception:
        return None
    cands = []
    if model_path:
        cands.append(model_path)
        if model_path.endswith(_ENTITY_SUFFIXES):
            base = model_path.rsplit("-", 1)[0]
            if base and os.path.exists(base):
                cands.append(base)
    cands.append("Graphlet-AI/eridu")
    for c in cands:  # pragma: no cover - needs the model artifact
        try:
            return SentenceTransformer(c)
        except Exception:
            continue
    return None  # pragma: no cover


class PairScorer:
    """map_batches actor: adds 'similarity' in [0,1] to candidate pairs.

    Batch must carry sh_a/sh_b (uint32-LE verify-set blobs) — attached by
    verify.attach_shingles.  Similarity = (cosine + 1) / 2 like the
    reference maps cosine into a match score (eridu/train/utils.py:206-233).

    ``encoder`` injects any object with the SentenceTransformer batch
    interface ``encode(texts, normalize_embeddings=True) -> (n, d)``
    (reference scoring loop: eridu/train/utils.py:153-235); when batches
    carry text_a/text_b the injected/loaded encoder scores them, else the
    deterministic shingle-bucket stub does.
    """

    def __init__(self, cfg: PipelineConfig | None = None,
                 use_sbert: bool = False, model_path: str | None = None,
                 encoder=None):
        self.cfg = cfg or PipelineConfig()
        self.encoder = encoder if encoder is not None else (
            load_sbert_encoder(model_path) if use_sbert else None)
        self.stub = HashedEncoder(self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("similarity",
                                       pa.array([], pa.float64()))
        if self.encoder is not None and "text_a" in batch.column_names:
            ea = np.asarray(self.encoder.encode(
                batch["text_a"].to_pylist(), normalize_embeddings=True))
            eb = np.asarray(self.encoder.encode(
                batch["text_b"].to_pylist(), normalize_embeddings=True))
        else:
            va, oa = _blob_col_to_arrays(batch["sh_a"])
            vb, ob = _blob_col_to_arrays(batch["sh_b"])
            ea = self.stub.embed_shingle_sets(va, oa)
            eb = self.stub.embed_shingle_sets(vb, ob)
        cos = np.einsum("ij,ij->i", ea, eb)
        sim = (cos.astype(np.float64) + 1.0) / 2.0
        w = getattr(self.cfg, "url_sim_weight", 0.0)
        if w > 0.0:
            cols = set(batch.column_names)
            # north-star "title/url fuzzy matching": urls are
            # canonicalized first; titles (when a pipeline carries
            # them — the flagship does not shuffle title strings)
            # blend raw through the same trigram kernel.  When both
            # are present each contributes half the fuzzy weight.
            parts = []
            if {"url_a", "url_b"} <= cols:
                parts.append(self._fuzzy_similarity(
                    batch, "url_a", "url_b", canonicalize=True))
            if {"title_a", "title_b"} <= cols:
                parts.append(self._fuzzy_similarity(
                    batch, "title_a", "title_b", canonicalize=False))
            if parts:
                fuzzy = parts[0] if len(parts) == 1 else \
                    0.5 * (parts[0] + parts[1])
                sim = (1.0 - w) * sim + w * fuzzy
        return batch.append_column("similarity", pa.array(sim))

    @staticmethod
    def _fuzzy_similarity(batch: pa.Table, col_a: str, col_b: str,
                          canonicalize: bool) -> np.ndarray:
        """Per-pair fuzzy string similarity: exact trigram Jaccard
        (north-star "title/url fuzzy matching"); vectorized — one tagged
        searchsorted pass for the whole batch
        (kernels.text.string_trigram_sets + verify._tagged_intersections)."""
        from eridu_ray.kernels.text import canonicalize_urls, \
            string_trigram_sets
        from eridu_ray.stages.verify import _tagged_intersections

        a, b = batch[col_a], batch[col_b]
        if canonicalize:
            a, b = canonicalize_urls(a), canonicalize_urls(b)
        ca, sa = string_trigram_sets(a)
        cb, sb = string_trigram_sets(b)
        inter = _tagged_intersections(ca, sa, cb, sb)
        union = sa + sb - inter
        return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def threshold_batch(batch: pa.Table, threshold: float,
                    col: str = "similarity") -> pa.Table:
    """Binary thresholder (reference: eridu/train/utils.py:347-366)."""
    import pyarrow.compute as pc

    pred = pc.greater_equal(batch[col], pa.scalar(threshold))
    return batch.append_column("predicted_match", pred)


class DocEncoder:
    """T6: standalone corpus→embedding actor-pool stage.

    The reference encodes every record once for clustering
    (``model.encode(df['combined_names'])``, Clusters.md:33-39); here the
    encoder (stub or sentence-transformers, same fallback chain as
    PairScorer) loads once per actor and each ``__call__`` appends an
    ``embedding: list<float32>`` column — the same layout as the driver
    testdata ``embeddings.embedding``, so the output feeds the ANN/IVF
    operators directly.
    """

    def __init__(self, cfg: PipelineConfig | None = None, dim: int = 256,
                 use_sbert: bool = False, model_path: str | None = None,
                 text_col: str = "text", encoder=None):
        self.cfg = cfg or PipelineConfig()
        self.text_col = text_col
        self.encoder = encoder if encoder is not None else (
            load_sbert_encoder(model_path) if use_sbert else None)
        self.stub = HashedEncoder(self.cfg, dim=dim)
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.encoder is not None:
            m = np.asarray(
                self.encoder.encode(texts, normalize_embeddings=True))
        else:
            from eridu_ray.kernels.shingle import shingle_set32

            sets = [shingle_set32(t or "", k=self.cfg.shingle_k,
                                  seed=self.cfg.seed) for t in texts]
            offsets = np.zeros(len(sets) + 1, dtype=np.int64)
            np.cumsum([s.size for s in sets], out=offsets[1:])
            flat = (np.concatenate(sets) if sets
                    else np.empty(0, dtype=np.uint32))
            m = self.stub.embed_shingle_sets(flat, offsets)
        n, d = m.shape
        return batch.append_column(
            "embedding",
            pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
                pa.array(m.reshape(-1).astype(np.float32))))


def encode_documents(sf_dir: str, dim: int = 256,
                     concurrency=(1, 4), batch_size: int = 256):
    """T6 pipeline: documents -> (doc_id, embedding) via the actor pool."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        DocEncoder, fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency).drop_columns(["text"])
