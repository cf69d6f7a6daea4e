"""Real multimodal decode: pure-numpy BMP/WAV codecs (round-trip +
golden values) and the actor-pool decode stages over synthesized
payloads (schema, determinism, feature correctness)."""

import numpy as np
import pyarrow as pa
import pytest

from eridu_ray.kernels import codecs


# --- BMP codec ---------------------------------------------------------------

def test_bmp_roundtrip_odd_width():
    # width 3 -> 9-byte rows padded to 12: exercises stride handling
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


def test_bmp_roundtrip_aligned():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    payload = codecs.encode_bmp(px)
    assert payload[:2] == b"BM"
    assert np.array_equal(codecs.decode_bmp(payload), px)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"not a bitmap at all, clearly")
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"")


def test_thumbnail_exact_box_average():
    # 16x16 image of four 8x8 constant quadrants -> a 2x2 thumbnail must
    # recover each quadrant's exact gray level
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:8, :8] = 0
    px[:8, 8:] = 255
    px[8:, :8] = 100
    px[8:, 8:] = 200
    t = codecs.thumbnail_gray(px, size=2).reshape(2, 2)
    assert t == pytest.approx(
        np.array([[0.0, 1.0], [100 / 255, 200 / 255]]), abs=1e-6)


def test_thumbnail_smaller_than_grid():
    # 3x3 image under an 8x8 grid: empty cells must not divide by zero
    px = np.full((3, 3, 3), 128, dtype=np.uint8)
    t = codecs.thumbnail_gray(px, size=8)
    assert t.shape == (64,) and np.isfinite(t).all()


# --- WAV codec ---------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    for ch in (1, 2):
        s = (rng.standard_normal((777, ch)) * 5000).astype(np.int16)
        rate, got = codecs.decode_wav(codecs.encode_wav(s, 8000))
        assert rate == 8000
        assert np.array_equal(got, s)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        codecs.decode_wav(b"")


def test_wav_features_golden():
    # constant full-scale-half signal: rms = 0.5 exactly, every band 0.5
    s = np.full((8000, 1), 16384, dtype=np.int16)
    dur, rms, env = codecs.wav_features(8000, s, bands=4)
    assert dur == 1000
    assert rms == pytest.approx(0.5)
    assert env == pytest.approx(np.full(4, 0.5), abs=1e-6)
    # silence
    dur, rms, env = codecs.wav_features(8000, np.zeros((80, 1), np.int16))
    assert (dur, rms) == (10, 0.0) and (env == 0).all()


# --- decode stages over Ray --------------------------------------------------

def test_decode_bmp_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from eridu_ray.stages.multimodal import decode_bmp_images

    tab = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha doc", "beta doc", "gamma doc"]),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = decode_bmp_images(str(tmp_path)).to_pandas()
    assert len(out) == 3
    assert set(out.columns) == {"payload_id", "payload_bytes", "width",
                                "height", "channels", "thumb"}
    assert (out["channels"] == 3).all()
    assert out["width"].between(16, 48).all()
    assert out["height"].between(16, 48).all()
    # determinism: same input -> identical decode
    out2 = decode_bmp_images(str(tmp_path)).to_pandas()
    a = out.sort_values("payload_id").reset_index(drop=True)
    b = out2.sort_values("payload_id").reset_index(drop=True)
    assert a.drop(columns="thumb").equals(b.drop(columns="thumb"))
    for x, y in zip(a["thumb"], b["thumb"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_decode_audio_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from eridu_ray.stages.multimodal import decode_audio

    tab = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["first audio doc", "second audio doc"]),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = decode_audio(str(tmp_path)).to_pandas()
    assert len(out) == 2
    assert (out["sample_rate"] == 8000).all()
    assert out["channels"].isin([1, 2]).all()
    # 800..2400 samples at 8 kHz -> 100..300 ms
    assert out["duration_ms"].between(100, 300).all()
    assert (out["rms_micro"] > 0).all()
    for e in out["envelope"]:
        assert len(e) == 16 and np.isfinite(np.asarray(e)).all()


def test_image_decoder_pil_still_gated():
    from eridu_ray.stages.multimodal import ImageDecoder

    with pytest.raises(NotImplementedError):
        ImageDecoder(decoder="pil")
