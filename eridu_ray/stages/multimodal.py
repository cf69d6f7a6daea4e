"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages (codec state loaded once per actor).

Decode tiers:
- ``decoder="bmp"`` and :class:`AudioDecoder` are REAL decodes —
  pure-numpy parsers for uncompressed containers (kernels/codecs.py:
  BI_RGB 24/32-bit BMP, PCM 16-bit WAV) with real resize (integral-image
  box-average thumbnail) and feature extraction (RMS band envelope);
- ``decoder="fake"`` produces deterministic pseudo-decodes (seeded from
  the payload hash) with the real schema/batch shapes, for plumbing
  tests;
- ``decoder="pil"``/``"ffmpeg"`` (compressed formats) raise
  NotImplementedError naming the absent dependency — those libraries are
  not in this environment, so the codec stays a drop-in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.kernels.hashing import hash_bytes_u64

META_SCHEMA = pa.schema([
    ("payload_id", pa.string()),
    ("payload_bytes", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
])


class ImageDecoder:
    """Actor-pool stage: binary payload -> decoded metadata + thumbnail.

    __init__ loads codec state once per actor (reference pattern: model
    loaded once per process, eridu/etl/compare.py:32-61).  Output adds
    width/height/channels plus a ``thumb`` fixed-size float vector (the
    resize/feature step), all deterministic under the fake decoder.
    """

    THUMB = 8  # 8x8 grayscale thumbnail -> 64 floats

    def __init__(self, decoder: str = "fake", seed: int = 0):
        self.seed = seed
        if decoder == "fake":
            self._decode = self._decode_fake
        elif decoder == "bmp":
            self._decode = self._decode_bmp
        elif decoder == "pil":
            # real library path: used automatically when pillow exists
            # (tests/test_real_deps.py skipif-gates it), honestly dep-gated
            # otherwise
            try:  # pragma: no cover - pillow absent in this container
                from PIL import Image  # noqa: F401
            except Exception as exc:
                raise NotImplementedError(
                    "PIL/pillow is not installed in this environment; "
                    "use decoder='bmp' for uncompressed BMP, decoder='fake' "
                    "for plumbing tests, or install pillow") from exc
            self._decode = self._decode_pil  # pragma: no cover
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _decode_pil(self, payload: bytes):  # pragma: no cover - needs pillow
        import io

        from PIL import Image

        from eridu_ray.kernels.codecs import thumbnail_gray

        px = np.asarray(
            Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.uint8)
        return (px.shape[1], px.shape[0], px.shape[2],
                thumbnail_gray(px, self.THUMB))

    def _decode_bmp(self, payload: bytes):
        from eridu_ray.kernels.codecs import decode_bmp, thumbnail_gray

        px = decode_bmp(payload)
        return (px.shape[1], px.shape[0], px.shape[2],
                thumbnail_gray(px, self.THUMB))

    def _decode_fake(self, payload: bytes):
        h = hash_bytes_u64(payload, seed=self.seed)
        rng = np.random.default_rng([self.seed, h & 0x7FFFFFFF])
        w = 64 + int(h % 512)
        hgt = 64 + int((h >> 16) % 512)
        thumb = rng.random(self.THUMB * self.THUMB, dtype=np.float32)
        return w, hgt, 3, thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ids = batch["payload_id"].to_pylist()
        n = len(payloads)
        ws = np.empty(n, np.int32)
        hs = np.empty(n, np.int32)
        cs = np.empty(n, np.int32)
        thumbs = np.empty((n, self.THUMB * self.THUMB), np.float32)
        for i, p in enumerate(payloads):
            ws[i], hs[i], cs[i], thumbs[i] = self._decode(p or b"")
        return pa.table({
            "payload_id": pa.array(ids, pa.string()),
            "payload_bytes": pa.array(
                [len(p or b"") for p in payloads], pa.int64()),
            "width": pa.array(ws),
            "height": pa.array(hs),
            "channels": pa.array(cs),
            "thumb": pa.FixedSizeListArray.from_arrays(
                pa.array(thumbs.reshape(-1)), self.THUMB * self.THUMB),
        })


class AudioDecoder:
    """Actor-pool stage: PCM WAV payload -> decoded metadata + features.

    REAL decode (kernels/codecs.decode_wav) + feature extraction
    (duration, RMS, fixed-size band envelope).  rms is emitted as exact
    integer micro-units so downstream comparisons are engine-stable.
    """

    BANDS = 16

    def __init__(self, seed: int = 0):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from eridu_ray.kernels.codecs import decode_wav, wav_features

        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        rates = np.empty(n, np.int32)
        chans = np.empty(n, np.int32)
        durs = np.empty(n, np.int64)
        rms = np.empty(n, np.int64)
        envs = np.empty((n, self.BANDS), np.float32)
        for i, p in enumerate(payloads):
            rate, samples = decode_wav(p or b"")
            d, r, e = wav_features(rate, samples, bands=self.BANDS)
            rates[i], chans[i] = rate, samples.shape[1]
            durs[i], rms[i] = d, int(round(r * 1_000_000))
            envs[i] = e
        return pa.table({
            "payload_id": batch["payload_id"],
            "sample_rate": pa.array(rates),
            "channels": pa.array(chans),
            "duration_ms": pa.array(durs),
            "rms_micro": pa.array(rms),
            "envelope": pa.FixedSizeListArray.from_arrays(
                pa.array(envs.reshape(-1)), self.BANDS),
        })


class FrameSampler:
    """Actor-pool stage: 'video' payload -> one row per sampled frame.

    Exploding map (1 -> N rows): deterministic frame positions at
    ``stride`` over the fake duration derived from the payload hash.
    """

    def __init__(self, stride: int = 10, seed: int = 0):
        self.stride = stride
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offsets = [], [], []
        for pid, payload in zip(batch["payload_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            h = hash_bytes_u64(payload or b"", seed=self.seed)
            n_frames = 1 + int(h % 100)
            for f in range(0, n_frames, self.stride):
                ids.append(pid)
                frames.append(f)
                offsets.append(f * 1000)  # ms
        return pa.table({
            "payload_id": pa.array(ids, pa.string()),
            "frame_index": pa.array(frames, pa.int32()),
            "offset_ms": pa.array(offsets, pa.int64()),
        })


def documents_as_payloads(sf_dir: str):
    """Adapter: documents table -> (payload_id, payload) binary dataset
    (the testdata has no real media; text bytes stand in as payloads)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def to_payload(b: pa.Table) -> pa.Table:
        return pa.table({
            "payload_id": pc.cast(b["doc_id"], pa.string()),
            "payload": pc.cast(b["text"], pa.binary()),
        })

    return ds.map_batches(to_payload, batch_format="pyarrow")


def synthesize_media_payloads(sf_dir: str, kind: str):
    """Deterministic REAL media payloads derived from the documents table
    (no external data): per doc, a valid uncompressed BMP or PCM WAV
    whose content is a splitmix64 stream seeded by the doc text hash —
    so the decode stages exercise the real parsers on real bytes and
    every value downstream is reproducible."""
    import ray.data as rd

    from eridu_ray.kernels.codecs import encode_bmp, encode_wav

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def synth(b: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for did, text in zip(b["doc_id"].to_pylist(),
                             b["text"].to_pylist()):
            h = hash_bytes_u64((text or "").encode(), seed=7)
            rng = np.random.default_rng([7, h & 0x7FFFFFFF])
            if kind == "bmp":
                w = 16 + int(h % 33)          # 16..48, exercises stride pad
                hh = 16 + int((h >> 8) % 33)
                px = rng.integers(0, 256, size=(hh, w, 3), dtype=np.uint8)
                payloads.append(encode_bmp(px))
            else:
                n = 800 + int(h % 1600)       # 0.1..0.3 s at 8 kHz
                ch = 1 + int((h >> 16) % 2)
                s = (rng.standard_normal((n, ch)) * 3000).astype(np.int16)
                payloads.append(encode_wav(s, sample_rate=8000))
            ids.append(str(did))
        return pa.table({"payload_id": pa.array(ids, pa.string()),
                         "payload": pa.array(payloads, pa.binary())})

    return ds.map_batches(synth, batch_format="pyarrow")


def decode_images(sf_dir: str, concurrency=(1, 4), batch_size: int = 256):
    """Actor-pool decode over the payload dataset (queries() entry)."""
    return documents_as_payloads(sf_dir).map_batches(
        ImageDecoder, fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def decode_bmp_images(sf_dir: str, concurrency=(1, 4),
                      batch_size: int = 256):
    """REAL image decode: synthesized BMP payloads through the numpy BMP
    parser + integral-image thumbnail (queries() entry)."""
    return synthesize_media_payloads(sf_dir, "bmp").map_batches(
        ImageDecoder, fn_constructor_kwargs={"decoder": "bmp"},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def decode_audio(sf_dir: str, concurrency=(1, 4), batch_size: int = 256):
    """REAL audio decode: synthesized PCM WAV payloads through the numpy
    WAV parser + RMS band-envelope features (queries() entry)."""
    return synthesize_media_payloads(sf_dir, "wav").map_batches(
        AudioDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(sf_dir: str, concurrency=(1, 4), batch_size: int = 256):
    return documents_as_payloads(sf_dir).map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": 10},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
