"""Pure-numpy codecs for UNCOMPRESSED media containers (BMP, PCM WAV).

The sandbox has no pillow/ffmpeg, but the multimodal stages should not
have to fake every decode: uncompressed BMP (BI_RGB 24/32-bit) and PCM
WAV (16-bit) are trivially parseable with numpy alone, which makes the
decode → feature-extract path REAL end-to-end for those formats while
compressed codecs (JPEG/PNG/MP4) stay gated behind the named missing
dependency (stages/multimodal.py).

Encoders exist so tests and fixtures can synthesize valid payloads
deterministically — no external data.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP (BITMAPINFOHEADER, BI_RGB, 24/32 bpp, bottom-up or top-down) ------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP bytes (bottom-up)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    # BMP stores BGR, bottom row first
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit BMP bytes -> (h, w, 3) uint8 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    bpp, compression = struct.unpack_from("<HI", payload, 28)[0], \
        struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BMP supported "
            f"(bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if h_signed > 0:                      # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()       # BGR(A) -> RGB


def thumbnail_gray(pixels: np.ndarray, size: int = 8) -> np.ndarray:
    """(h, w, 3) uint8 -> (size*size,) float32 grayscale box-average
    thumbnail in [0, 1] — exact area averages via an integral image
    (one cumsum, no per-cell loops)."""
    g = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    integ = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(g, axis=0), axis=1, out=integ[1:, 1:])
    ys = np.linspace(0, h, size + 1).round().astype(np.int64)
    xs = np.linspace(0, w, size + 1).round().astype(np.int64)
    area = ((ys[1:] - ys[:-1])[:, None]
            * (xs[1:] - xs[:-1])[None, :]).astype(np.float64)
    s = (integ[ys[1:]][:, xs[1:]] - integ[ys[1:]][:, xs[:-1]]
         - integ[ys[:-1]][:, xs[1:]] + integ[ys[:-1]][:, xs[:-1]])
    return (s / np.maximum(area, 1) / 255.0).astype(
        np.float32).reshape(-1)


# --- WAV (RIFF, PCM, 16-bit) ------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> PCM WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM 16-bit WAV bytes -> (sample_rate, (n, channels) int16)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, ch, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos: pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM 16-bit WAV supported "
                    f"(fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)      # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, samples.reshape(-1, ch)


def wav_features(rate: int, samples: np.ndarray,
                 bands: int = 16) -> tuple[int, float, np.ndarray]:
    """(duration_ms, rms in [0,1], per-band RMS envelope) — the
    feature-extract step, vectorized via reshaped reductions."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = mono.size
    dur_ms = int(round(n * 1000 / rate)) if rate else 0
    rms = float(np.sqrt(np.mean(mono ** 2))) if n else 0.0
    env = np.zeros(bands, dtype=np.float32)
    if n:
        edges = np.linspace(0, n, bands + 1).round().astype(np.int64)
        sq = np.concatenate([[0.0], np.cumsum(mono ** 2)])
        width = np.maximum(edges[1:] - edges[:-1], 1)
        env = np.sqrt((sq[edges[1:]] - sq[edges[:-1]])
                      / width).astype(np.float32)
    return dur_ms, rms, env
